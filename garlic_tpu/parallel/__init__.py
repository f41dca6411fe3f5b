"""Multi-chip SPMD scale-out layer (mesh + shard_map engine)."""

from .mesh import AXIS_DP, AXIS_SP, factor_devices, make_mesh  # noqa: F401
from .engine import (  # noqa: F401
    allele_freq_sharded,
    fit_gmm_sharded,
    full_window_missing,
    gauss_transform_sharded,
    lod_windows_sharded,
    pad_for_mesh,
)
