"""Multi-chip SPMD scale-out layer (mesh + shard_map engine)."""

from .mesh import AXIS_DP, AXIS_SP, factor_devices, make_mesh  # noqa: F401
from .engine import (  # noqa: F401
    full_window_missing,
    make_analysis_step,
    pad_for_mesh,
)
