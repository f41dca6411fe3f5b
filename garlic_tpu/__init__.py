"""garlic_tpu: a TPU-native runs-of-homozygosity (ROH) calling engine.

Re-implements the capabilities of GARLIC (szpiech/garlic v1.1.6a) —
four-phase Pemberton/Blant ROH pipeline, all I/O formats, CLI and output
byte-compatibility — as a JAX/XLA/Pallas engine that shards individuals
data-parallel over a TPU mesh.
"""

from .version import __version__, OUTPUT_COMPAT_VERSION

__all__ = ["__version__", "OUTPUT_COMPAT_VERSION"]
