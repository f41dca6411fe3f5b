"""TGLS genotype-likelihood loading.

Reproduces readTGLSData (src/garlic-data.cpp:1516-1586): rows align 1:1 with
TPED rows (4 leading junk columns then one value per individual); values are
converted by --gl-type:

  GQ: phred-scaled likelihood the genotype is WRONG  -> p_err = 10^(GQ/-10)
  PL: phred-scaled likelihood the genotype is right  -> p_err = 1 - 10^(PL/-10)
  GL: log10 likelihood the genotype is right         -> p_err = 1 - 10^GL

Exponents are clamped at -10 and results to (1e-16, 1]
(src/garlic-data.cpp:1557-1576).
"""

from __future__ import annotations

import gzip
from typing import List

import numpy as np

from ..core.types import ChromData, GarlicDataError


def _open_maybe_gz(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "r")


class TglsError(GarlicDataError):
    pass


def convert_gl(vals: np.ndarray, gl_type: str) -> np.ndarray:
    """Vectorized GL conversion, matching the scalar reference ops exactly."""
    v = vals.astype(np.float64)
    if gl_type == "GQ":
        e = v / -10.0
        e = np.maximum(e, -10.0)
        out = 10.0 ** e
    elif gl_type == "GL":
        e = np.maximum(v, -10.0)
        out = 1.0 - 10.0 ** e
    elif gl_type == "PL":
        e = v / -10.0
        e = np.maximum(e, -10.0)
        out = 1.0 - 10.0 ** e
    else:
        raise TglsError(f"unknown GL type {gl_type}")
    out = np.where(out <= 0, 1e-16, out)
    out = np.where(out > 1, 1.0, out)
    return out


def read_tgls(filename: str, chroms: List[ChromData], expected_ind: int,
              gl_type: str, log=None) -> None:
    """Attach per-genotype error matrices [I, L] to each ChromData in place."""
    with _open_maybe_gz(filename) as fin:
        for c in chroms:
            rows = np.empty((c.nloci, expected_ind), dtype=np.float64)
            for locus in range(c.nloci):
                line = fin.readline()
                fields = line.split()
                if len(fields) != expected_ind + 4:
                    if log is not None:
                        log.err("ERROR: Incorrect number of columns in tgls file: ",
                                len(fields), nl=False)
                        log.err(". Expected: ", expected_ind)
                    raise TglsError("bad tgls shape")
                rows[locus] = np.asarray(fields[4:], dtype=np.float64)
            c.gl = convert_gl(rows, gl_type).T.copy()  # [I, L]
