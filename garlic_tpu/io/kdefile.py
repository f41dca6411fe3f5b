"""KDE result writer: `x y` per line, %g formatting.

Reproduces writeKDEResult / makeKDEFilename (src/garlic-kde.cpp:274-302).
"""

from __future__ import annotations

from ..core.fmt import g
from ..ops.kde import KDEResult


def make_kde_filename(basename: str, winsize: int) -> str:
    return f"{basename}.{winsize}SNPs.kde"


def write_kde(kde: KDEResult, outfile: str, log=None) -> None:
    with open(outfile, "w") as fout:
        for i in range(kde.size):
            fout.write(f"{g(kde.x[i])} {g(kde.y[i])}\n")
    if log is not None:
        log.log("Wrote KDE results to", outfile)
