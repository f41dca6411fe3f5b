"""Columnar data model.

The reference keeps per-chromosome pointer-soup structs (HapData/MapData/
FreqData/GenoLikeData, src/garlic-data.h:32-108) laid out [loci][individuals].
Here everything is a dense numpy array laid out [individuals, loci] — the
individual axis is the data-parallel shard axis on a TPU mesh, and the locus
axis is the contiguous vector axis the kernels tile over.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

MISSING = -9999  # sentinel for window scores / positions (src/garlic-data.h:24)
GENO_MISSING = -9  # genotype missing code (src/garlic-data.cpp:114-128)


class GarlicDataError(Exception):
    """Base for expected data-loading failures whose ERROR text has already
    been written to the .error log by the raiser (the reference's thrown
    ints caught as `catch(...) return 1`, src/garlic-main.cpp:210-242).
    The driver exits quietly on these; anything else is an internal bug and
    gets logged before the nonzero exit."""


class LocusNames:
    """Lazy '\\n'-joined locus-name buffer.

    The native TPED parser hands back one bytes blob per chromosome; most
    runs only ever need it verbatim (the native freq writer takes the raw
    buffer), so the 10^5-element Python list is materialized on first
    indexed access only."""

    __slots__ = ("raw", "_list")

    def __init__(self, raw: bytes):
        self.raw = raw
        self._list = None

    def _mat(self):
        if self._list is None:
            self._list = self.raw.decode().split("\n") if self.raw else []
        return self._list

    def __getitem__(self, i):
        return self._mat()[i]

    def __len__(self):
        if self._list is not None:
            return len(self._list)
        return (self.raw.count(b"\n") + 1) if self.raw else 0

    def __iter__(self):
        return iter(self._mat())


@dataclass
class ChromData:
    """All per-chromosome arrays."""
    chrom: str                       # chr-prefixed name
    positions: np.ndarray            # int64 [L] physical bp (truncated-to-int)
    gpos: np.ndarray                 # float64 [L] genetic position
    locus_names: List[str]           # [L]
    alleles: np.ndarray              # '<U1' [L]; the internal '1' allele
    genotypes: np.ndarray            # int8 [I, L]; 0/1/2 alt count, -9 missing
    freq: Optional[np.ndarray] = None        # float64 [L]
    first_copy: Optional[np.ndarray] = None  # bool [I, L] (phased only)
    gl: Optional[np.ndarray] = None          # float64 [I, L] genotype likelihoods

    @property
    def nloci(self) -> int:
        return int(self.positions.shape[0])

    @property
    def nind(self) -> int:
        return int(self.genotypes.shape[0])


@dataclass
class Dataset:
    chroms: List[ChromData] = field(default_factory=list)
    ind_ids: List[str] = field(default_factory=list)
    pop: str = ""

    @property
    def nind(self) -> int:
        return len(self.ind_ids)

    @property
    def nloci(self) -> int:
        return sum(c.nloci for c in self.chroms)

    def subset_individuals(self, idx: np.ndarray) -> "Dataset":
        """Subset to the given individual indices (reference subsetData,
        src/garlic-data.cpp:2171-2244)."""
        out = Dataset(ind_ids=[self.ind_ids[i] for i in idx], pop=self.pop)
        for c in self.chroms:
            out.chroms.append(ChromData(
                chrom=c.chrom,
                positions=c.positions,
                gpos=c.gpos,
                locus_names=c.locus_names,
                alleles=c.alleles,
                genotypes=c.genotypes[idx],
                freq=c.freq,
                first_copy=None if c.first_copy is None else c.first_copy[idx],
                gl=None if c.gl is None else c.gl[idx],
            ))
        return out
