"""Allele-frequency file I/O: `CHR SNP POS ALLELE FREQ` (gzip).

Reproduces writeFreqData/readFreqData (src/garlic-data.cpp:1311-1440).  On
read, when the file's allele disagrees with the internal '1' allele coding
the frequency flips to 1-freq (src/garlic-data.cpp:1419-1424).
"""

from __future__ import annotations

import gzip
from typing import List

import numpy as np

from ..core.fmt import g
from ..core.types import ChromData, GarlicDataError


class FreqFileError(GarlicDataError):
    pass


def write_freq(freq_outfile: str, chroms: List[ChromData], log=None,
               blob: str = None) -> None:
    """Writes <basename>.gz (caller passes "<out>.freq").

    blob: optional path of a cached, already-gzipped freq file whose
    content is a pure function of the panel-cache sidecar it sits next to
    (computed-from-data freqs, no resampling).  When the blob is newer
    than its sidecar it is copied instead of re-formatting + re-deflating
    ~25 MB of text (~1 s for a 1M-locus genome); otherwise the normal
    write runs and refreshes the blob for the next run."""
    path = freq_outfile + ".gz"
    if blob is not None and _copy_freq_blob(blob, path):
        print(f"Wrote allele frequency data to {path}")
        return
    try:
        from ..native import write_freq_chrom_native
        done = True
        for ci, c in enumerate(chroms):
            if not write_freq_chrom_native(path, ci > 0, c.chrom,
                                           c.locus_names, c.positions,
                                           c.alleles, c.freq):
                done = False
                break
        if done:
            if blob is not None:
                _save_freq_blob(blob, path)
            print(f"Wrote allele frequency data to {path}")
            return
    except ImportError:
        pass
    # Python fallback.  compresslevel 1: the decompressed content is the
    # comparison artifact, not the container bytes.
    with gzip.open(path, "wt", compresslevel=1) as fout:
        fout.write("CHR\tSNP\tPOS\tALLELE\tFREQ\n")
        for c in chroms:
            chrom = c.chrom
            names = c.locus_names
            pos = c.positions
            alleles = c.alleles
            freq = c.freq
            fout.write("".join(
                f"{chrom}\t{names[locus]}\t{int(pos[locus])}\t"
                f"{alleles[locus]}\t{g(freq[locus])}\n"
                for locus in range(c.nloci)))
    if blob is not None:
        _save_freq_blob(blob, path)
    print(f"Wrote allele frequency data to {path}")


def _blob_sidecar(blob: str) -> str:
    """The panel-cache sidecar a freq blob derives from (blob is
    '<sidecar>.freq.gz')."""
    return blob[: -len(".freq.gz")]


def _copy_freq_blob(blob: str, path: str) -> bool:
    """Copy a valid cached freq file to path; False -> write normally.
    Valid = blob exists and is at least as new as its sidecar (a re-parsed
    panel rewrites the sidecar, staling any older blob)."""
    import os
    import shutil
    try:
        side = _blob_sidecar(blob)
        if (os.path.exists(blob) and os.path.exists(side)
                and os.path.getmtime(blob) >= os.path.getmtime(side)):
            shutil.copyfile(blob, path)
            return True
    except OSError:
        pass
    return False


def _save_freq_blob(blob: str, path: str) -> None:
    """Best-effort refresh of the cached freq file (atomic rename so a
    concurrent run never sees a torn blob)."""
    import os
    import shutil
    try:
        tmp = blob + f".tmp{os.getpid()}"
        shutil.copyfile(path, tmp)
        os.replace(tmp, blob)
    except OSError:
        pass


def read_freq(freqfile: str, chroms: List[ChromData], log=None) -> None:
    """Reads frequencies into each ChromData in place, validating row counts,
    column counts and locus-name agreement."""
    expected_rows = 1 + sum(c.nloci for c in chroms)
    opener = gzip.open if freqfile.endswith(".gz") else open
    import sys
    print(f"Reading {freqfile}", file=sys.stderr)
    with opener(freqfile, "rt") as fin:
        fin.readline()  # header
        line_num = 1
        prev_cols = -1
        for c in chroms:
            freqs = np.empty(c.nloci, dtype=np.float64)
            for locus in range(c.nloci):
                line_num += 1
                line = fin.readline()
                if not line:
                    if log is not None:
                        log.err("ERROR: at line", line_num, nl=False)
                        log.err(" in", freqfile, nl=False)
                        log.err(". Perhaps too few lines?")
                    raise FreqFileError("short freq file")
                fields = line.split()
                if len(fields) < 5:
                    if log is not None:
                        log.err("ERROR: Found", len(fields), nl=False)
                        log.err(" in", freqfile, nl=False)
                        log.err(" on line", line_num, nl=False)
                        log.err(" but expected at least", 5)
                    raise FreqFileError("bad freq columns")
                if prev_cols != -1 and len(fields) != prev_cols:
                    if log is not None:
                        log.err("ERROR: Differing number of columns across rows found in",
                                freqfile)
                    raise FreqFileError("ragged freq file")
                prev_cols = len(fields)
                locus_id, allele, fr = fields[1], fields[3], float(fields[4])
                if c.locus_names[locus] != locus_id:
                    if log is not None:
                        log.err("ERROR: Loci appear mismatched in:", freqfile)
                        log.err("ERROR: at line:", line_num)
                        log.err("ERROR: freq file locus name:", locus_id)
                        log.err("ERROR: tped file locus name:", c.locus_names[locus])
                    raise FreqFileError("locus mismatch")
                if c.alleles[locus] != allele:
                    fr = 1.0 - fr
                freqs[locus] = fr
            c.freq = freqs
