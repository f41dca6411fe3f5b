"""Phase-III unit/property tests: native C++ run extractor vs the Python
state machine, coverage counting, threshold clamping."""

from __future__ import annotations

import numpy as np
import pytest

from garlic_tpu.core.types import MISSING
from garlic_tpu.ops import assembly
from garlic_tpu.ops.lod import pair_breaks


def test_overlap_threshold_clamp():
    assert assembly.overlap_threshold(0.25, 60) == 15.0
    assert assembly.overlap_threshold(0.001, 60) == 1.0
    assert assembly.overlap_threshold(5.0, 60) == 60.0


def test_coverage_counts_batch_matches_convolve():
    rng = np.random.default_rng(0)
    above = rng.random((7, 200)) < 0.3
    W = 12
    batch = assembly.coverage_counts_batch(above, W)
    for i in range(above.shape[0]):
        ref = assembly.coverage_counts(above[i], W)
        np.testing.assert_array_equal(batch[i], ref)


def _rand_case(seed, L=300, I=5, pos0=100):
    rng = np.random.default_rng(seed)
    pos = pos0 + np.cumsum(rng.integers(100, 5000, size=L)).astype(np.int64)
    gpos = np.cumsum(rng.random(L) * 0.01)
    covered = rng.random((I, L)) < rng.uniform(0.2, 0.7)
    return pos, gpos, covered


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("cm", [False, True])
def test_native_extractor_matches_python_scan(seed, cm):
    from garlic_tpu.native import assemble_runs_native
    pos, gpos, covered = _rand_case(seed)
    I, L = covered.shape
    max_gap, cstart, cend = 3000, pos[L // 2], pos[L // 2] + 8000
    threshold = 4.0
    br = pair_breaks(pos, max_gap, cstart, cend)
    packed = np.packbits(covered, axis=1, bitorder="little")
    runs = assemble_runs_native(packed, br, pos, gpos, threshold, cm)
    if runs is None:
        pytest.skip("native unavailable")
    ind_arr, start_arr, stop_arr, size_arr = runs
    k = 0
    for i in range(I):
        expected = assembly._assemble_scan(covered[i], br, pos, gpos,
                                           threshold, cm)
        got = []
        while k < ind_arr.shape[0] and ind_arr[k] == i:
            got.append((int(start_arr[k]), int(stop_arr[k]),
                        float(size_arr[k])))
            k += 1
        assert got == [(s, e, sz) for s, e, sz in expected], f"ind {i}"
    assert k == ind_arr.shape[0]


def test_scan_vs_segments_equivalence():
    """The vectorized segments path equals the faithful scan transliteration
    for positive positions."""
    for seed in range(6):
        pos, gpos, covered = _rand_case(seed + 100, L=250, I=3)
        br = pair_breaks(pos, 2500, pos[60], pos[80])
        for i in range(covered.shape[0]):
            a = assembly._assemble_scan(covered[i], br, pos, gpos, 3.0, False)
            b = assembly._assemble_segments(covered[i], br, pos, gpos, 3.0,
                                            False)
            assert a == b


def test_run_opening_at_last_snp_is_lost():
    pos = np.array([100, 200, 300, 400], dtype=np.int64)
    gpos = np.zeros(4)
    covered = np.array([False, False, False, True])
    br = np.zeros(4, dtype=bool)
    out = assembly._assemble_scan(covered, br, pos, gpos, 1.0, False)
    assert out == []


def test_full_coverage_single_run():
    pos = np.arange(1, 101, dtype=np.int64) * 1000
    gpos = np.zeros(100)
    covered = np.ones(100, dtype=bool)
    br = np.zeros(100, dtype=bool)
    out = assembly._assemble_scan(covered, br, pos, gpos, 10.0, False)
    assert out == [(1000, 100000, float(100000 - 1000 + 1))]


class _FakeCentro:
    def start(self, c):
        return 10**9

    def end(self, c):
        return 10**9 + 1


class _FakeChrom:
    def __init__(self, pos, gpos):
        self.chrom = "chr1"
        self.positions = pos
        self.gpos = gpos


def test_assemble_roh_native_and_python_agree():
    rng = np.random.default_rng(4)
    L, I, W = 400, 6, 10
    pos = np.cumsum(rng.integers(100, 3000, size=L)).astype(np.int64)
    win = rng.normal(0.0, 1.0, size=(I, L))
    win[:, -W + 1:] = MISSING
    chrom = _FakeChrom(pos, np.zeros(L))
    args = ([win], [chrom], [f"I{i}" for i in range(I)], _FakeCentro(),
            0.5, W, 200000, 0.25, False)
    by_ind_nat, len_nat = assembly.assemble_roh(*args)
    import garlic_tpu.native.build as nb
    saved = nb._lib, nb._tried
    nb._lib, nb._tried = None, True  # force Python fallback
    try:
        by_ind_py, len_py = assembly.assemble_roh(*args)
    finally:
        nb._lib, nb._tried = saved
    np.testing.assert_array_equal(len_nat, len_py)
    for a, b in zip(by_ind_nat, by_ind_py):
        assert [(c.chrom_idx, c.start, c.stop, c.size) for c in a.calls] == \
               [(c.chrom_idx, c.start, c.stop, c.size) for c in b.calls]
