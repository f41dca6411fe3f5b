"""Phase-I unit/property tests: lod() truth table, mask formulation vs the
reference's skip-ahead control flow, rolling-sum order, fast-vs-exact engine
agreement (SURVEY.md §4)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from garlic_tpu.core.types import MISSING
from garlic_tpu.ops import lod as lod_ops


# ---------------------------------------------------------------------------
# Scalar transliteration of calcLOD (src/garlic-roh.cpp:18-132,355-386)
# used as the property-test oracle.
# ---------------------------------------------------------------------------

def lod_scalar(g, p, e):
    if p == 0.0 or p == 1.0:
        return 0.0
    if g == 0:
        non = (1 - p) * (1 - p)
        aut = (1 - e) * (1 - p) + e * non
    elif g == 1:
        non = 2 * p * (1 - p)
        aut = e * non
    elif g == 2:
        non = p * p
        aut = (1 - e) * p + e * non
    else:
        return 0.0
    return math.log10(aut / non)


def in_gap_scalar(qs, qe, ts, te):
    return ((ts <= qs <= te) or (ts <= qe <= te) or (qs <= ts and te <= qe))


def calc_lod_transliterated(geno, positions, freq, winsize, error, max_gap,
                            cstart, cend):
    """Verbatim port of the reference loop (src/garlic-roh.cpp:46-126),
    including its `locus = prevI` / `locus = locus + winsize - 2`
    skip-aheads."""
    I, L = geno.shape
    nwin = L - winsize + 1
    win = np.full((I, L), float(MISSING))

    def fresh(ind, locus):
        """Full-window sum; returns the updated locus (skip-ahead)."""
        prev_i = locus
        for i in range(locus, locus + winsize):
            if (positions[i] - positions[prev_i] > max_gap or
                    in_gap_scalar(positions[prev_i], positions[i],
                                  cstart, cend)):
                win[ind, locus] = MISSING
                return prev_i
            win[ind, locus] += lod_scalar(geno[ind, i], freq[i], error)
            prev_i = i
        return locus

    for ind in range(I):
        locus = 0
        while locus < nwin:
            win[ind, locus] = 0.0
            if locus == 0 or win[ind, locus - 1] == MISSING:
                locus = fresh(ind, locus)
            else:
                t = locus + winsize - 1
                if (positions[t] - positions[t - 1] > max_gap or
                        in_gap_scalar(positions[t - 1], positions[t],
                                      cstart, cend)):
                    win[ind, locus] = MISSING
                    locus = locus + winsize - 2
                else:
                    win[ind, locus] = (
                        win[ind, locus - 1]
                        - lod_scalar(geno[ind, locus - 1], freq[locus - 1],
                                     error)
                        + lod_scalar(geno[ind, t], freq[t], error))
            locus += 1
    return win


def _rand_chrom(L=400, I=6, seed=0, gap_every=0, centro=None):
    rng = np.random.default_rng(seed)
    steps = rng.integers(100, 4000, size=L)
    if gap_every:
        steps[::gap_every] = 300000
    pos = np.cumsum(steps).astype(np.int64)
    freq = np.clip(rng.beta(0.8, 0.8, L), 0.01, 0.99)
    geno = rng.integers(0, 3, size=(I, L)).astype(np.int8)
    geno[rng.random((I, L)) < 0.05] = -9
    return geno, pos, freq


@pytest.mark.parametrize("gap_every,centro", [
    (0, (10**9, 10**9 + 1)),
    (37, (10**9, 10**9 + 1)),
    (0, (300000, 500000)),
    (23, (200000, 600000)),
])
def test_exact_engine_matches_transliteration(gap_every, centro):
    W, MG = 20, 200000
    geno, pos, freq = _rand_chrom(gap_every=gap_every, seed=3)
    ref = calc_lod_transliterated(geno, pos, freq, W, 0.001, MG, *centro)
    terms = lod_ops.lod_terms(geno, freq, 0.001)
    miss = lod_ops.window_missing_mask(pos, W, MG, *centro)
    ours = lod_ops.lod_windows_exact(terms, miss, W)
    # MISSING placement (the gap/centromere mask vs the reference's
    # skip-ahead control flow) must agree exactly
    np.testing.assert_array_equal(ours == MISSING, ref == MISSING)
    # values agree to ~1 ulp (math.log10 vs np.log10 rounding)
    live = ref != MISSING
    np.testing.assert_allclose(ours[live], ref[live], rtol=1e-12, atol=1e-12)


def test_native_matches_numpy_rolling():
    W = 15
    geno, pos, freq = _rand_chrom(gap_every=29, seed=9)
    terms = lod_ops.lod_terms(geno, freq, 0.002)
    miss = lod_ops.window_missing_mask(pos, W, 150000, 10**9, 10**9 + 1)
    a = lod_ops._lod_windows_exact_numpy(terms, miss, W)
    try:
        from garlic_tpu.native import lod_windows_exact_native
        b = lod_windows_exact_native(terms, miss, W)
    except Exception:
        pytest.skip("native unavailable")
    np.testing.assert_array_equal(a, b)


def test_fast_engine_close_to_exact():
    import jax.numpy as jnp
    W = 30
    geno, pos, freq = _rand_chrom(L=600, gap_every=41, seed=5)
    terms = lod_ops.lod_terms(geno, freq, 0.001)
    miss = lod_ops.window_missing_mask(pos, W, 200000, 10**9, 10**9 + 1)
    exact = lod_ops.lod_windows_exact(terms, miss, W)
    table = lod_ops.lod_table(freq, 0.001).astype(np.float32)
    fast = np.asarray(lod_ops.lod_windows_fast_jax(
        jnp.asarray(geno), jnp.asarray(table), jnp.asarray(miss), W))
    same_missing = (exact == MISSING) == (fast == MISSING)
    assert same_missing.all()
    live = exact != MISSING
    np.testing.assert_allclose(fast[live], exact[live], rtol=2e-4, atol=2e-4)


def test_lod_truth_table():
    """lod() against the manual's Table 1 model
    (manual/garlic-manual.tex:131-144)."""
    p, e = 0.3, 0.01
    for g in (0, 1, 2, -9):
        got = float(lod_ops.lod_terms(np.array([[g]], np.int8),
                                      np.array([p]), e)[0, 0])
        assert got == pytest.approx(lod_scalar(g, p, e), abs=0)
    # monomorphic -> 0 for every genotype
    for p0 in (0.0, 1.0):
        for g in (0, 1, 2, -9):
            got = float(lod_ops.lod_terms(np.array([[g]], np.int8),
                                          np.array([p0]), e)[0, 0])
            assert got == 0.0


def test_gl_error_overrides_scalar():
    geno, pos, freq = _rand_chrom(L=50, I=2, seed=1)
    gl = np.full(geno.shape, 0.2)
    t_gl = lod_ops.lod_terms(geno, freq, gl)
    t_sc = lod_ops.lod_terms(geno, freq, 0.2)
    np.testing.assert_array_equal(t_gl, t_sc)


@pytest.mark.parametrize("seed,W", [(0, 31), (1, 60), (2, 90), (3, 130)])
def test_tie_band_bounds_fast_engine_error(seed, W):
    """The tie-patrol band (pipeline._tie_band) must upper-bound the
    fast engine's actual |f32 - f64| window deviation with margin — on
    hardware the calibrated headroom is >13x (BASELINE.md); here the
    CPU conv path must stay within half the band."""
    from garlic_tpu.core.types import ChromData
    from garlic_tpu.pipeline import _tie_band
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    I, L = 12, 4000
    geno = rng.integers(0, 3, (I, L)).astype(np.int8)
    geno[rng.random((I, L)) < 0.02] = -9
    freq = np.clip(rng.beta(1.2, 1.2, L), 0.005, 0.995)
    err = 0.001
    table64 = lod_ops.lod_table(freq, err)
    miss = np.zeros(L - W + 1, dtype=bool)
    f32 = np.asarray(lod_ops.lod_windows_fast_jax(
        jnp.asarray(geno), jnp.asarray(table64.astype(np.float32)),
        jnp.asarray(miss), W)).astype(np.float64)[:, :L - W + 1]
    terms = lod_ops.lod_terms(geno, freq, err)
    ex = lod_ops.lod_windows_exact(terms, miss, W)[:, :L - W + 1]
    live = (ex > -9000) & (f32 > -9000)
    d = np.abs(f32 - ex)[live].max()
    chrom = ChromData(chrom="chr1", positions=np.arange(L, dtype=np.int64),
                      gpos=np.zeros(L), locus_names=None, alleles=None,
                      genotypes=geno, freq=freq)
    band = _tie_band([chrom], W, err, False)
    assert d < band / 2, (d, band)
