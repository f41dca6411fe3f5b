"""Weighted-path unit tests: pairwise HR2/r2 vs scalar transliterations of
the reference (src/garlic-data.cpp:521-617), banded assembly orders, wLOD
weighting factors."""

from __future__ import annotations

import math

import numpy as np
import pytest

from garlic_tpu.ops import ld as ld_ops
from garlic_tpu.ops import wlod as wlod_ops


def hr2_scalar(gA, gB, HA, HB):
    """hr2 (src/garlic-data.cpp:558-583): joint hom-hom freq over the
    subsample, marginals from the full panel."""
    if not (0 < HA < 1) or not (0 < HB < 1):
        return 0.0
    total = 0
    hab = 0
    for a, b in zip(gA, gB):
        if a == -9 or b == -9:
            continue
        total += 1
        if a != 1 and b != 1:
            hab += 1
    if total == 0:
        return 0.0
    h = hab / total - HA * HB
    r = h * h / (HA * (1 - HA) * HB * (1 - HB))
    return min(r, 1.0)


def r2_scalar(gA, gB, fcA, fcB, pA, pB):
    """r2 (src/garlic-data.cpp:585-617)."""
    if not (0 < pA < 1) or not (0 < pB < 1):
        return 0.0
    x11 = 0
    total = 0
    for a, b, fa, fb in zip(gA, gB, fcA, fcB):
        if a == -9 or b == -9:
            continue
        total += 2
        if a == 2 and b == 2:
            x11 += 2
        elif a == 1 and b == 2:
            x11 += 1
        elif a == 2 and b == 1:
            x11 += 1
        elif a == 1 and b == 1 and fa == fb:
            x11 += 1
    if total == 0:
        return 0.0
    D = x11 / total - pA * pB
    r = D * D / (pA * (1 - pA) * pB * (1 - pB))
    return min(r, 1.0)


def _panel(I=20, L=60, seed=0):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 3, size=(I, L)).astype(np.int8)
    g[rng.random((I, L)) < 0.05] = -9
    fc = rng.random((I, L)) < 0.5
    freq = np.clip(rng.beta(2, 2, L), 0.05, 0.95)
    return g, fc, freq


def test_pair_hr2_matches_scalar():
    g, _, _ = _panel(seed=1)
    W = 8
    hf = ld_ops.geno_hom_freq(g)
    P = ld_ops.pair_ld_hr2(g, hf, W)
    L = g.shape[1]
    for m in range(0, L - 1, 7):
        for d in range(1, min(W, L - m)):
            expect = hr2_scalar(g[:, m], g[:, m + d], hf[m], hf[m + d])
            assert P[m, d] == pytest.approx(expect, rel=1e-12), (m, d)


def test_pair_r2_matches_scalar():
    g, fc, freq = _panel(seed=2)
    W = 6
    P = ld_ops.pair_ld_r2(g, fc, freq, W)
    L = g.shape[1]
    for m in range(0, L - 1, 5):
        for d in range(1, min(W, L - m)):
            expect = r2_scalar(g[:, m], g[:, m + d], fc[:, m], fc[:, m + d],
                               freq[m], freq[m + d])
            assert P[m, d] == pytest.approx(expect, rel=1e-12), (m, d)


def test_ld_subsample_marginals_stay_full_panel():
    """HR2 marginal homozygosity freqs come from the FULL panel even when
    the joint counts use a subsample (src/garlic-data.cpp:342-365,558)."""
    g, _, _ = _panel(I=30, seed=3)
    hf_full = ld_ops.geno_hom_freq(g)
    sub = np.arange(10)
    P = ld_ops.pair_ld_hr2(g, hf_full, 5, sub_idx=sub)
    expect = hr2_scalar(g[sub, 10], g[sub, 11], hf_full[10], hf_full[11])
    assert P[10, 1] == pytest.approx(expect, rel=1e-12)


def test_assemble_exact_matches_bruteforce():
    g, _, _ = _panel(seed=4)
    W = 5
    hf = ld_ops.geno_hom_freq(g)
    P = ld_ops.pair_ld_hr2(g, hf, W)
    LD = ld_ops.assemble_ld_exact(P, W)
    L = g.shape[1]
    nwin = L - W + 1

    def pair(m, k):
        if m == k:
            return 1.0
        lo, d = min(m, k), abs(m - k)
        return P[lo, d]

    for l in range(0, nwin, 11):
        for j in range(W):
            expect = sum(pair(l + c, l + j) for c in range(W))
            assert LD[l, j] == pytest.approx(expect, rel=1e-12), (l, j)


def test_assemble_fast_close_to_exact():
    g, _, _ = _panel(I=25, L=120, seed=5)
    W = 9
    hf = ld_ops.geno_hom_freq(g)
    P = ld_ops.pair_ld_hr2(g, hf, W)
    a = ld_ops.assemble_ld_exact(P, W)
    b = ld_ops.assemble_ld_fast(P, W)
    nwin = P.shape[0] - W + 1
    np.testing.assert_allclose(a[:nwin], b[:nwin], rtol=1e-12)


def test_wlod_score_weighting():
    """score = lod * nomut(M,mu,d_bp) * norec(M,d_gpos)
    (src/garlic-roh.cpp:134-141,244-250); first locus uses its own
    coordinates as the interval."""
    from garlic_tpu.core.types import ChromData
    from garlic_tpu.ops.lod import lod_terms
    g, _, freq = _panel(I=4, L=10, seed=6)
    pos = np.cumsum(np.full(10, 1000)).astype(np.int64)
    gpos = np.cumsum(np.full(10, 0.01))
    c = ChromData(chrom="chr1", positions=pos, gpos=gpos,
                  locus_names=[f"r{i}" for i in range(10)],
                  alleles=np.array(["A"] * 10), genotypes=g, freq=freq)
    mu, M = 1e-9, 7
    score = wlod_ops.wlod_scores(c, 0.001, False, mu, M)
    base = lod_terms(g, freq, 0.001)
    for l in (0, 1, 9):
        dp = pos[l] if l == 0 else pos[l] - pos[l - 1]
        dg = gpos[l] if l == 0 else gpos[l] - gpos[l - 1]
        expect = base[:, l] * math.exp(-2 * M * mu * dp) \
            * math.exp(-2 * M * dg)
        np.testing.assert_allclose(score[:, l], expect, rtol=1e-12)
