"""Winsize/overlap auto-selection heuristic unit tests (SURVEY components
#22-23): wiggle metric vs scipy linear fits, density formulas."""

from __future__ import annotations

import math

import numpy as np
import pytest

from garlic_tpu.ops import density, wiggle
from garlic_tpu.ops.kde import KDEResult


def test_wiggle_matches_scipy_linregress():
    from scipy.stats import linregress
    rng = np.random.default_rng(0)
    x = np.linspace(0, 1, 100)
    y = np.exp(-0.5 * (x - 0.5) ** 2 / 0.01) + rng.normal(0, 0.02, 100)
    kr = KDEResult(x=x.copy(), y=y.copy())
    got = wiggle.calculate_wiggle(kr, winsize=20)
    # reference scales y by 100 in place before fitting
    y100 = y * 100.0
    expect = 0.0
    for i in range(100 - 20):
        xs, ys = x[i:i + 20], y100[i:i + 20]
        r = linregress(xs, ys)
        resid = ys - (r.intercept + r.slope * xs)
        expect += float(np.sum(resid * resid)) / 20.0
    assert got == pytest.approx(expect, rel=1e-9)
    # in-place x100 mutation preserved (the written .kde depends on it)
    np.testing.assert_allclose(kr.y, y100)


def test_calc_density():
    class C:
        def __init__(self, chrom, pos):
            self.chrom = chrom
            self.positions = np.asarray(pos)

    class Centro:
        def start(self, c):
            return 500

        def end(self, c):
            return 700

    chroms = [C("chr1", [100, 5000]), C("chr2", [200, 3000])]
    d = density.calc_density(1000, chroms, Centro())
    expect = 1000 / ((5000 - 100 + 1 - 200) + (3000 - 200 + 1 - 200))
    assert d == pytest.approx(expect, rel=1e-12)


def test_select_overlap_frac_formula_and_clamps():
    d = 1e-3
    assert density.select_overlap_frac(d, 60) == pytest.approx(
        (6.375 * math.log(d) + 63.888) / 100.0)
    # very high density -> clamp to 1
    assert density.select_overlap_frac(1e3, 60) == 1.0
    # very low density -> 1/winsize
    assert density.select_overlap_frac(1e-30, 50) == pytest.approx(1 / 50)


def test_select_winsize_weighted():
    d = 1e-3
    expect = int(8.3235 * math.log(d) + 138.0521 + 0.5)
    assert density.select_winsize_weighted(d) == expect
    assert density.select_winsize_weighted(1e-30) == 10  # floor
