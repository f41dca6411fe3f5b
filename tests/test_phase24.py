"""Phase II/IV unit tests: nrd0 bandwidth, KDE normalization, cutoff finder,
GMM vs sklearn, Brent boundary vs scipy (SURVEY.md §4)."""

from __future__ import annotations

import numpy as np
import pytest

from garlic_tpu.ops import cutoff as cutoff_ops
from garlic_tpu.ops import gmm as gmm_ops
from garlic_tpu.ops import kde as kde_ops
from garlic_tpu.ops.brent import find_boundary


def test_nrd0_matches_r_bw_nrd0():
    """R's bw.nrd0: 0.9 * min(sd, IQR/1.34) * n^(-1/5) with type-7
    quantiles (GSL's interpolation on sorted data is the same type-7)."""
    rng = np.random.default_rng(0)
    x = rng.normal(2.0, 3.0, size=501)
    n = x.size
    sd = np.std(x, ddof=1)
    q75, q25 = np.quantile(x, [0.75, 0.25])  # numpy default = type 7
    expect = 0.9 * min(sd, (q75 - q25) / 1.34) * n ** -0.2
    assert kde_ops.nrd0(x) == pytest.approx(expect, rel=1e-12)


def test_gsl_sd_native_matches_longdouble_fallback():
    """gt_gsl_sd (C++ 80-bit x87 running-mean recurrences, GSL's exact op
    sequence from the oracle disassembly) must agree BIT-for-bit with the
    np.longdouble Python fallback, and generally differs from np.std's
    pairwise summation in the last ulps — the difference that shifted the
    .kde x grid pre-round-4."""
    from garlic_tpu.native import gsl_sd_native, native_available
    if not native_available():
        pytest.skip("native lib unavailable")
    any_ulp_diff = False
    for seed in range(8):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(100, 50000))
        x = np.sort(rng.normal(rng.uniform(-5, 5),
                               rng.uniform(0.1, 30), size=n))
        nat = gsl_sd_native(x)
        assert nat == _longdouble_sd(x), (seed, nat)
        if nat != np.std(x, ddof=1):
            any_ulp_diff = True
    assert any_ulp_diff  # np.std is NOT the GSL recurrence


def _longdouble_sd(x: np.ndarray) -> float:
    """The fallback recurrence, inlined (same code path as
    kde._gsl_sd_sorted when the native lib is absent)."""
    n = x.shape[0]
    mean = np.longdouble(0.0)
    for i in range(n):
        mean += (np.longdouble(x[i]) - mean) / np.longdouble(i + 1)
    mean_d = np.float64(mean)
    var = np.longdouble(0.0)
    for i in range(n):
        delta = np.float64(x[i] - mean_d)
        var += (np.longdouble(delta) * np.longdouble(delta) - var) \
            / np.longdouble(i + 1)
    var_d = np.float64(var)
    return float(np.sqrt(np.float64(n) / np.float64(n - 1) * var_d))


def test_kde_grid_and_normalization():
    rng = np.random.default_rng(1)
    x = np.concatenate([rng.normal(-2, 0.5, 3000), rng.normal(3, 1.0, 2000)])
    kr = kde_ops.compute_kde(x)
    assert kr.size == 512
    h = kde_ops.nrd0(x)
    lo, hi = x.min() - 3 * h, x.max() + 3 * h
    # targets: (i/512)*(hi-lo)+lo for i=1..512 (src/garlic-kde.cpp:33-47)
    np.testing.assert_allclose(kr.x[0], (1 / 512) * (hi - lo) + lo, rtol=1e-12)
    np.testing.assert_allclose(kr.x[-1], hi, rtol=1e-12)
    spacing = kr.x[1] - kr.x[0]
    assert np.sum(kr.y) * spacing == pytest.approx(1.0, rel=1e-9)


def test_kde_device_close_to_host():
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, 20000)
    a = kde_ops.compute_kde(x, device=False)
    b = kde_ops.compute_kde(x, device=True)
    np.testing.assert_allclose(a.y, b.y, rtol=5e-4, atol=1e-7)


def test_compute_kde_wins_matches_host():
    """Fully in-graph Phase II (compute_kde_wins: thinning + subsetting +
    nrd0 + grid + transform in one jit) reproduces the host pipeline
    win_to_samples -> compute_kde, including bucketed/padded DeviceWin
    layouts and MISSING tails (src/garlic-data.cpp:2026-2150)."""
    import jax.numpy as jnp

    from garlic_tpu.core.types import MISSING
    from garlic_tpu.ops import convert
    from garlic_tpu.ops.device_win import DeviceWin

    rng = np.random.default_rng(3)
    win_by_chr, host_wins = [], []
    for nind, nloci, nwin, bucketed in [(7, 300, 280, True),
                                        (7, 210, 195, False)]:
        m = np.full((nind, nloci), float(MISSING), np.float32)
        m[:, :nwin] = rng.normal(-1, 2, (nind, nwin)).astype(np.float32)
        host_wins.append(m.astype(np.float64))
        if bucketed:  # [I2, NW2] window-start columns only, padded
            d = np.full((8, 384), float(MISSING), np.float32)
            d[:nind, :nwin] = m[:, :nwin]
            win_by_chr.append(DeviceWin(win=jnp.asarray(d), nind=nind,
                                        nloci=nloci, nwin=nwin))
        else:  # [I', L'] spanning nloci, padded past it
            d = np.full((8, 256), float(MISSING), np.float32)
            d[:nind, :nloci] = m
            win_by_chr.append(DeviceWin(win=jnp.asarray(d), nind=nind,
                                        nloci=nloci))
    step, idx = 3, np.array([0, 2, 5])
    got = kde_ops.compute_kde_wins(win_by_chr, step, ind_idx=idx)
    assert got is not None
    want = kde_ops.compute_kde(
        convert.win_to_samples(host_wins, step, ind_idx=idx))
    np.testing.assert_allclose(got.x, want.x, rtol=1e-10)
    np.testing.assert_allclose(got.y, want.y, rtol=5e-4, atol=1e-7)


def test_cutoff_bimodal():
    """On a clean bimodal density the cutoff is the minimum between modes."""
    x = np.linspace(-4, 4, 512)
    y = (np.exp(-0.5 * (x + 2) ** 2 / 0.25)
         + 0.8 * np.exp(-0.5 * (x - 2) ** 2 / 0.25))
    got = cutoff_ops.get_min_btw_modes(x, y, wsize=60)
    valley = x[np.abs(x) < 1.5][np.argmin(y[np.abs(x) < 1.5])]
    assert got == pytest.approx(valley, abs=0.1)


def test_cutoff_sanity_clamp():
    """|cutoff/winsize| >= 1 -> 0 (src/garlic-kde.cpp:231-232)."""
    x = np.linspace(50, 450, 512)
    y = (np.exp(-0.5 * (x - 100) ** 2 / 100)
         + 0.8 * np.exp(-0.5 * (x - 400) ** 2 / 100))
    # valley near x=250 -> |250/60| >= 1 -> clamped to 0
    assert cutoff_ops.get_min_btw_modes(x, y, wsize=60) == 0.0


def test_gmm_recovers_separated_components():
    rng = np.random.default_rng(3)
    x = np.concatenate([rng.normal(100, 10, 4000),
                        rng.normal(500, 40, 3000),
                        rng.normal(2000, 150, 2000)])
    bounds, res = gmm_ops.select_size_classes(x, 3)
    order = np.argsort(res.means)
    mu = res.means[order]
    assert mu[0] == pytest.approx(100, rel=0.1)
    assert mu[1] == pytest.approx(500, rel=0.1)
    assert mu[2] == pytest.approx(2000, rel=0.1)
    assert 100 < bounds[0] < 500 < bounds[1] < 2000


def test_gmm_loglik_matches_sklearn_one_step():
    """Our E-step loglik == sklearn's for the same parameters."""
    sklearn = pytest.importorskip("sklearn.mixture")
    rng = np.random.default_rng(4)
    x = rng.normal(0, 1, 500)
    w = np.array([0.3, 0.7])
    mu = np.array([-1.0, 1.0])
    var = np.array([1.0, 2.0])
    _, _, _, ll = gmm_ops.gmm_sufficient_stats(x, w, mu, var)
    g = sklearn.GaussianMixture(n_components=2, covariance_type="spherical")
    g.weights_ = w
    g.means_ = mu.reshape(-1, 1)
    g.covariances_ = var
    g.precisions_cholesky_ = 1.0 / np.sqrt(var)
    skl = g.score(x.reshape(-1, 1)) * x.size
    assert ll == pytest.approx(skl, rel=1e-9)


def test_brent_boundary_vs_scipy():
    from scipy.optimize import brentq
    from scipy.stats import norm
    m1, v1, a1 = 100.0, 900.0, 0.5
    m2, v2, a2 = 300.0, 2500.0, 0.5

    def f(x):
        return (a1 * norm.pdf(x, m1, np.sqrt(v1))
                - a2 * norm.pdf(x, m2, np.sqrt(v2)))

    expect = brentq(f, m1, m2, xtol=1e-10)
    got = find_boundary(m1, v1, a1, m2, v2, a2, max_iter=1000, epsabs=1e-4)
    assert got == pytest.approx(expect, abs=2e-4)


def test_gmm_collapse_raises():
    x = np.full(50, 1000.0)  # degenerate: zero variance
    with pytest.raises(Exception):
        gmm_ops.select_size_classes(x, 3)


def test_compute_kde_hybrid_matches_exact_grid():
    """compute_kde_hybrid (round 4): bandwidth/grid from the exact f64
    host samples (x bitwise equal to compute_kde on the same pool), y
    from the device-resident f32 thinned windows (equal to the exact
    transform within the Phase-I f32 error class)."""
    import os
    import sys

    import numpy as np

    from garlic_tpu.centromeres import Centromere
    from garlic_tpu.logger import RunLog
    from garlic_tpu.ops import device_win
    from garlic_tpu.core.types import ChromData
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from util import make_panel

    panel = make_panel(nind=16, nloci_per_chr=(3000,), seed=13)
    centro = Centromere("hg18", "__none", "__none", RunLog())
    chroms = []
    g = panel.genotypes[0]
    freq = panel.freq[0]
    chroms.append(ChromData(
        chrom="chr1", positions=panel.positions[0],
        gpos=panel.positions[0] * 1e-6, locus_names=None,
        alleles=np.array(["A"] * g.shape[1]), genotypes=g,
        freq=freq))
    W, err, gap = 30, 0.001, 1000000
    from garlic_tpu.pipeline import _exact_thinned_samples
    samples = _exact_thinned_samples(chroms, centro, W, err, gap, False,
                                     W, None)
    dws = [device_win.lod_windows_device(c, centro, W, err, gap, False)
           for c in chroms]
    kr_h = kde_ops.compute_kde_hybrid(samples, dws, W)
    kr_e = kde_ops.compute_kde(samples, device=False)
    assert kr_h is not None
    assert np.array_equal(kr_h.x, kr_e.x)      # grid: bitwise exact
    assert np.allclose(kr_h.y, kr_e.y, rtol=5e-4, atol=1e-12)


def test_device_gmm_above_gate_matches_host_format():
    """ADVICE r4: the >=4096-ROH device-EM path (1x1 mesh while_loop) vs
    the bit-exact host EM at the scale where it actually engages — the
    logged %g parameters and the class boundaries must agree, and the
    %g-boundary guard must detect any formatting-visible deviation."""
    rng = np.random.default_rng(404)
    # a realistic trimodal ROH length mixture, n >= 4096 (the gate)
    x = np.concatenate([
        rng.normal(2.2e5, 5e4, 2500),
        rng.normal(8.5e5, 1.8e5, 1800),
        rng.normal(2.6e6, 6e5, 900)]).clip(1e4, None)
    assert x.shape[0] >= 4096

    class _Log:
        def __init__(self):
            self.lines = []

        def log(self, *a, nl=True):
            from garlic_tpu.core.fmt import g
            self.lines.append(" ".join(
                v if isinstance(v, str) else g(v) for v in a))

        def logv(self, *a, nl=True):
            self.log(*a)

    lh, ld = _Log(), _Log()
    bounds_host, res_host = gmm_ops.select_size_classes(x, 3, log=lh,
                                                        device=False)
    bounds_dev, res_dev = gmm_ops.select_size_classes(x, 3, log=ld,
                                                      device=True)
    # identical %g-formatted .log parameter lines (the compared artifact)
    assert lh.lines == ld.lines, (lh.lines, ld.lines)
    # boundaries agree within the Brent epsabs (1e-4) — both roots of
    # near-identical parameter sets
    for bh, bd in zip(bounds_host, bounds_dev):
        assert abs(bh - bd) <= 1e-3, (bh, bd)
    assert res_host.iterations == res_dev.iterations


def test_g_format_stable_guard():
    """_g_format_stable flags parameters that sit on a %g rounding
    boundary (where a 1e-13-relative device-vs-host deviation could flip
    a printed digit) and passes ordinary values."""
    from garlic_tpu.ops.gmm import GMMResult, _g_format_stable
    ok = GMMResult(weights=np.array([0.25, 0.5]),
                   means=np.array([1.2345, 7.5]),
                   variances=np.array([2.0, 3.0]),
                   loglikelihood=0.0, bic=0.0, converged=True, iterations=1)
    assert _g_format_stable(ok)
    # 0.1234565 rounds at the 6-significant-digit %g boundary: +-3e-12
    # relative perturbation flips between 0.123456 and 0.123457
    bad = GMMResult(weights=np.array([0.1234565000001]),
                    means=np.array([1.0]), variances=np.array([1.0]),
                    loglikelihood=0.0, bic=0.0, converged=True,
                    iterations=1)
    assert not _g_format_stable(bad)
