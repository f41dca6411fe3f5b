"""SPMD engine tests on the virtual 8-device CPU mesh (conftest forces
--xla_force_host_platform_device_count=8): the sharded analysis step must
agree with the single-device/numpy reference path."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from garlic_tpu.ops import lod as lod_ops
from garlic_tpu.parallel import (factor_devices, full_window_missing,
                                 make_analysis_step, make_mesh, pad_for_mesh)

W = 8
ERROR = 0.001
MAX_GAP = 200000


def _panel(I=12, L=200, seed=0, gap_at=None):
    rng = np.random.default_rng(seed)
    geno = rng.integers(0, 3, size=(I, L)).astype(np.int8)
    geno[rng.random((I, L)) < 0.02] = -9
    steps = rng.integers(500, 3000, size=L)
    if gap_at is not None:
        steps[gap_at] = MAX_GAP + 1
    positions = np.cumsum(steps).astype(np.int64)
    return geno, positions


def _numpy_freq(geno):
    valid = geno >= 0
    num = np.where(valid, geno, 0).sum(axis=0).astype(np.float64)
    den = 2.0 * valid.sum(axis=0)
    return np.where(den > 0, num / den, 0.0)


def _run_step(geno, positions, n_dp, n_sp, thin=None):
    mesh = make_mesh(n_dp=n_dp, n_sp=n_sp)
    miss = full_window_missing(positions, W, MAX_GAP, 10**9, 10**9 + 1)
    geno_p, miss_p, iw = pad_for_mesh(geno, miss, mesh)
    step = make_analysis_step(mesh, winsize=W, error=ERROR,
                              kde_thin_step=thin or W)
    g_dev, m_dev, w_dev = step.place(geno_p, miss_p, iw)
    grid = jnp.linspace(-3.0, 3.0, 512, dtype=jnp.float32)
    h = jnp.float32(0.25)
    gw = jnp.array([0.5, 0.3, 0.2], dtype=jnp.float32)
    gmu = jnp.array([-1.0, 0.0, 1.0], dtype=jnp.float32)
    gvar = jnp.array([1.0, 0.5, 2.0], dtype=jnp.float32)
    out = step(g_dev, m_dev, w_dev, grid, h, gw, gmu, gvar)
    return [np.asarray(o) for o in out], miss_p, np.asarray(grid), 0.25


@pytest.mark.parametrize("n_dp,n_sp", [(8, 1), (1, 8), (2, 4), (4, 2)])
def test_sharded_matches_single_chip(n_dp, n_sp):
    geno, positions = _panel(gap_at=97)
    (freq, win, dens, nw, nmu, nvar, ll), miss_p, grid, h = _run_step(
        geno, positions, n_dp, n_sp)
    I, L = geno.shape

    # frequencies: psum over dp == full-panel freq
    np.testing.assert_allclose(freq[:L], _numpy_freq(geno), rtol=1e-6)

    # windows: match the single-device fast engine
    table = lod_ops.lod_table(_numpy_freq(geno), ERROR).astype(np.float32)
    miss_win = miss_p[:L - W + 1]
    ref = np.asarray(lod_ops.lod_windows_fast_jax(
        jnp.asarray(geno), jnp.asarray(table),
        jnp.asarray(miss_win), W))
    np.testing.assert_allclose(win[:I, :L], ref, rtol=2e-4, atol=2e-4)


def test_kde_density_matches_direct():
    geno, positions = _panel(seed=3)
    (freq, win, dens, *_), miss_p, grid, h = _run_step(geno, positions, 2, 4)
    I, L = geno.shape
    # direct: thin to every W-th window over the unpadded panel
    wmat = win[:I, :L]
    use = ~miss_p[:L] & (np.arange(L) % W == 0)
    samples = wmat[:, use].ravel()
    d = samples[:, None] - grid[None, :]
    direct = np.exp(-0.5 * d * d / (h * h)).sum(axis=0)
    direct /= samples.size * h * np.sqrt(2 * np.pi)
    np.testing.assert_allclose(dens, direct, rtol=1e-3, atol=1e-6)


def test_gmm_step_matches_numpy():
    geno, positions = _panel(seed=5)
    (freq, win, dens, nw, nmu, nvar, ll), miss_p, grid, h = _run_step(
        geno, positions, 4, 2)
    I, L = geno.shape
    wmat = win[:I, :L]
    use = ~miss_p[:L] & (np.arange(L) % W == 0)
    x = wmat[:, use].ravel().astype(np.float64)
    w0 = np.array([0.5, 0.3, 0.2])
    mu0 = np.array([-1.0, 0.0, 1.0])
    var0 = np.array([1.0, 0.5, 2.0])
    logp = (-0.5 * (x[:, None] - mu0) ** 2 / var0
            - 0.5 * np.log(2 * np.pi * var0) + np.log(w0))
    m = logp.max(axis=1, keepdims=True)
    r = np.exp(logp - m)
    resp = r / r.sum(axis=1, keepdims=True)
    s0 = resp.sum(axis=0)
    np.testing.assert_allclose(nw, s0 / x.size, rtol=1e-3)
    np.testing.assert_allclose(nmu, (resp * x[:, None]).sum(0) / s0,
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("mesh_spec", ["4x2", "8x1", "2x4"])
def test_pipeline_end_to_end_on_mesh(tmp_path, mesh_spec):
    """Full CLI run with --tpu-mesh on the virtual 8-device CPU mesh must
    produce the same BED as the single-device fast engine."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, write_tped, run_ours

    panel = make_panel(nind=22, nloci_per_chr=(3000, 2000), seed=13)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--build", "hg18",
            "--winsize", "40", "--error", "0.001", "--lod-cutoff", "1.2",
            "--size-bounds", "300000", "800000", "--kde-subsample", "0",
            "--tpu-engine", "fast"]
    wd = str(tmp_path)
    assert run_ours(wd, base + ["--out", "single"]) == 0
    assert run_ours(wd, base + ["--tpu-mesh", mesh_spec,
                                "--out", "meshed"]) == 0
    a = open(os.path.join(wd, "single.roh.bed")).read()
    b = open(os.path.join(wd, "meshed.roh.bed")).read()
    assert a == b


def test_pipeline_mesh_with_auto_cutoff(tmp_path):
    """Auto KDE cutoff through the sharded path (thinned device samples
    must exclude mesh padding)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, write_tped, run_ours

    panel = make_panel(nind=30, nloci_per_chr=(6000,), seed=17)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--build", "hg18",
            "--winsize", "50", "--error", "0.001", "--kde-subsample", "0",
            "--size-bounds", "300000", "800000", "--tpu-engine", "fast"]
    wd = str(tmp_path)
    assert run_ours(wd, base + ["--out", "single"]) == 0
    assert run_ours(wd, base + ["--tpu-mesh", "4x2", "--out", "meshed"]) == 0
    a = open(os.path.join(wd, "single.roh.bed")).read()
    b = open(os.path.join(wd, "meshed.roh.bed")).read()
    assert a == b


def test_pipeline_streaming_mode_identical(tmp_path, monkeypatch):
    """GARLIC_TPU_HBM_BUDGET forces per-chromosome rematerialization; the
    BED must match the resident fast engine exactly."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, write_tped, run_ours

    panel = make_panel(nind=20, nloci_per_chr=(3000, 2500), seed=19)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--build", "hg18",
            "--winsize", "40", "--error", "0.001", "--kde-subsample", "0",
            "--size-bounds", "300000", "800000", "--raw-lod",
            "--tpu-engine", "fast"]
    wd = str(tmp_path)
    assert run_ours(wd, base + ["--out", "resident"]) == 0
    monkeypatch.setenv("GARLIC_TPU_HBM_BUDGET", "1")  # force streaming
    assert run_ours(wd, base + ["--out", "streamed"]) == 0
    a = open(os.path.join(wd, "resident.roh.bed")).read()
    b = open(os.path.join(wd, "streamed.roh.bed")).read()
    assert a == b
    import gzip
    for chrom in ("chr1", "chr2"):
        fa = os.path.join(wd, f"resident.POP1.{chrom}.raw.lod.windows.gz")
        fb = os.path.join(wd, f"streamed.POP1.{chrom}.raw.lod.windows.gz")
        with gzip.open(fa, "rt") as f:
            ra = f.read()
        with gzip.open(fb, "rt") as f:
            rb = f.read()
        assert ra == rb, chrom


def test_factor_devices():
    assert factor_devices(8) == (2, 4)
    assert factor_devices(1) == (1, 1)
    assert factor_devices(7) == (7, 1)
    dp, sp = factor_devices(6)
    assert dp * sp == 6
