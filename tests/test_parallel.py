"""SPMD engine tests on the virtual 8-device CPU mesh (conftest forces
--xla_force_host_platform_device_count=8): the production sharded
collectives (lod_windows_sharded, allele_freq_sharded,
gauss_transform_sharded, fit_gmm_sharded) must agree with the
single-device/numpy reference paths — the same functions pipeline.py
drives on --tpu-mesh runs."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from garlic_tpu.ops import gmm as gmm_ops
from garlic_tpu.ops import kde as kde_ops
from garlic_tpu.ops import lod as lod_ops
from garlic_tpu.parallel import (allele_freq_sharded, factor_devices,
                                 fit_gmm_sharded, full_window_missing,
                                 gauss_transform_sharded,
                                 lod_windows_sharded, make_mesh,
                                 pad_for_mesh)

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


def _chrom(geno, positions, freq):
    from garlic_tpu.core.types import ChromData
    I, L = geno.shape
    return ChromData(chrom="chr1", positions=positions,
                     gpos=np.zeros(L), locus_names=[f"r{i}" for i in range(L)],
                     alleles=np.array(["A"] * L), genotypes=geno, freq=freq)


def _centro():
    from garlic_tpu.centromeres import Centromere
    from garlic_tpu.logger import RunLog
    return Centromere("hg18", "none", "none", RunLog())


@pytest.mark.parametrize("n_dp,n_sp", [(8, 1), (1, 8), (2, 4), (4, 2)])
def test_sharded_lod_matches_single_chip(n_dp, n_sp):
    """lod_windows_sharded (the production --tpu-mesh Phase-I path) must
    match the single-device fast engine across mesh factorizations."""
    geno, positions = _panel(gap_at=97)
    freq = _numpy_freq(geno)
    mesh = make_mesh(n_dp=n_dp, n_sp=n_sp)
    dw = lod_windows_sharded(_chrom(geno, positions, freq), _centro(),
                             W, ERROR, MAX_GAP, mesh)
    got = dw.to_numpy()
    I, L = geno.shape

    table = lod_ops.lod_table(freq, ERROR).astype(np.float32)
    miss = full_window_missing(positions, W, MAX_GAP, 10**18, 10**18 + 1)
    ref = np.asarray(lod_ops.lod_windows_fast_jax(
        jnp.asarray(geno), jnp.asarray(table),
        jnp.asarray(miss[:L - W + 1]), W))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_allele_freq_sharded():
    """Freq numerator/denominator psum over dp == full-panel freq (the
    multi-host loading collective)."""
    geno, _ = _panel(seed=3)
    mesh = make_mesh(n_dp=2, n_sp=4)
    miss = np.zeros(geno.shape[1], dtype=bool)
    geno_p, _, _ = pad_for_mesh(geno, miss, mesh)
    freq = allele_freq_sharded(geno_p, mesh)
    np.testing.assert_allclose(freq[:geno.shape[1]], _numpy_freq(geno),
                               rtol=1e-6)


def test_gauss_transform_sharded_matches_host():
    """The Phase-II collective: per-shard partial Gauss transforms psum'd
    over the mesh == the host/blocked transform."""
    rng = np.random.default_rng(7)
    src = rng.standard_normal(5000) * 1.7 + 0.4
    tgt = np.linspace(-4.0, 5.0, 512)
    h = 0.21
    mesh = make_mesh(n_dp=4, n_sp=2)
    got = gauss_transform_sharded(src, tgt, h, mesh) / src.shape[0]
    want = kde_ops.gauss_transform(src, tgt, h, device=False)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-7)


def test_compute_kde_mesh_matches_host():
    """compute_kde(mesh=...) — the production --tpu-mesh Phase II — gives
    the same grid and a density within f32-psum tolerance of the host."""
    rng = np.random.default_rng(11)
    x = np.concatenate([rng.standard_normal(4000) - 2.0,
                        rng.standard_normal(2000) * 0.5 + 2.5])
    mesh = make_mesh(n_dp=2, n_sp=4)
    a = kde_ops.compute_kde(x)
    b = kde_ops.compute_kde(x, mesh=mesh)
    np.testing.assert_array_equal(a.x, b.x)  # identical grid (host nrd0)
    np.testing.assert_allclose(a.y, b.y, rtol=2e-4, atol=1e-9)


def test_fit_gmm_sharded_matches_host(monkeypatch):
    """The Phase-IV collective: the full psum'd EM loop must reproduce the
    host f64 EM (same iterations, same convergence, same params) on
    ROH-length-scale data.  The host-EM fallback is disabled so a silent
    regression to it cannot vacuously pass this test."""
    rng = np.random.default_rng(13)
    lengths = np.concatenate([
        rng.normal(4.5e5, 8e4, 3000),
        rng.normal(1.2e6, 2e5, 1500),
        rng.normal(3.0e6, 5e5, 500)]).clip(1e4, None)
    k = 3
    var = float(np.var(lengths, ddof=1))
    mean = float(np.mean(lengths))
    w0 = np.full(k, 1.0 / k)
    mu0 = np.array([mean * (n + 1) / (k + 1) for n in range(k)])
    var0 = np.array([var * (n + 1) / k for n in range(k)])
    host = gmm_ops.fit_gmm(lengths, k, w0, mu0, var0)
    mesh = make_mesh(n_dp=4, n_sp=2)

    def _no_fallback(*a, **kw):
        raise AssertionError("sharded GMM fell back to the host EM")

    monkeypatch.setattr(gmm_ops, "fit_gmm", _no_fallback)
    dist = fit_gmm_sharded(lengths, k, w0, mu0, var0, mesh)
    np.testing.assert_allclose(dist.weights, host.weights, rtol=1e-8)
    np.testing.assert_allclose(dist.means, host.means, rtol=1e-8)
    np.testing.assert_allclose(dist.variances, host.variances, rtol=1e-8)
    assert dist.converged == host.converged
    assert abs(dist.iterations - host.iterations) <= 1
    np.testing.assert_allclose(dist.loglikelihood, host.loglikelihood,
                               rtol=1e-10)


def test_select_size_classes_mesh_identical():
    """select_size_classes with a mesh must give the same bounds as the
    host path (the BED class letters depend on them)."""
    rng = np.random.default_rng(17)
    lengths = np.concatenate([
        rng.normal(5e5, 1e5, 2000),
        rng.normal(1.5e6, 2e5, 800),
        rng.normal(4e6, 6e5, 300)]).clip(1e4, None)
    mesh = make_mesh(n_dp=8, n_sp=1)
    bounds_host, _ = gmm_ops.select_size_classes(lengths, 3)
    bounds_mesh, _ = gmm_ops.select_size_classes(lengths, 3, mesh=mesh)
    np.testing.assert_allclose(bounds_mesh, bounds_host, rtol=1e-7)


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


@pytest.mark.parametrize("mesh_spec", ["4x2", "2x4"])
def test_pipeline_weighted_on_mesh(tmp_path, mesh_spec):
    """--tpu-mesh --weighted: the psum'd LD band + halo'd wLOD scan must
    produce the same BED as the single-device fast engine."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, write_map_scaffold, write_tped, run_ours

    panel = make_panel(nind=20, nloci_per_chr=(3000, 2000), seed=41)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    write_map_scaffold(panel, str(tmp_path / "p.map.gz"))
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--build", "hg18",
            "--map", "p.map.gz", "--weighted", "--winsize", "30",
            "--error", "0.001", "--lod-cutoff", "1.0", "--kde-subsample", "0",
            "--size-bounds", "300000", "800000", "--tpu-engine", "fast"]
    wd = str(tmp_path)
    assert run_ours(wd, base + ["--out", "single"]) == 0
    assert run_ours(wd, base + ["--tpu-mesh", mesh_spec,
                                "--out", "meshed"]) == 0
    a = open(os.path.join(wd, "single.roh.bed")).read()
    b = open(os.path.join(wd, "meshed.roh.bed")).read()
    assert a == b


def test_pipeline_weighted_phased_ld_subsample_on_mesh(tmp_path):
    """--tpu-mesh --weighted --phased with an LD individual subsample."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, write_map_scaffold, write_tped, run_ours

    panel = make_panel(nind=18, nloci_per_chr=(2500,), seed=43)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    write_map_scaffold(panel, str(tmp_path / "p.map.gz"))
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--build", "hg18",
            "--map", "p.map.gz", "--weighted", "--phased", "--winsize", "30",
            "--error", "0.001", "--lod-cutoff", "1.0", "--kde-subsample", "0",
            "--ld-subsample", "10", "--tpu-seed", "5",
            "--size-bounds", "300000", "800000", "--tpu-engine", "fast"]
    wd = str(tmp_path)
    assert run_ours(wd, base + ["--out", "single"]) == 0
    assert run_ours(wd, base + ["--tpu-mesh", "4x2", "--out", "meshed"]) == 0
    a = open(os.path.join(wd, "single.roh.bed")).read()
    b = open(os.path.join(wd, "meshed.roh.bed")).read()
    assert a == b


def test_pipeline_tgls_on_mesh(tmp_path):
    """--tpu-mesh with TGLS per-genotype errors: gl shards like geno."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, write_tgls, write_tped, run_ours

    panel = make_panel(nind=20, nloci_per_chr=(3000,), seed=47)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    write_tgls(panel, str(tmp_path / "p.tgls.gz"), gl_type="GQ")
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--build", "hg18",
            "--tgls", "p.tgls.gz", "--gl-type", "GQ", "--winsize", "40",
            "--error", "0.001", "--lod-cutoff", "1.2", "--kde-subsample", "0",
            "--size-bounds", "300000", "800000", "--tpu-engine", "fast"]
    wd = str(tmp_path)
    assert run_ours(wd, base + ["--out", "single"]) == 0
    assert run_ours(wd, base + ["--tpu-mesh", "2x4", "--out", "meshed"]) == 0
    a = open(os.path.join(wd, "single.roh.bed")).read()
    b = open(os.path.join(wd, "meshed.roh.bed")).read()
    assert a == b


@pytest.mark.parametrize("phased", [False, True])
def test_ld_band_sharded_matches_device(phased):
    """The psum'd pair-count LD band == the single-device band."""
    from garlic_tpu.ops import device_wlod
    from garlic_tpu.parallel.engine import ld_band_sharded

    rng = np.random.default_rng(51)
    I, L, Wz = 14, 260, 10
    geno = rng.integers(0, 3, size=(I, L)).astype(np.int8)
    geno[rng.random((I, L)) < 0.03] = -9
    positions = np.cumsum(rng.integers(500, 3000, size=L)).astype(np.int64)
    freq = np.clip(_numpy_freq(geno), 0.02, 0.98)
    from garlic_tpu.core.types import ChromData
    chrom = ChromData(chrom="chr1", positions=positions,
                      gpos=np.cumsum(rng.random(L) * 0.01),
                      locus_names=[f"r{i}" for i in range(L)],
                      alleles=np.array(["A"] * L), genotypes=geno, freq=freq,
                      first_copy=rng.integers(0, 2, (I, L)).astype(bool))
    mesh = make_mesh(n_dp=2, n_sp=4)
    got = np.asarray(ld_band_sharded(chrom, Wz, phased, None, mesh))
    want = np.asarray(device_wlod.ld_band_device(chrom, Wz, phased, None))
    nwin = L - Wz + 1
    np.testing.assert_allclose(got[:nwin], want[:nwin], rtol=3e-5, atol=3e-5)


def test_pipeline_mesh_auto(tmp_path):
    """--tpu-mesh auto factors all visible devices (8 on the test mesh)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, write_tped, run_ours

    panel = make_panel(nind=16, nloci_per_chr=(2000,), seed=71)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--build", "hg18",
            "--winsize", "30", "--error", "0.001", "--lod-cutoff", "1.2",
            "--size-bounds", "300000", "800000", "--kde-subsample", "0",
            "--tpu-engine", "fast"]
    wd = str(tmp_path)
    assert run_ours(wd, base + ["--out", "single"]) == 0
    assert run_ours(wd, base + ["--tpu-mesh", "auto", "--out", "auto"]) == 0
    a = open(os.path.join(wd, "single.roh.bed")).read()
    b = open(os.path.join(wd, "auto.roh.bed")).read()
    assert a == b
