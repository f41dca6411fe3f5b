"""Phase-II exact-sample pool cache (io/poolcache.py): warm runs replay
the grid scalars / mmap the pool instead of re-running the exact sampler;
staleness is content-keyed (digests, not mtimes)."""

from __future__ import annotations

import os
import time

import numpy as np
import pytest

from .util import make_panel, read_text, run_ours, write_tped

ARGS = ["--build", "hg18", "--winsize", "40", "--error", "0.001",
        "--kde-subsample", "0", "--tpu-engine", "fast",
        # bounds pinned: tiny panels collapse the GMM on both engines;
        # the class under test is the Phase-II pool cache
        "--size-bounds", "300000", "800000",
        "--tpu-panel-cache"]


def _wait_pool(sidecar: str, timeout=10.0):
    """The pool write runs on a background thread; join by polling."""
    npy = sidecar + ".p2pool.npy"
    t0 = time.time()
    while time.time() - t0 < timeout:
        if os.path.exists(npy) and os.path.exists(sidecar + ".p2pool.json"):
            return npy
        time.sleep(0.05)
    raise AssertionError("pool cache file never appeared")


def test_pool_grid_replay_bit_exact():
    """PoolEntry.grid() must replay _kde_grid's arithmetic bit-for-bit
    from the stored (h, mn, mx) scalars."""
    from garlic_tpu.io.poolcache import PoolEntry
    from garlic_tpu.ops.kde import _kde_grid, nrd0
    rng = np.random.default_rng(3)
    data = rng.normal(1.0, 2.0, 50_000)
    h, targets, spacing = _kde_grid(data)
    ent = PoolEntry("x", data.size, nrd0(data),
                    float(np.min(data)), float(np.max(data)))
    h2, t2, s2, n2 = ent.grid()
    assert h2 == h and s2 == spacing and n2 == data.size
    assert np.array_equal(t2, targets)


def test_pool_cache_warm_run_byte_identical(tmp_path):
    """Cold run writes the pool; the warm run must produce byte-identical
    .kde/.log/.roh.bed while actually hitting the cache."""
    panel = make_panel(nind=30, nloci_per_chr=(5000,), seed=5)
    wd = str(tmp_path)
    write_tped(panel, f"{wd}/p.tped.gz", f"{wd}/p.tfam")
    args = ["--tped", "p.tped.gz", "--tfam", "p.tfam"] + ARGS
    assert run_ours(wd, args + ["--out", "cold"]) == 0
    sidecar = f"{wd}/p.tped.gz.gtpc"
    npy = _wait_pool(sidecar)
    # sanity: the stored pool is the exact sampler's values
    pool = np.load(npy)
    assert pool.dtype == np.float64 and pool.size > 0
    # warm run: cache must be hit (instrument via lookup) and outputs equal
    from garlic_tpu.io import poolcache
    hits = []
    orig = poolcache.PoolCache.lookup

    def spy(self, w, s):
        r = orig(self, w, s)
        hits.append(r is not None)
        return r

    poolcache.PoolCache.lookup = spy
    try:
        assert run_ours(wd, args + ["--out", "warm"]) == 0
    finally:
        poolcache.PoolCache.lookup = orig
    assert hits and hits[-1], "warm run did not hit the pool cache"
    for sfx in (".40SNPs.kde", ".roh.bed"):
        assert read_text(f"{wd}/cold{sfx}") == read_text(f"{wd}/warm{sfx}"), sfx
    cold_log = read_text(f"{wd}/cold.log").replace("cold", "OUT")
    warm_log = read_text(f"{wd}/warm.log").replace("warm", "OUT")
    assert cold_log.splitlines()[1:] == warm_log.splitlines()[1:]


def test_pool_cache_stale_panel_rejected(tmp_path):
    """Swapping the panel content (mtime preserved) must reject the
    cached pool — the key is content digests, not file metadata."""
    wd = str(tmp_path)
    args = ["--tped", "p.tped.gz", "--tfam", "p.tfam"] + ARGS
    panel_a = make_panel(nind=28, nloci_per_chr=(4000,), seed=7)
    write_tped(panel_a, f"{wd}/p.tped.gz", f"{wd}/p.tfam")
    assert run_ours(wd, args + ["--out", "a"]) == 0
    sidecar = f"{wd}/p.tped.gz.gtpc"
    _wait_pool(sidecar)
    st = os.stat(f"{wd}/p.tped.gz")
    # swap in a DIFFERENT panel, restore mtime; the .gtpc sidecar itself
    # revalidates by content probe, and the pool key hangs off the
    # filtered digests — both must reject
    panel_b = make_panel(nind=28, nloci_per_chr=(4000,), seed=8)
    write_tped(panel_b, f"{wd}/p.tped.gz", f"{wd}/p.tfam")
    os.utime(f"{wd}/p.tped.gz", (st.st_atime, st.st_mtime))
    from garlic_tpu.io import poolcache
    hits = []
    orig = poolcache.PoolCache.lookup

    def spy(self, w, s):
        r = orig(self, w, s)
        hits.append(r is not None)
        return r

    poolcache.PoolCache.lookup = spy
    try:
        assert run_ours(wd, args + ["--out", "b"]) == 0
    finally:
        poolcache.PoolCache.lookup = orig
    assert hits and not hits[-1], "stale pool cache was NOT rejected"
    # and the panel-b run must equal a fresh no-cache run of panel b
    assert run_ours(wd, ["--tped", "p.tped.gz", "--tfam", "p.tfam",
                         "--build", "hg18", "--winsize", "40",
                         "--error", "0.001", "--kde-subsample", "0",
                         "--size-bounds", "300000", "800000",
                         "--tpu-engine", "fast", "--out", "bref"]) == 0
    assert read_text(f"{wd}/b.roh.bed") == read_text(f"{wd}/bref.roh.bed")
    assert read_text(f"{wd}/b.40SNPs.kde") == read_text(f"{wd}/bref.40SNPs.kde")
