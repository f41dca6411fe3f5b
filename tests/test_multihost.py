"""Multi-host runtime tests: a real 2-process jax.distributed cluster on
CPU (4 virtual devices per process, gloo collectives over the local
coordinator) running the full CLI — the pod-slice story SURVEY.md §2 names
as the multi-process replacement, exercised end-to-end."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """\
import sys
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from garlic_tpu.pipeline import run_main
sys.exit(run_main(sys.argv[1:]))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_cluster(wd: str, args, nproc: int, timeout=600, extra_env=None,
                 cwds=None):
    """Launch the same garlic-tpu command as an nproc-process cluster.
    cwds: optional per-process working directories (defaults to wd for
    all — per-host-disk scenarios pass one per process)."""
    port = _free_port()
    driver = os.path.join(wd, "driver.py")
    with open(driver, "w") as f:
        f.write(DRIVER.format(repo=REPO))
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update({
            "GARLIC_TPU_COORD": f"localhost:{port}",
            "GARLIC_TPU_NUM_PROCS": str(nproc),
            "GARLIC_TPU_PROC_ID": str(pid),
        })
        if extra_env:
            env.update(extra_env)
        procs.append(subprocess.Popen(
            [sys.executable, driver] + args,
            cwd=wd if cwds is None else cwds[pid], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=timeout) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"proc exited {p.returncode}:\n{se[-2000:]}"
    return outs


def _run_pair(wd: str, args, timeout=600, extra_env=None, cwds=None):
    return _run_cluster(wd, args, 2, timeout=timeout, extra_env=extra_env,
                        cwds=cwds)


def _run_single_subproc(wd: str, args, extra_env=None, timeout=600):
    """The same driver as a plain single process (subprocess, so
    GT_LOAD_STATS and friends are isolated from the pytest process)."""
    driver = os.path.join(wd, "driver.py")
    with open(driver, "w") as f:
        f.write(DRIVER.format(repo=REPO))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    for k in ("GARLIC_TPU_COORD", "GARLIC_TPU_NUM_PROCS",
              "GARLIC_TPU_PROC_ID"):
        env.pop(k, None)
    if extra_env:
        env.update(extra_env)
    p = subprocess.run([sys.executable, driver] + args, cwd=wd, env=env,
                       capture_output=True, text=True, timeout=timeout)
    assert p.returncode == 0, f"single proc exited {p.returncode}:\n" \
                              f"{p.stderr[-2000:]}"
    return p.stdout, p.stderr


def _load_stats(stderr: str):
    """Parse the GT_LOAD_STATS line -> (rows, geno_bytes, maxrss_kb)."""
    import re
    m = re.search(r"load-stats: rows=(\d+) geno_bytes=(\d+) "
                  r"maxrss_kb=(\d+)", stderr)
    assert m, f"no load-stats line in:\n{stderr[-1500:]}"
    return int(m.group(1)), int(m.group(2)), int(m.group(3))


@pytest.mark.slow
def test_two_process_bed_identical(tmp_path):
    """Two cooperating processes (4 devices each) over a 2x4 mesh must
    produce BED output identical to a plain single-process run, with each
    process feeding only its own dp-row block of individuals."""
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, run_ours, write_tped

    panel = make_panel(nind=24, nloci_per_chr=(3000, 2000), seed=61)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    wd = str(tmp_path)
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--build", "hg18",
            "--winsize", "40", "--error", "0.001", "--kde-subsample", "0",
            "--size-bounds", "300000", "800000", "--tpu-engine", "fast"]

    # single-process reference (in this pytest process, 8-device mesh env)
    assert run_ours(wd, base + ["--out", "single"]) == 0

    _run_pair(wd, base + ["--tpu-mesh", "2x4", "--out", "multi"])
    single = open(os.path.join(wd, "single.roh.bed")).read()
    multi0 = open(os.path.join(wd, "multi.roh.bed")).read()
    assert multi0 == single
    # the secondary process writes isolated artifacts; same calls
    multi1 = open(os.path.join(wd, "multi.proc1.roh.bed")).read()
    assert multi1 == single


@pytest.mark.slow
def test_two_process_weighted(tmp_path):
    """--weighted across two processes: the psum'd LD band (pair counts
    over the dp axis) and the halo'd wLOD scan must reproduce the
    single-process BED when individuals are split between hosts."""
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, run_ours, write_map_scaffold, write_tped

    panel = make_panel(nind=24, nloci_per_chr=(3000,), seed=71)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    write_map_scaffold(panel, str(tmp_path / "p.map.gz"))
    wd = str(tmp_path)
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--build", "hg18",
            "--map", "p.map.gz", "--weighted", "--winsize", "30",
            "--error", "0.001", "--lod-cutoff", "1.0", "--kde-subsample", "0",
            "--size-bounds", "300000", "800000", "--tpu-engine", "fast"]

    assert run_ours(wd, base + ["--out", "single"]) == 0
    _run_pair(wd, base + ["--tpu-mesh", "2x4", "--out", "multi"])
    single = open(os.path.join(wd, "single.roh.bed")).read()
    multi0 = open(os.path.join(wd, "multi.roh.bed")).read()
    assert multi0 == single


@pytest.mark.slow
def test_two_process_auto_cutoff_and_bounds(tmp_path):
    """The psum'd KDE + GMM collectives across two processes: auto cutoff
    and auto size bounds agree with the single-process run."""
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, run_ours, write_tped

    panel = make_panel(nind=40, nloci_per_chr=(8000, 6000), seed=67)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    wd = str(tmp_path)
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--build", "hg18",
            "--winsize", "50", "--error", "0.001", "--kde-subsample", "0",
            "--tpu-engine", "fast"]

    assert run_ours(wd, base + ["--out", "single"]) == 0
    _run_pair(wd, base + ["--tpu-mesh", "2x4", "--out", "multi"])
    single = open(os.path.join(wd, "single.roh.bed")).read()
    multi0 = open(os.path.join(wd, "multi.roh.bed")).read()
    assert multi0 == single


@pytest.mark.slow
def test_two_process_tgls(tmp_path):
    """TGLS across two processes WITH per-host column-range input
    (round 4): each host stores only its own genotype rows AND its own
    likelihood rows (the reader slices the parsed/mmapped matrices);
    the sharded GL Phase I reproduces the single-process BED."""
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, run_ours, write_tgls, write_tped

    panel = make_panel(nind=24, nloci_per_chr=(3000, 2000), seed=83)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    write_tgls(panel, str(tmp_path / "p.tgls.gz"), "GQ")
    wd = str(tmp_path)
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--tgls",
            "p.tgls.gz", "--gl-type", "GQ", "--build", "hg18",
            "--winsize", "40", "--error", "0.001", "--kde-subsample", "0",
            "--lod-cutoff", "1.0", "--size-bounds", "300000", "800000",
            "--tpu-engine", "fast"]

    assert run_ours(wd, base + ["--out", "single"]) == 0
    outs = _run_pair(wd, base + ["--tpu-mesh", "2x4", "--out", "multi"])
    assert "sharded input: process 0" in outs[0][1]  # TGLS shards too
    single = open(os.path.join(wd, "single.roh.bed")).read()
    multi0 = open(os.path.join(wd, "multi.roh.bed")).read()
    assert multi0 == single


@pytest.mark.slow
def test_two_process_sharded_input(tmp_path):
    """Per-host column-range loading (VERDICT r3 item 2): each process
    parses and holds ONLY its own dp-row block of individuals (half the
    genotype bytes of the single-process run), global allele freqs come
    from the production count psum (allele_freq_counts_sharded), and the
    BED and .freq.gz artifacts stay byte-identical to the single-process
    run."""
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, read_text, write_tped

    panel = make_panel(nind=24, nloci_per_chr=(3000, 2000), seed=61,
                       missing_rate=0.05)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    wd = str(tmp_path)
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--build", "hg18",
            "--winsize", "40", "--error", "0.001", "--kde-subsample", "0",
            "--size-bounds", "300000", "800000", "--tpu-engine", "fast"]

    _, se_single = _run_single_subproc(
        wd, base + ["--out", "single"], extra_env={"GT_LOAD_STATS": "1"})
    rows_s, bytes_s, _ = _load_stats(se_single)
    assert rows_s == 24

    outs = _run_pair(wd, base + ["--tpu-mesh", "4x2", "--out", "multi"],
                     extra_env={"GT_LOAD_STATS": "1"})
    for pid, (_, se) in enumerate(outs):
        assert f"sharded input: process {pid} holds individuals" in se
        rows_m, bytes_m, _ = _load_stats(se)
        assert rows_m == 12                       # genuinely local rows
        assert bytes_m <= bytes_s // 2 + 1024     # host RAM halves

    single = read_text(os.path.join(wd, "single.roh.bed"))
    assert read_text(os.path.join(wd, "multi.roh.bed")) == single
    assert read_text(os.path.join(wd, "multi.proc1.roh.bed")) == single
    fs = read_text(os.path.join(wd, "single.freq.gz"))
    assert read_text(os.path.join(wd, "multi.freq.gz")) == fs


@pytest.mark.slow
def test_two_process_sharded_panel_cache(tmp_path):
    """Sharded input from a warm .gtpc sidecar: the cached packed
    genotypes are row-sliced per host (zero-copy) and the sidecar's
    stored full-panel freq is used directly (no psum needed); BED stays
    identical."""
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, read_text, write_tped

    panel = make_panel(nind=24, nloci_per_chr=(3000,), seed=91)
    write_tped(panel, str(tmp_path / "p.tped"), str(tmp_path / "p.tfam"))
    wd = str(tmp_path)
    base = ["--tped", "p.tped", "--tfam", "p.tfam", "--build", "hg18",
            "--winsize", "40", "--error", "0.001", "--kde-subsample", "0",
            "--lod-cutoff", "1.5", "--size-bounds", "300000", "800000",
            "--tpu-engine", "fast", "--tpu-panel-cache"]

    # prime the sidecar with the single-process run
    _run_single_subproc(wd, base + ["--out", "single"])
    assert os.path.exists(os.path.join(wd, "p.tped.gtpc"))

    outs = _run_pair(wd, base + ["--tpu-mesh", "4x2", "--out", "multi"],
                     extra_env={"GT_LOAD_STATS": "1"})
    for pid, (_, se) in enumerate(outs):
        assert "Loaded panel cache" in se
        rows_m, _, _ = _load_stats(se)
        assert rows_m == 12
    single = read_text(os.path.join(wd, "single.roh.bed"))
    assert read_text(os.path.join(wd, "multi.roh.bed")) == single


@pytest.mark.slow
def test_two_process_rng_sync_no_seed(tmp_path):
    """VERDICT r3 item 3: WITHOUT --tpu-seed, the broadcast-derived run
    seed makes --kde-subsample and --ld-subsample draws identical across
    cooperating processes — both processes produce the same BED (each
    process re-derives every subsample locally; a divergent rng would
    silently mix different subsets into the psum'd stages)."""
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, read_text, write_map_scaffold, write_tped

    panel = make_panel(nind=24, nloci_per_chr=(4000,), seed=73)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    write_map_scaffold(panel, str(tmp_path / "p.map.gz"))
    wd = str(tmp_path)
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--build", "hg18",
            "--map", "p.map.gz", "--weighted", "--winsize", "30",
            "--error", "0.001", "--kde-subsample", "10",
            "--ld-subsample", "8", "--size-bounds", "300000", "800000",
            "--tpu-engine", "fast"]

    _run_pair(wd, base + ["--tpu-mesh", "2x4", "--out", "multi"])
    multi0 = read_text(os.path.join(wd, "multi.roh.bed"))
    multi1 = read_text(os.path.join(wd, "multi.proc1.roh.bed"))
    assert multi0 == multi1
    # the chosen KDE subsample individuals must also match in the logs
    log0 = read_text(os.path.join(wd, "multi.log"))
    log1 = read_text(os.path.join(wd, "multi.proc1.log"))
    pick = [l for l in log0.splitlines() if "Individuals used for KDE" in l]
    assert pick and pick == [l for l in log1.splitlines()
                             if "Individuals used for KDE" in l]


@pytest.mark.slow
def test_two_process_fast_equals_exact(tmp_path):
    """Multi-process tie patrol (round 4): a 2-process fast-engine run
    with per-host sharded input must equal the single-process EXACT
    engine's BED byte-for-byte — each host f64-verifies the suspect rows
    it owns and the flips merge with an allgather, so 'fast == exact by
    construction' now holds on every engine configuration."""
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, read_text, run_ours_subprocess, write_tped

    panel = make_panel(nind=24, nloci_per_chr=(4000, 2500), seed=57,
                       missing_rate=0.05)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    wd = str(tmp_path)
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--build", "hg18",
            "--winsize", "40", "--error", "0.001", "--kde-subsample", "0",
            "--lod-cutoff", "0.7321", "--size-bounds", "300000", "800000"]

    assert run_ours_subprocess(wd, base + ["--tpu-engine", "exact",
                                           "--out", "ex"]) == 0
    _run_pair(wd, base + ["--tpu-engine", "fast", "--tpu-mesh", "4x2",
                          "--out", "multi"])
    ex = read_text(os.path.join(wd, "ex.roh.bed"))
    assert read_text(os.path.join(wd, "multi.roh.bed")) == ex
    assert read_text(os.path.join(wd, "multi.proc1.roh.bed")) == ex


@pytest.mark.slow
def test_two_process_sharded_exact_kde_grid(tmp_path):
    """Round 4: the oracle-exact Phase-II sampler works across processes
    — per-host column-range runs pool each host's exact f64 thinned
    samples and allgather per chromosome in rank order (== the global
    row order), so the multi-process .kde x grid is byte-identical to
    the single-process run's (and hence to the oracle's)."""
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, read_text, write_tped

    panel = make_panel(nind=24, nloci_per_chr=(6000,), seed=29)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    wd = str(tmp_path)
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--build", "hg18",
            "--winsize", "40", "--error", "0.001", "--kde-subsample", "0",
            "--size-bounds", "300000", "800000", "--tpu-engine", "fast"]

    _run_single_subproc(wd, base + ["--out", "single"])
    outs = _run_pair(wd, base + ["--tpu-mesh", "4x2", "--out", "multi"])
    for pid, (_, se) in enumerate(outs):
        assert f"sharded input: process {pid}" in se
    kde_s = read_text(os.path.join(wd, "single.40SNPs.kde"))
    kde_m = read_text(os.path.join(wd, "multi.40SNPs.kde"))
    xs = [l.split()[0] for l in kde_s.splitlines() if l.strip()]
    xm = [l.split()[0] for l in kde_m.splitlines() if l.strip()]
    assert xs == xm  # y may differ at 1 ulp (psum'd transform ordering)
    assert read_text(os.path.join(wd, "multi.roh.bed")) == \
        read_text(os.path.join(wd, "single.roh.bed"))


@pytest.mark.slow
def test_two_process_mixed_panel_cache(tmp_path):
    """Per-host disks can disagree on sidecar state: host A loads a warm
    .gtpc (global freq, no count planes) while host B cold-parses its
    column range (partial count planes).  The freq-path decision must be
    CLUSTER-WIDE (a per-host gate would strand the hosts in different
    collectives and hang): the tiny flag allgather routes both to the
    cached rank's global planes, and outputs stay byte-identical."""
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, read_text, write_tped

    panel = make_panel(nind=24, nloci_per_chr=(3000,), seed=47,
                       missing_rate=0.05)
    wds = []
    for pid in range(2):
        wd = tmp_path / f"host{pid}"
        wd.mkdir()
        write_tped(panel, str(wd / "p.tped"), str(wd / "p.tfam"))
        wds.append(str(wd))
    base = ["--tped", "p.tped", "--tfam", "p.tfam", "--build", "hg18",
            "--winsize", "40", "--error", "0.001", "--kde-subsample", "0",
            "--lod-cutoff", "1.5", "--size-bounds", "300000", "800000",
            "--tpu-engine", "fast", "--tpu-panel-cache"]

    # prime the sidecar on host 0 ONLY (plus the reference BED)
    _run_single_subproc(wds[0], base + ["--out", "single"])
    assert os.path.exists(os.path.join(wds[0], "p.tped.gtpc"))
    assert not os.path.exists(os.path.join(wds[1], "p.tped.gtpc"))

    outs = _run_pair(str(tmp_path), base + ["--tpu-mesh", "4x2",
                                            "--out", "multi"],
                     cwds=wds)
    assert "Loaded panel cache" in outs[0][1]
    assert "Loaded panel cache" not in outs[1][1]
    single = read_text(os.path.join(wds[0], "single.roh.bed"))
    assert read_text(os.path.join(wds[0], "multi.roh.bed")) == single
    assert read_text(os.path.join(wds[1], "multi.proc1.roh.bed")) == single


@pytest.mark.slow
def test_two_process_tiny_panel_no_shard(tmp_path):
    """Degenerate column splits must NOT engage sharded input: with
    nind <= I2/nproc process 0's range would cover the whole panel and
    the parser would demote only it to single-process semantics while
    rank 1 kept sharded state — asymmetric collectives (hang).  The
    guard falls back to replicated loading; the run must still complete
    with identical BEDs."""
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, read_text, write_tped

    panel = make_panel(nind=2, nloci_per_chr=(2000,), seed=17)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    wd = str(tmp_path)
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--build", "hg18",
            "--winsize", "30", "--error", "0.001", "--kde-subsample", "0",
            "--lod-cutoff", "1.0", "--size-bounds", "300000", "800000",
            "--tpu-engine", "fast"]

    _run_single_subproc(wd, base + ["--out", "single"])
    outs = _run_pair(wd, base + ["--tpu-mesh", "4x2", "--out", "multi"],
                     timeout=240)
    for _, se in outs:
        assert "sharded input" not in se  # guard refused the degenerate split
    single = read_text(os.path.join(wd, "single.roh.bed"))
    assert read_text(os.path.join(wd, "multi.roh.bed")) == single


@pytest.mark.slow
def test_three_process_sharded_exact_kde(tmp_path):
    """Three cooperating processes (asymmetric tail shard: 25 individuals
    over per=9/9/7 blocks): rank-ordering bugs in the sharded collectives
    (freq count psum, owned-row patrol gathers, the per-chromosome exact
    sample allgather) hide at p=2 — p=3 exercises unequal shard sizes and
    a genuinely multi-rank reassembly.  BED and the .kde x grid must
    match the single-process run."""
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, read_text, write_tped

    panel = make_panel(nind=25, nloci_per_chr=(6000,), seed=37,
                       missing_rate=0.05)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    wd = str(tmp_path)
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--build", "hg18",
            "--winsize", "40", "--error", "0.001", "--kde-subsample", "0",
            "--size-bounds", "300000", "800000", "--tpu-engine", "fast"]

    _run_single_subproc(wd, base + ["--out", "single"])
    outs = _run_cluster(wd, base + ["--tpu-mesh", "3x4", "--out", "multi"],
                        nproc=3)
    for pid, (_, se) in enumerate(outs):
        assert f"sharded input: process {pid}" in se
    single = read_text(os.path.join(wd, "single.roh.bed"))
    assert read_text(os.path.join(wd, "multi.roh.bed")) == single
    assert read_text(os.path.join(wd, "multi.proc2.roh.bed")) == single
    xs = [l.split()[0] for l in
          read_text(os.path.join(wd, "single.40SNPs.kde")).splitlines() if l]
    xm = [l.split()[0] for l in
          read_text(os.path.join(wd, "multi.40SNPs.kde")).splitlines() if l]
    assert xs == xm


@pytest.mark.slow
def test_two_process_bitmap_coverage_tie_repair(tmp_path):
    """GARLIC_TPU_COVERED=bitmap forces the coverage-bitmap transfer,
    which carries NO suspect-window detail — every tie-flagged row takes
    the full exact_cover recomputation.  On sharded-input runs that is
    the owned-row packed gather (each host recomputes only the suspect
    rows it holds); the merged repairs must still reproduce the exact
    engine's BED."""
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, read_text, run_ours_subprocess, write_tped

    panel = make_panel(nind=24, nloci_per_chr=(4000,), seed=53,
                       missing_rate=0.05)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    wd = str(tmp_path)
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--build", "hg18",
            "--winsize", "40", "--error", "0.001", "--kde-subsample", "0",
            "--lod-cutoff", "0.6843", "--size-bounds", "300000", "800000"]

    assert run_ours_subprocess(wd, base + ["--tpu-engine", "exact",
                                           "--out", "ex"]) == 0
    _run_pair(wd, base + ["--tpu-engine", "fast", "--tpu-mesh", "4x2",
                          "--out", "multi"],
              extra_env={"GARLIC_TPU_COVERED": "bitmap"})
    ex = read_text(os.path.join(wd, "ex.roh.bed"))
    assert read_text(os.path.join(wd, "multi.roh.bed")) == ex
    assert read_text(os.path.join(wd, "multi.proc1.roh.bed")) == ex


@pytest.mark.slow
def test_two_process_sharded_weighted(tmp_path):
    """Per-host column-range input on WEIGHTED runs (round 5, VERDICT r4
    item 5): the LD band's pair counts psum over the distributed rows,
    the tie patrol verifies owned rows against the exact band assembled
    from psum'd integer count planes, and the weighted auto-KDE cutoff
    pools the exact f64 samples in rank order — BED and .kde
    byte-identical to the single-process run, per-host genotype bytes
    halved."""
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, read_text, write_map_scaffold, write_tped

    panel = make_panel(nind=24, nloci_per_chr=(3000, 2000), seed=71)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    write_map_scaffold(panel, str(tmp_path / "p.map.gz"))
    wd = str(tmp_path)
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--build", "hg18",
            "--map", "p.map.gz", "--weighted", "--ld-subsample", "0",
            "--winsize", "30", "--error", "0.002", "--kde-subsample", "0",
            "--size-bounds", "300000", "800000", "--tpu-engine", "fast"]

    _, se_single = _run_single_subproc(
        wd, base + ["--out", "single"], extra_env={"GT_LOAD_STATS": "1"})
    rows_s, bytes_s, _ = _load_stats(se_single)
    assert rows_s == 24

    outs = _run_pair(wd, base + ["--tpu-mesh", "4x2", "--out", "multi"],
                     extra_env={"GT_LOAD_STATS": "1"})
    for pid, (_, se) in enumerate(outs):
        assert f"sharded input: process {pid} holds individuals" in se
        rows_m, bytes_m, _ = _load_stats(se)
        assert rows_m == 12                       # genuinely local rows
        assert bytes_m <= bytes_s // 2 + 1024     # host RAM halves

    single = read_text(os.path.join(wd, "single.roh.bed"))
    assert read_text(os.path.join(wd, "multi.roh.bed")) == single
    assert read_text(os.path.join(wd, "multi.proc1.roh.bed")) == single
    # the exact weighted Phase-II sampler pools in rank order: the .kde
    # x grid is byte-identical and the same cutoff is selected (y runs
    # through the mesh's psum'd transform vs the single device's blocked
    # one — last-ulp partial-order differences, the documented transform
    # class; BED equality above already proves the selection agrees)
    ks = read_text(os.path.join(wd, "single.30SNPs.kde"))
    km = read_text(os.path.join(wd, "multi.30SNPs.kde"))
    xs = [ln.split()[0] for ln in ks.splitlines() if ln.strip()]
    xm = [ln.split()[0] for ln in km.splitlines() if ln.strip()]
    assert xs == xm
    cut = [ln for ln in read_text(os.path.join(wd, "single.log")).splitlines()
           if "Selected LOD score cutoff" in ln]
    cutm = [ln for ln in read_text(os.path.join(wd, "multi.log")).splitlines()
            if "Selected LOD score cutoff" in ln]
    assert cut == cutm and cut


@pytest.mark.slow
def test_two_process_sharded_weighted_subsample(tmp_path):
    """Weighted sharded input with a real --ld-subsample: the global
    subsample indices reduce to owned-row masks in the mesh pair stage
    and to owned-row intersection in the exact band — BED identical to
    the single-process run drawing the same seed."""
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, read_text, write_map_scaffold, write_tped

    panel = make_panel(nind=24, nloci_per_chr=(2500,), seed=73)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    write_map_scaffold(panel, str(tmp_path / "p.map.gz"))
    wd = str(tmp_path)
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--build", "hg18",
            "--map", "p.map.gz", "--weighted", "--ld-subsample", "10",
            "--tpu-seed", "7",
            "--winsize", "30", "--error", "0.002", "--kde-subsample", "0",
            "--lod-cutoff", "40", "--size-bounds", "300000", "800000",
            "--tpu-engine", "fast"]
    _run_single_subproc(wd, base + ["--out", "single"])
    _run_pair(wd, base + ["--tpu-mesh", "4x2", "--out", "multi"])
    single = read_text(os.path.join(wd, "single.roh.bed"))
    assert read_text(os.path.join(wd, "multi.roh.bed")) == single
    assert read_text(os.path.join(wd, "multi.proc1.roh.bed")) == single


@pytest.mark.slow
def test_two_process_sharded_auto_winsize(tmp_path):
    """Per-host column-range input on --auto-winsize runs (round 5,
    VERDICT r4 item 7): the search's Phase I keeps the full distributed
    panel (the KDE row subset applies in the sampler, whose global
    indices intersect owned rows), so the selected winsize, the .kde x
    grid, and the BED must be byte-identical to the single-process run
    while per-host genotype bytes halve."""
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, read_text, write_tped

    panel = make_panel(nind=24, nloci_per_chr=(4000,), seed=77)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    wd = str(tmp_path)
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--build", "hg18",
            "--auto-winsize", "--winsize", "30", "--auto-winsize-step", "10",
            "--error", "0.001", "--kde-subsample", "8", "--tpu-seed", "11",
            "--size-bounds", "300000", "800000", "--tpu-engine", "fast"]

    # (the driver pins 4 virtual devices; the mesh SHAPE doesn't affect
    # values — single runs 4x1, the cluster runs 8x1 over 2x4 devices)
    _, se_single = _run_single_subproc(
        wd, base + ["--tpu-mesh", "4x1", "--out", "single"],
        extra_env={"GT_LOAD_STATS": "1"})
    rows_s, bytes_s, _ = _load_stats(se_single)
    assert rows_s == 24

    outs = _run_pair(wd, base + ["--tpu-mesh", "8x1", "--out", "multi"],
                     extra_env={"GT_LOAD_STATS": "1"})
    for pid, (_, se) in enumerate(outs):
        assert f"sharded input: process {pid} holds individuals" in se
        rows_m, bytes_m, _ = _load_stats(se)
        assert rows_m == 12
        assert bytes_m <= bytes_s // 2 + 1024

    ls = read_text(os.path.join(wd, "single.log"))
    lm = read_text(os.path.join(wd, "multi.log"))
    sel = [ln for ln in ls.splitlines() if ln.startswith("Selected window")]
    selm = [ln for ln in lm.splitlines() if ln.startswith("Selected window")]
    assert sel == selm and sel
    single = read_text(os.path.join(wd, "single.roh.bed"))
    assert read_text(os.path.join(wd, "multi.roh.bed")) == single
    assert read_text(os.path.join(wd, "multi.proc1.roh.bed")) == single


@pytest.mark.slow
def test_three_process_sharded_weighted(tmp_path):
    """Three-process WEIGHTED column-range input with an asymmetric tail
    shard (25 individuals over 9/9/7 blocks): the psum'd pair-count
    planes, the owned-row tie patrol, and the rank-ordered exact wLOD
    sample allgather must all survive unequal shard sizes.  BED and the
    .kde x grid match the single-process run."""
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, read_text, write_map_scaffold, write_tped

    panel = make_panel(nind=25, nloci_per_chr=(4000,), seed=41)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    write_map_scaffold(panel, str(tmp_path / "p.map.gz"))
    wd = str(tmp_path)
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--build", "hg18",
            "--map", "p.map.gz", "--weighted", "--ld-subsample", "0",
            "--winsize", "30", "--error", "0.002", "--kde-subsample", "0",
            "--size-bounds", "300000", "800000", "--tpu-engine", "fast"]

    _run_single_subproc(wd, base + ["--out", "single"])
    outs = _run_cluster(wd, base + ["--tpu-mesh", "3x4", "--out", "multi"],
                        nproc=3)
    for pid, (_, se) in enumerate(outs):
        assert f"sharded input: process {pid}" in se
    single = read_text(os.path.join(wd, "single.roh.bed"))
    assert read_text(os.path.join(wd, "multi.roh.bed")) == single
    assert read_text(os.path.join(wd, "multi.proc2.roh.bed")) == single
    xs = [l.split()[0] for l in
          read_text(os.path.join(wd, "single.30SNPs.kde")).splitlines() if l]
    xm = [l.split()[0] for l in
          read_text(os.path.join(wd, "multi.30SNPs.kde")).splitlines() if l]
    assert xs == xm


@pytest.mark.slow
def test_two_process_sharded_weighted_phased(tmp_path):
    """--weighted --phased with per-host column-range input: the r2 LD
    path's x11/valid count planes psum over distributed rows (first-copy
    bits parsed per column slice) — BED identical to single-process."""
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, read_text, write_map_scaffold, write_tped

    panel = make_panel(nind=24, nloci_per_chr=(2500,), seed=79)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    write_map_scaffold(panel, str(tmp_path / "p.map.gz"))
    wd = str(tmp_path)
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--build", "hg18",
            "--map", "p.map.gz", "--weighted", "--phased",
            "--ld-subsample", "0",
            "--winsize", "30", "--error", "0.002", "--kde-subsample", "0",
            "--size-bounds", "300000", "800000", "--tpu-engine", "fast"]
    _, se = _run_single_subproc(wd, base + ["--out", "single"],
                                extra_env={"GT_LOAD_STATS": "1"})
    outs = _run_pair(wd, base + ["--tpu-mesh", "4x2", "--out", "multi"],
                     extra_env={"GT_LOAD_STATS": "1"})
    for pid, (_, se2) in enumerate(outs):
        assert f"sharded input: process {pid} holds individuals" in se2
        rows_m, _, _ = _load_stats(se2)
        assert rows_m == 12
    single = read_text(os.path.join(wd, "single.roh.bed"))
    assert read_text(os.path.join(wd, "multi.roh.bed")) == single
    assert read_text(os.path.join(wd, "multi.proc1.roh.bed")) == single


@pytest.mark.slow
def test_two_process_sharded_weighted_phased_subsample(tmp_path):
    """Phased weighted sharding WITH --ld-subsample: the global subsample
    indices must become an owned-row genotype mask (never index the
    local first-copy block directly)."""
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, read_text, write_map_scaffold, write_tped

    panel = make_panel(nind=24, nloci_per_chr=(2500,), seed=87)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    write_map_scaffold(panel, str(tmp_path / "p.map.gz"))
    wd = str(tmp_path)
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--build", "hg18",
            "--map", "p.map.gz", "--weighted", "--phased",
            "--ld-subsample", "10", "--tpu-seed", "3",
            "--winsize", "30", "--error", "0.002", "--kde-subsample", "0",
            "--lod-cutoff", "40", "--size-bounds", "300000", "800000",
            "--tpu-engine", "fast"]
    _run_single_subproc(wd, base + ["--out", "single"])
    _run_pair(wd, base + ["--tpu-mesh", "4x2", "--out", "multi"])
    single = read_text(os.path.join(wd, "single.roh.bed"))
    assert read_text(os.path.join(wd, "multi.roh.bed")) == single


@pytest.mark.slow
def test_two_process_sharded_cm(tmp_path):
    """--cm (genetic-length ROH) with per-host column-range input: the
    scaffold OOB filter and genetic-map interpolation are per-locus, so
    sharded rows compose — BED identical to single-process."""
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, read_text, write_map_scaffold, write_tped

    panel = make_panel(nind=24, nloci_per_chr=(3000,), seed=93)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    write_map_scaffold(panel, str(tmp_path / "p.map.gz"))
    wd = str(tmp_path)
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--build", "hg18",
            "--map", "p.map.gz", "--cm",
            "--winsize", "40", "--error", "0.001", "--kde-subsample", "0",
            "--lod-cutoff", "1.2", "--size-bounds", "0.3", "0.8",
            "--tpu-engine", "fast"]
    _run_single_subproc(wd, base + ["--out", "single"])
    outs = _run_pair(wd, base + ["--tpu-mesh", "4x2", "--out", "multi"])
    for pid, (_, se) in enumerate(outs):
        assert f"sharded input: process {pid} holds individuals" in se
    single = read_text(os.path.join(wd, "single.roh.bed"))
    assert read_text(os.path.join(wd, "multi.roh.bed")) == single


@pytest.mark.slow
def test_two_process_sharded_weighted_explore(tmp_path):
    """--winsize-multi exploration on WEIGHTED sharded input (the last
    combination to join column-range loading): per-candidate Phase I
    keeps the full distributed panel, the KDE subset applies at the
    exact sharded sampler — every dumped .kde x column matches the
    single-process run byte-for-byte."""
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_panel, read_text, write_map_scaffold, write_tped

    panel = make_panel(nind=24, nloci_per_chr=(2500,), seed=97)
    write_tped(panel, str(tmp_path / "p.tped.gz"), str(tmp_path / "p.tfam"))
    write_map_scaffold(panel, str(tmp_path / "p.map.gz"))
    wd = str(tmp_path)
    base = ["--tped", "p.tped.gz", "--tfam", "p.tfam", "--build", "hg18",
            "--map", "p.map.gz", "--weighted", "--ld-subsample", "0",
            "--winsize-multi", "25", "35", "--winsize", "25",
            "--error", "0.002", "--kde-subsample", "8", "--tpu-seed", "5",
            "--tpu-engine", "fast"]
    _run_single_subproc(wd, base + ["--tpu-mesh", "4x1", "--out", "single"])
    outs = _run_pair(wd, base + ["--tpu-mesh", "8x1", "--out", "multi"])
    for pid, (_, se) in enumerate(outs):
        assert f"sharded input: process {pid} holds individuals" in se
    for w in (25, 35):
        ks = read_text(os.path.join(wd, f"single.{w}SNPs.kde"))
        km = read_text(os.path.join(wd, f"multi.{w}SNPs.kde"))
        xs = [ln.split()[0] for ln in ks.splitlines() if ln.strip()]
        xm = [ln.split()[0] for ln in km.splitlines() if ln.strip()]
        assert xs == xm, f"winsize {w} .kde x column differs"
