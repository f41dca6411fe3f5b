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


def _run_pair(wd: str, args, timeout=600):
    """Launch the same garlic-tpu command as a 2-process cluster."""
    port = _free_port()
    driver = os.path.join(wd, "driver.py")
    with open(driver, "w") as f:
        f.write(DRIVER.format(repo=REPO))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update({
            "GARLIC_TPU_COORD": f"localhost:{port}",
            "GARLIC_TPU_NUM_PROCS": "2",
            "GARLIC_TPU_PROC_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, driver] + args, cwd=wd, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=timeout) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"proc exited {p.returncode}:\n{se[-2000:]}"
    return outs


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
    """TGLS across two processes: each host reads the full TGLS file but
    feeds only its own dp-row block; the sharded GL Phase I reproduces
    the single-process BED (the native dictionary reader feeds both)."""
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
    _run_pair(wd, base + ["--tpu-mesh", "2x4", "--out", "multi"])
    single = open(os.path.join(wd, "single.roh.bed")).read()
    multi0 = open(os.path.join(wd, "multi.roh.bed")).read()
    assert multi0 == single
