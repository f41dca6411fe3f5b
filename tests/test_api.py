"""Programmatic API facade tests."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))


def _write_panel(tmp_path, **kw):
    from util import make_panel, write_tped
    panel = make_panel(**kw)
    tped = str(tmp_path / "p.tped.gz")
    tfam = str(tmp_path / "p.tfam")
    write_tped(panel, tped, tfam)
    return tped, tfam


def test_api_matches_cli(tmp_path):
    from util import run_ours
    from garlic_tpu import api

    tped, tfam = _write_panel(tmp_path, nind=25, nloci_per_chr=(4000, 3000),
                              seed=5)
    ds = api.load_panel(tped, tfam, build="hg18")
    res = api.call_roh(ds, winsize=40, error=0.001, cutoff=1.2,
                       bounds=[300000.0, 800000.0], overlap_frac=0.25)
    assert res.cutoff == 1.2
    rows = res.to_rows()
    assert rows, "no ROH called"

    # CLI with identical knobs -> identical calls
    wd = str(tmp_path)
    rc = run_ours(wd, ["--tped", "p.tped.gz", "--tfam", "p.tfam",
                       "--build", "hg18", "--winsize", "40", "--error",
                       "0.001", "--lod-cutoff", "1.2", "--size-bounds",
                       "300000", "800000", "--overlap-frac", "0.25",
                       "--kde-subsample", "0", "--out", "cli"])
    assert rc == 0
    bed = open(os.path.join(wd, "cli.roh.bed")).read()
    bed_rows = [l.split() for l in bed.splitlines()
                if not l.startswith("track")]
    assert len(bed_rows) == len(rows)
    for (ind, chrom, start, stop, size, cls), br in zip(rows, bed_rows):
        assert br[0] == chrom
        assert int(br[1]) == start
        # the reference writes the inclusive stop position verbatim
        # (src/garlic-roh.cpp:619-626), despite BED being half-open
        assert int(br[2]) == stop
        assert br[3] == cls


def test_api_auto_cutoff_and_bounds(tmp_path):
    from garlic_tpu import api

    tped, tfam = _write_panel(tmp_path, nind=40, nloci_per_chr=(8000, 6000),
                              seed=1)
    ds = api.load_panel(tped, tfam, build="hg18")
    res = api.call_roh(ds, winsize=60, error=0.001)
    assert res.kde is not None and res.kde.size == 512
    assert np.isfinite(res.cutoff)
    assert len(res.bounds) == 2
    assert res.bounds[0] < res.bounds[1]


def test_tpu_profile_smoke(tmp_path, capfd):
    """--tpu-profile prints a per-phase breakdown to stderr
    (PhaseProfiler, garlic_tpu/runtime.py) without perturbing outputs."""
    from util import run_ours

    tped, tfam = _write_panel(tmp_path, nind=10, nloci_per_chr=(1200,),
                              seed=9)
    args = ["--tped", tped, "--tfam", tfam, "--out", str(tmp_path / "p"),
            "--build", "hg18", "--winsize", "40", "--error", "0.001",
            "--lod-cutoff", "1.2", "--size-bounds", "300000", "800000",
            "--kde-subsample", "0", "--tpu-profile"]
    rc = run_ours(str(tmp_path), args)
    assert rc == 0
    err = capfd.readouterr().err
    assert "[profile] phase breakdown:" in err
    for phase in ("load", "phase1-lod", "phase3-assembly", "write-bed",
                  "TOTAL"):
        assert f"[profile]   {phase}" in err, f"missing phase {phase}"
    assert os.path.exists(str(tmp_path / "p.roh.bed"))
