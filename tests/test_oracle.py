"""End-to-end integration tests: byte-diff our outputs against the reference
binary on synthesized panels (SURVEY.md §4 golden-file strategy).

Randomized stages are pinned: --kde-subsample 0 (use every individual; the
reference's subsampling RNG is time-seeded and unreplayable)."""

from __future__ import annotations

import os

import pytest

from .util import (assert_bed_same_or_oracle_random, diff_logs, make_panel,
                   read_text, run_oracle, run_ours, write_tped)

BASE_ARGS = ["--build", "hg18", "--winsize", "60", "--error", "0.001",
             "--kde-subsample", "0"]


def _prepare(tmp_path, **panel_kw):
    panel = make_panel(**panel_kw)
    tped = str(tmp_path / "panel.tped.gz")
    tfam = str(tmp_path / "panel.tfam")
    write_tped(panel, tped, tfam)
    return panel, tped, tfam


def _run_both(oracle_bin, tmp_path, extra_args, panel_kw=None):
    panel, tped, tfam = _prepare(tmp_path, **(panel_kw or {}))
    wd = str(tmp_path)
    args = ["--tped", "panel.tped.gz", "--tfam", "panel.tfam"] + extra_args
    r = run_oracle(oracle_bin, wd, args + ["--out", "oracle"])
    assert r.returncode == 0, r.stderr[-2000:]
    rc = run_ours(wd, args + ["--out", "ours"])
    assert rc == 0
    return wd


def _assert_same(wd, name_a, name_b, suffixes):
    for sfx in suffixes:
        a = read_text(os.path.join(wd, name_a + sfx))
        b = read_text(os.path.join(wd, name_b + sfx))
        assert a == b, f"{sfx} differs (first 300 chars): " \
                       f"{_first_diff(a, b)}"


def _first_diff(a: str, b: str) -> str:
    la, lb = a.splitlines(), b.splitlines()
    for i, (x, y) in enumerate(zip(la, lb)):
        if x != y:
            return f"line {i+1}: oracle={x!r} ours={y!r}"
    return f"line counts {len(la)} vs {len(lb)}"


@pytest.mark.slow
def test_default_lod_pipeline_bed_identical(oracle_bin, tmp_path):
    wd = _run_both(oracle_bin, tmp_path, BASE_ARGS,
                   panel_kw=dict(nind=40, nloci_per_chr=(8000, 6000)))
    _assert_same(wd, "oracle", "ours", [".freq.gz"])
    same_bed = read_text(os.path.join(wd, "oracle.roh.bed")) == \
        read_text(os.path.join(wd, "ours.roh.bed"))
    assert_bed_same_or_oracle_random(
        oracle_bin, wd, ["--tped", "panel.tped.gz", "--tfam", "panel.tfam"]
        + BASE_ARGS, "oracle", "ours", 60)
    if same_bed:  # with equal cutoffs the logs must match byte-for-byte
        diffs = diff_logs(read_text(os.path.join(wd, "oracle.log")),
                          read_text(os.path.join(wd, "ours.log")))
        assert not diffs, diffs[:10]


@pytest.mark.slow
def test_fixed_cutoff_and_bounds(oracle_bin, tmp_path):
    args = ["--build", "hg18", "--winsize", "40", "--error", "0.005",
            "--lod-cutoff", "1.5", "--size-bounds", "400000", "900000",
            "--kde-subsample", "0"]
    wd = _run_both(oracle_bin, tmp_path, args)
    _assert_same(wd, "oracle", "ours", [".roh.bed", ".freq.gz"])


@pytest.mark.slow
def test_gaps_and_overlap_frac(oracle_bin, tmp_path):
    args = ["--build", "hg18", "--winsize", "50", "--error", "0.001",
            "--overlap-frac", "0.5", "--kde-subsample", "0",
            "--lod-cutoff", "1.2", "--size-bounds", "300000", "800000"]
    wd = _run_both(oracle_bin, tmp_path, args,
                   panel_kw=dict(big_gap_every=500, seed=11))
    _assert_same(wd, "oracle", "ours", [".roh.bed", ".freq.gz"])


@pytest.mark.slow
def test_freq_only(oracle_bin, tmp_path):
    panel, tped, tfam = _prepare(tmp_path)
    wd = str(tmp_path)
    args = ["--tped", "panel.tped.gz", "--tfam", "panel.tfam", "--freq-only",
            "--build", "hg18", "--winsize", "60", "--error", "0.001"]
    r = run_oracle(oracle_bin, wd, args + ["--out", "oracle"])
    assert r.returncode == 0, r.stderr[-2000:]
    rc = run_ours(wd, args + ["--out", "ours"])
    assert rc == 0
    _assert_same(wd, "oracle", "ours", [".freq.gz"])


@pytest.mark.slow
def test_weighted_wlod_bed_identical(oracle_bin, tmp_path):
    """--weighted with a genetic-map scaffold: LD + wLOD + assembly
    (pinned cutoff/bounds to bypass KDE sensitivity)."""
    from .util import write_map_scaffold
    panel, tped, tfam = _prepare(tmp_path, nind=25,
                                 nloci_per_chr=(3000, 2500), seed=21)
    write_map_scaffold(panel, str(tmp_path / "scaff.map.gz"))
    wd = str(tmp_path)
    args = ["--tped", "panel.tped.gz", "--tfam", "panel.tfam",
            "--map", "scaff.map.gz", "--weighted",
            "--build", "hg18", "--winsize", "30", "--error", "0.002",
            "--lod-cutoff", "50", "--size-bounds", "300000", "800000",
            "--kde-subsample", "0", "--ld-subsample", "0"]
    r = run_oracle(oracle_bin, wd, args + ["--out", "oracle"])
    assert r.returncode == 0, r.stderr[-2000:]
    rc = run_ours(wd, args + ["--out", "ours"])
    assert rc == 0
    _assert_same(wd, "oracle", "ours", [".roh.bed"])
    diffs = diff_logs(read_text(os.path.join(wd, "oracle.log")),
                      read_text(os.path.join(wd, "ours.log")))
    assert not diffs, diffs[:10]


def _diff_logs_tolerant(a: str, b: str, rtol: float = 2e-2,
                        atol: float = 1e-2, max_waived: int = 8):
    """Log diff that compares `winsize\\tsmoothness` table rows numerically:
    the oracle's KDE runs through FIGTree at eps=1e-2, so wiggle values
    (density-derived) legitimately differ from our exact transform within
    that tolerance; everything else must match byte-for-byte.  atol is the
    FIGTree eps as an absolute floor: near-converged wiggles (~0.1) carry
    eps-scale absolute error, so a pure rtol flakes on them (diagnosed
    from a captured failure: ours 0.14181 vs oracle 0.138152 — 2.6% rel,
    0.0036 abs — with a byte-identical BED).  The waiver is quantified:
    more than `max_waived` within-tolerance rows means the two searches
    diverged structurally and the diff is NOT waived."""
    diffs = diff_logs(a, b)
    out = []
    waived = 0
    for d in diffs:
        parts = d.split("!=")
        try:
            lhs = parts[0].split(":", 1)[1].strip().strip("'").split("\\t")
            rhs = parts[1].strip().strip("'").split("\\t")
            la, lb = float(lhs[0]), float(lhs[1])
            ra, rb = float(rhs[0]), float(rhs[1])
            if la == ra and abs(lb - rb) <= max(
                    rtol * max(abs(lb), abs(rb)), atol):
                waived += 1
                continue
        except (ValueError, IndexError):
            pass
        out.append(d)
    if waived > max_waived:
        out.append(f"waived {waived} smoothness rows > cap {max_waived}")
    return out


def _capture_flake(wd: str, name: str):
    """Copy a failing run's artifacts OUT of the pytest tmpdir before
    cleanup so the known flake (CLAUDE.md) is diagnosable post-mortem.
    Returns the capture directory."""
    import glob
    import shutil
    import time

    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".flake_artifacts",
        f"{name}-{int(time.time())}")
    os.makedirs(dst, exist_ok=True)
    for pat in ("*.log", "*.error", "*.kde", "*.bed"):
        for f in glob.glob(os.path.join(wd, pat)):
            shutil.copy2(f, dst)
    return dst


@pytest.mark.slow
def test_auto_winsize_search(oracle_bin, tmp_path):
    """--auto-winsize grows winsize until the wiggle metric passes; with
    --kde-subsample 0 the search is deterministic (BASELINE config #4)."""
    args = ["--build", "hg18", "--winsize", "20", "--auto-winsize",
            "--auto-winsize-step", "20", "--error", "0.001",
            "--kde-subsample", "0", "--size-bounds", "300000", "800000"]
    wd = _run_both(oracle_bin, tmp_path, args,
                   panel_kw=dict(nind=35, nloci_per_chr=(6000,), seed=29))
    import re
    wlog = read_text(os.path.join(wd, "oracle.log"))
    ws_a = re.search(r"Selected window size: (\d+)", wlog)
    ws_b = re.search(r"Selected window size: (\d+)",
                     read_text(os.path.join(wd, "ours.log")))
    assert ws_a and ws_b and ws_a.group(1) == ws_b.group(1), \
        "winsize selection diverged (wiggle near threshold on a " \
        "randomized-oracle density?)"
    assert_bed_same_or_oracle_random(
        oracle_bin, wd, ["--tped", "panel.tped.gz", "--tfam", "panel.tfam"]
        + args, "oracle", "ours", int(ws_b.group(1)))
    diffs = _diff_logs_tolerant(read_text(os.path.join(wd, "oracle.log")),
                                read_text(os.path.join(wd, "ours.log")))
    # cutoff/GMM/bounds lines legitimately differ when the oracle's
    # randomized Phase II picked another near-tie cutoff (class verified
    # above); everything else must match
    diffs = [d for d in diffs
             if not re.search(r"cutoff|Gaussian|boundaries", d)]
    if diffs:  # preserve evidence before cleanup
        dst = _capture_flake(wd, "auto_winsize_search")
        assert not diffs, (f"artifacts captured to {dst}", diffs[:10])


@pytest.mark.slow
def test_winsize_multi_with_auto(oracle_bin, tmp_path):
    """--winsize-multi + --auto-winsize: first list entry passing the
    smoothness threshold wins (selectWinsizeFromList)."""
    args = ["--build", "hg18", "--winsize-multi", "30", "50", "70",
            "--auto-winsize", "--error", "0.001", "--kde-subsample", "0",
            "--size-bounds", "300000", "800000"]
    wd = _run_both(oracle_bin, tmp_path, args,
                   panel_kw=dict(nind=35, nloci_per_chr=(6000,), seed=31))
    import re
    ws = re.search(r"Selected window size: (\d+)",
                   read_text(os.path.join(wd, "ours.log")))
    assert_bed_same_or_oracle_random(
        oracle_bin, wd, ["--tped", "panel.tped.gz", "--tfam", "panel.tfam"]
        + args, "oracle", "ours", int(ws.group(1)) if ws else 30)


@pytest.mark.slow
def test_winsize_multi_explore(oracle_bin, tmp_path):
    """--winsize-multi without --auto-winsize dumps one KDE per candidate
    and exits (exploreWinsizes)."""
    panel, tped, tfam = _prepare(tmp_path, nind=35, nloci_per_chr=(5000,),
                                 seed=33)
    wd = str(tmp_path)
    args = ["--tped", "panel.tped.gz", "--tfam", "panel.tfam",
            "--build", "hg18", "--winsize-multi", "40", "60",
            "--error", "0.001", "--kde-subsample", "0"]
    r = run_oracle(oracle_bin, wd, args + ["--out", "oracle"])
    assert r.returncode == 0, r.stderr[-2000:]
    rc = run_ours(wd, args + ["--out", "ours"])
    assert rc == 0
    # .kde densities agree to FIGTree's eps (the oracle approximates the
    # Gauss transform; we compute it exactly)
    import numpy as np
    for sfx in (".40SNPs.kde", ".60SNPs.kde"):
        a = np.loadtxt(os.path.join(wd, "oracle" + sfx))
        b = np.loadtxt(os.path.join(wd, "ours" + sfx))
        np.testing.assert_allclose(b[:, 0], a[:, 0], rtol=1e-6)
        # FIGTree's bound is on ABSOLUTE error (eps * total weight), so
        # tail densities can be off by several percent relatively
        np.testing.assert_allclose(b[:, 1], a[:, 1], rtol=2e-2, atol=1e-3)
    assert not os.path.exists(os.path.join(wd, "ours.roh.bed"))


@pytest.mark.slow
def test_cm_units_bed_identical(oracle_bin, tmp_path):
    """--cm: ROH lengths in genetic-map units (sizes become cM floats in
    the BED, bounds in cM)."""
    from .util import write_map_scaffold
    panel, tped, tfam = _prepare(tmp_path, nind=25,
                                 nloci_per_chr=(4000, 3000), seed=41)
    write_map_scaffold(panel, str(tmp_path / "scaff.map.gz"))
    wd = str(tmp_path)
    args = ["--tped", "panel.tped.gz", "--tfam", "panel.tfam",
            "--map", "scaff.map.gz", "--cm",
            "--build", "hg18", "--winsize", "40", "--error", "0.001",
            "--lod-cutoff", "1.2", "--size-bounds", "0.3", "0.9",
            "--kde-subsample", "0"]
    r = run_oracle(oracle_bin, wd, args + ["--out", "oracle"])
    assert r.returncode == 0, r.stderr[-2000:]
    rc = run_ours(wd, args + ["--out", "ours"])
    assert rc == 0
    _assert_same(wd, "oracle", "ours", [".roh.bed"])


@pytest.mark.slow
def test_phased_weighted_r2_bed_identical(oracle_bin, tmp_path):
    """--weighted --phased: r2 LD from first-copy haplotype bits
    (src/garlic-data.cpp:585-617)."""
    from .util import write_map_scaffold
    panel, tped, tfam = _prepare(tmp_path, nind=22,
                                 nloci_per_chr=(2500, 2000), seed=47)
    write_map_scaffold(panel, str(tmp_path / "scaff.map.gz"))
    wd = str(tmp_path)
    args = ["--tped", "panel.tped.gz", "--tfam", "panel.tfam",
            "--map", "scaff.map.gz", "--weighted", "--phased",
            "--build", "hg18", "--winsize", "30", "--error", "0.002",
            "--lod-cutoff", "40", "--size-bounds", "300000", "800000",
            "--kde-subsample", "0", "--ld-subsample", "0"]
    r = run_oracle(oracle_bin, wd, args + ["--out", "oracle"])
    assert r.returncode == 0, r.stderr[-2000:]
    rc = run_ours(wd, args + ["--out", "ours"])
    assert rc == 0
    _assert_same(wd, "oracle", "ours", [".roh.bed"])


@pytest.mark.slow
def test_auto_overlap_frac(oracle_bin, tmp_path):
    """--auto-overlap-frac: density-derived overlap fraction
    (selectOverlapFrac, src/garlic-data.cpp:3-8)."""
    args = ["--build", "hg18", "--winsize", "50", "--error", "0.001",
            "--auto-overlap-frac", "--lod-cutoff", "1.3",
            "--size-bounds", "300000", "800000", "--kde-subsample", "0"]
    wd = _run_both(oracle_bin, tmp_path, args,
                   panel_kw=dict(nind=30, nloci_per_chr=(5000,), seed=51))
    _assert_same(wd, "oracle", "ours", [".roh.bed"])
    diffs = diff_logs(read_text(os.path.join(wd, "oracle.log")),
                      read_text(os.path.join(wd, "ours.log")))
    assert not diffs, diffs[:10]


@pytest.mark.slow
def test_freq_file_input(oracle_bin, tmp_path):
    """--freq-file: user frequencies skip recomputation; allele-flip on
    disagreement exercised by feeding the oracle's own freq output back."""
    panel, tped, tfam = _prepare(tmp_path, nind=30,
                                 nloci_per_chr=(4000,), seed=53)
    wd = str(tmp_path)
    base = ["--tped", "panel.tped.gz", "--tfam", "panel.tfam",
            "--build", "hg18", "--winsize", "40", "--error", "0.001",
            "--lod-cutoff", "1.2", "--size-bounds", "300000", "800000",
            "--kde-subsample", "0"]
    r = run_oracle(oracle_bin, wd, base + ["--out", "seed"])
    assert r.returncode == 0, r.stderr[-2000:]
    args = base + ["--freq-file", "seed.freq.gz"]
    r = run_oracle(oracle_bin, wd, args + ["--out", "oracle"])
    assert r.returncode == 0, r.stderr[-2000:]
    rc = run_ours(wd, args + ["--out", "ours"])
    assert rc == 0
    _assert_same(wd, "oracle", "ours", [".roh.bed"])


@pytest.mark.slow
def test_short_chromosome_edge(oracle_bin, tmp_path):
    """A chromosome shorter than winsize yields no windows (all MISSING)
    and no calls; the pipeline must not crash on either engine."""
    args = ["--build", "hg18", "--winsize", "60", "--error", "0.001",
            "--lod-cutoff", "1.5", "--size-bounds", "400000", "900000",
            "--kde-subsample", "0"]
    wd = _run_both(oracle_bin, tmp_path, args,
                   panel_kw=dict(nind=20, nloci_per_chr=(3000, 40),
                                 seed=61))
    _assert_same(wd, "oracle", "ours", [".roh.bed"])


@pytest.mark.slow
def test_single_individual(oracle_bin, tmp_path):
    args = ["--build", "hg18", "--winsize", "40", "--error", "0.001",
            "--lod-cutoff", "1.2", "--size-bounds", "300000", "800000",
            "--kde-subsample", "0"]
    wd = _run_both(oracle_bin, tmp_path, args,
                   panel_kw=dict(nind=1, nloci_per_chr=(3000,), seed=63))
    _assert_same(wd, "oracle", "ours", [".roh.bed"])


@pytest.mark.slow
@pytest.mark.parametrize("gl_type", ["GQ", "PL", "GL"])
def test_tgls_pipeline_bed_identical(oracle_bin, tmp_path, gl_type):
    """Genotype likelihoods replace the scalar error per (ind, locus)
    (src/garlic-roh.cpp:68,91-95); all three GL formats."""
    from .util import write_tgls
    panel, tped, tfam = _prepare(tmp_path, nind=20,
                                 nloci_per_chr=(3000,), seed=81)
    write_tgls(panel, str(tmp_path / "p.tgls.gz"), gl_type)
    wd = str(tmp_path)
    args = ["--tped", "panel.tped.gz", "--tfam", "panel.tfam",
            "--tgls", "p.tgls.gz", "--gl-type", gl_type,
            "--build", "hg18", "--winsize", "40",
            "--lod-cutoff", "1.2", "--size-bounds", "300000", "800000",
            "--kde-subsample", "0"]
    r = run_oracle(oracle_bin, wd, args + ["--out", "oracle"])
    assert r.returncode == 0, r.stderr[-2000:]
    rc = run_ours(wd, args + ["--out", "ours"])
    assert rc == 0
    _assert_same(wd, "oracle", "ours", [".roh.bed"])


@pytest.mark.slow
def test_weighted_tgls_combined(oracle_bin, tmp_path):
    """--weighted + --tgls: wLOD scores with per-genotype GL error."""
    from .util import write_map_scaffold, write_tgls
    panel, tped, tfam = _prepare(tmp_path, nind=18,
                                 nloci_per_chr=(2500,), seed=83)
    write_map_scaffold(panel, str(tmp_path / "scaff.map.gz"))
    write_tgls(panel, str(tmp_path / "p.tgls.gz"), "GQ")
    wd = str(tmp_path)
    args = ["--tped", "panel.tped.gz", "--tfam", "panel.tfam",
            "--map", "scaff.map.gz", "--weighted",
            "--tgls", "p.tgls.gz", "--gl-type", "GQ",
            "--build", "hg18", "--winsize", "30",
            "--lod-cutoff", "40", "--size-bounds", "300000", "800000",
            "--kde-subsample", "0", "--ld-subsample", "0"]
    r = run_oracle(oracle_bin, wd, args + ["--out", "oracle"])
    assert r.returncode == 0, r.stderr[-2000:]
    rc = run_ours(wd, args + ["--out", "ours"])
    assert rc == 0
    _assert_same(wd, "oracle", "ours", [".roh.bed"])


@pytest.mark.slow
def test_error_file_parity(oracle_bin, tmp_path):
    """.error content matches: empty on clean runs, warning lines match
    (e.g. the low max-gap warning, src/garlic-cli.cpp checkMaxGap)."""
    args = ["--build", "hg18", "--winsize", "40", "--error", "0.001",
            "--max-gap", "500", "--lod-cutoff", "1.2",
            "--size-bounds", "300000", "800000", "--kde-subsample", "0"]
    wd = _run_both(oracle_bin, tmp_path, args,
                   panel_kw=dict(nind=15, nloci_per_chr=(2000,), seed=71))
    a = read_text(os.path.join(wd, "oracle.error"))
    b = read_text(os.path.join(wd, "ours.error"))
    assert a == b
    assert "WARNING" in b  # the low max-gap warning fired on both


@pytest.mark.slow
def test_raw_lod_windows_match(oracle_bin, tmp_path):
    """--raw-lod dumps are the direct Phase-I comparison artifact."""
    args = BASE_ARGS + ["--raw-lod", "--lod-cutoff", "1.5",
                        "--size-bounds", "500000", "1000000"]
    wd = _run_both(oracle_bin, tmp_path, args,
                   panel_kw=dict(nloci_per_chr=(2500,), seed=3))
    _assert_same(wd, "oracle", "ours",
                 [".POP1.chr1.raw.lod.windows.gz", ".roh.bed"])


@pytest.mark.slow
def test_custom_centromere_file(oracle_bin, tmp_path):
    """--centromere: custom 3-column gap table breaks windows/runs
    identically to the reference's reader (garlic-centromeres.cpp:64-101),
    including bare-name -> chr-name normalization."""
    with open(tmp_path / "centro.txt", "w") as f:
        f.write("1\t3000000\t3500000\n")
        f.write("2\t2000000\t2600000\n")
    args = ["--build", "none", "--centromere", "centro.txt",
            "--winsize", "40", "--error", "0.001", "--lod-cutoff", "1.2",
            "--size-bounds", "300000", "800000", "--kde-subsample", "0"]
    wd = _run_both(oracle_bin, tmp_path, args,
                   panel_kw=dict(nind=30, nloci_per_chr=(5000, 4000),
                                 seed=83))
    _assert_same(wd, "oracle", "ours", [".roh.bed", ".freq.gz"])
    diffs = diff_logs(read_text(os.path.join(wd, "oracle.log")),
                      read_text(os.path.join(wd, "ours.log")))
    assert not diffs, diffs[:10]


@pytest.mark.slow
def test_nclust_two_auto_bounds(oracle_bin, tmp_path):
    """--nclust 2: a 2-component GMM yields one size boundary and A/B
    classes only (selectSizeClasses, garlic-roh.cpp:935-1003)."""
    args = ["--build", "hg18", "--winsize", "40", "--error", "0.001",
            "--lod-cutoff", "1.2", "--nclust", "2", "--kde-subsample", "0"]
    wd = _run_both(oracle_bin, tmp_path, args,
                   panel_kw=dict(nind=40, nloci_per_chr=(8000, 6000),
                                 seed=89))
    _assert_same(wd, "oracle", "ours", [".roh.bed"])


@pytest.mark.slow
def test_no_kde_thinning(oracle_bin, tmp_path):
    """--no-kde-thinning: every window (not every winsize-th) feeds the
    Phase-II KDE (convertWinData2DoubleData step=1, garlic-data.cpp:2026;
    README warns it 'dramatically increases runtime' — cheap for us)."""
    args = ["--build", "hg18", "--winsize", "60", "--error", "0.001",
            "--kde-subsample", "0", "--no-kde-thinning"]
    wd = _run_both(oracle_bin, tmp_path, args,
                   panel_kw=dict(nind=40, nloci_per_chr=(8000, 6000),
                                 seed=91))
    _assert_same(wd, "oracle", "ours", [".freq.gz"])
    same_bed = read_text(os.path.join(wd, "oracle.roh.bed")) == \
        read_text(os.path.join(wd, "ours.roh.bed"))
    assert_bed_same_or_oracle_random(
        oracle_bin, wd, ["--tped", "panel.tped.gz", "--tfam", "panel.tfam"]
        + args, "oracle", "ours", 60)
    if same_bed:
        diffs = diff_logs(read_text(os.path.join(wd, "oracle.log")),
                          read_text(os.path.join(wd, "ours.log")))
        assert not diffs, diffs[:10]


@pytest.mark.slow
def test_custom_tped_missing_code(oracle_bin, tmp_path):
    """--tped-missing N: alternate missing-allele character drives the
    same allele coding / half-missing freq rules (loadTPEDData,
    garlic-data.cpp:109-131)."""
    from .util import make_panel, write_tped as _wt
    panel = make_panel(nind=30, nloci_per_chr=(5000, 4000), seed=93,
                      missing_rate=0.01)
    _wt(panel, str(tmp_path / "panel.tped.gz"), str(tmp_path / "panel.tfam"),
        missing_char="N")
    wd = str(tmp_path)
    args = ["--tped", "panel.tped.gz", "--tfam", "panel.tfam",
            "--tped-missing", "N", "--build", "hg18", "--winsize", "40",
            "--error", "0.001", "--lod-cutoff", "1.2",
            "--size-bounds", "300000", "800000", "--kde-subsample", "0"]
    r = run_oracle(oracle_bin, wd, args + ["--out", "oracle"])
    assert r.returncode == 0, r.stderr[-2000:]
    rc = run_ours(wd, args + ["--out", "ours"])
    assert rc == 0
    _assert_same(wd, "oracle", "ours", [".roh.bed", ".freq.gz"])


@pytest.mark.slow
def test_corrupt_freq_file_error_parity(oracle_bin, tmp_path):
    """--freq-file validation errors must produce byte-identical .error
    files (readFreqData, src/garlic-data.cpp:1345-1440) — incl. with the
    native fast reader in front, which declines on any anomaly so the
    Python reader re-parses and emits the reference's exact text."""
    import gzip as _gz
    import subprocess

    from .util import run_ours

    panel, tped, tfam = _prepare(tmp_path, nind=12, nloci_per_chr=(500,),
                                 seed=77)
    wd = str(tmp_path)
    base = ["--tped", "panel.tped.gz", "--tfam", "panel.tfam",
            "--build", "hg18", "--winsize", "40", "--error", "0.001",
            "--kde-subsample", "0", "--lod-cutoff", "1.2",
            "--size-bounds", "300000", "800000"]
    # generate a clean freq file first
    r = run_oracle(oracle_bin, wd, base + ["--out", "seed"])
    assert r.returncode == 0
    with _gz.open(os.path.join(wd, "seed.freq.gz"), "rt") as f:
        lines = f.read().rstrip("\n").split("\n")

    def write_freq(name, ls):
        with _gz.open(os.path.join(wd, name), "wt") as f:
            f.write("\n".join(ls) + "\n")

    cases = {
        "mismatch.freq.gz": lines[:10] + [lines[10].replace("rs", "zz", 1)]
        + lines[11:],
        "short.freq.gz": lines[:-5],
        "badcols.freq.gz": lines[:5] + ["chr1\tonly\tfour\tcols"]
        + lines[6:],
    }
    for name, ls in cases.items():
        write_freq(name, ls)
        args = base + ["--freq-file", name]
        r = run_oracle(oracle_bin, wd, args + ["--out", f"o_{name}"])
        assert r.returncode != 0
        rc = run_ours(wd, args + ["--out", f"m_{name}"])
        assert rc != 0
        a = read_text(os.path.join(wd, f"o_{name}.error"))
        b = read_text(os.path.join(wd, f"m_{name}.error"))
        assert a == b, f"{name}: {_first_diff(a, b)}"


@pytest.mark.slow
def test_phased_weighted_tgls_combined(oracle_bin, tmp_path):
    """--weighted --phased + --tgls: r2 LD from first-copy haplotype
    bits combined with per-genotype GL error in the wLOD (PHASED and
    USE_GL are orthogonal in the reference, garlic-main.cpp)."""
    from .util import write_map_scaffold, write_tgls
    panel, tped, tfam = _prepare(tmp_path, nind=18,
                                 nloci_per_chr=(2500,), seed=84)
    write_map_scaffold(panel, str(tmp_path / "scaff.map.gz"))
    write_tgls(panel, str(tmp_path / "p.tgls.gz"), "GQ")
    wd = str(tmp_path)
    args = ["--tped", "panel.tped.gz", "--tfam", "panel.tfam",
            "--map", "scaff.map.gz", "--weighted", "--phased",
            "--tgls", "p.tgls.gz", "--gl-type", "GQ",
            "--build", "hg18", "--winsize", "30",
            "--lod-cutoff", "40", "--size-bounds", "300000", "800000",
            "--kde-subsample", "0", "--ld-subsample", "0"]
    r = run_oracle(oracle_bin, wd, args + ["--out", "oracle"])
    assert r.returncode == 0, r.stderr[-2000:]
    rc = run_ours(wd, args + ["--out", "ours"])
    assert rc == 0
    _assert_same(wd, "oracle", "ours", [".roh.bed"])


@pytest.mark.slow
def test_noncontiguous_chromosome_blocks(oracle_bin, tmp_path):
    """A chromosome name that REAPPEARS later in the TPED starts a new
    independent block (the reference splits on name change,
    src/garlic-data.cpp:66-91, and never merges revisited names) — BED
    and log must match on such inputs."""
    import numpy as np
    rng = np.random.default_rng(5)
    lines = []
    pos = 100000
    for chrom, n in (("1", 300), ("2", 300), ("1", 300)):
        for _ in range(n):
            pos += int(rng.integers(500, 3000))
            alleles = []
            for _k in range(20):
                alleles += list(rng.choice(["A", "C"], 2, p=[0.8, 0.2]))
            lines.append(f"{chrom} rs{chrom}_{pos} 0 {pos} "
                         + " ".join(alleles))
    wd = str(tmp_path)
    with open(os.path.join(wd, "nc.tped"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(wd, "nc.tfam"), "w") as f:
        for k in range(20):
            f.write(f"P1 ind{k} 0 0 1 1\n")
    args = ["--tped", "nc.tped", "--tfam", "nc.tfam", "--build", "hg18",
            "--winsize", "30", "--error", "0.001", "--kde-subsample", "0",
            "--lod-cutoff", "1.0", "--size-bounds", "100000", "300000"]
    r = run_oracle(oracle_bin, wd, args + ["--out", "oracle"])
    assert r.returncode == 0, r.stderr[-2000:]
    rc = run_ours(wd, args + ["--out", "ours"])
    assert rc == 0
    _assert_same(wd, "oracle", "ours", [".roh.bed"])
    a = read_text(os.path.join(wd, "oracle.log")).splitlines()[1:]
    b = read_text(os.path.join(wd, "ours.log")).splitlines()[1:]
    assert [x.replace("oracle", "B") for x in a] == \
           [x.replace("ours", "B") for x in b]


@pytest.mark.slow
def test_tfam_validation_error_parity(oracle_bin, tmp_path):
    """.error parity for TFAM validation failures: multiple population
    IDs and duplicate individual IDs (scanIndData3,
    src/garlic-data.cpp:1893-1961)."""
    panel, tped, tfam = _prepare(tmp_path, nind=12, nloci_per_chr=(400,),
                                 seed=9)
    wd = str(tmp_path)
    lines = open(os.path.join(wd, "panel.tfam")).read().splitlines()
    cases = {}
    mp = [l if i < 6 else "POPX " + l.split(None, 1)[1]
          for i, l in enumerate(lines)]
    cases["mp.tfam"] = "\n".join(mp) + "\n"
    parts = lines[3].split()
    dup = list(lines)
    dup[3] = " ".join([parts[0], lines[0].split()[1]] + parts[2:])
    cases["dup.tfam"] = "\n".join(dup) + "\n"
    base = ["--tped", "panel.tped.gz", "--build", "hg18", "--winsize", "30",
            "--error", "0.001", "--kde-subsample", "0",
            "--lod-cutoff", "1.0", "--size-bounds", "100000", "300000"]
    for name, content in cases.items():
        with open(os.path.join(wd, name), "w") as f:
            f.write(content)
        args = base + ["--tfam", name]
        r = run_oracle(oracle_bin, wd, args + ["--out", f"o_{name}"])
        assert r.returncode != 0
        rc = run_ours(wd, args + ["--out", f"m_{name}"])
        assert rc != 0
        a = read_text(os.path.join(wd, f"o_{name}.error"))
        b = read_text(os.path.join(wd, f"m_{name}.error"))
        assert a == b, f"{name}: {_first_diff(a, b)}"


@pytest.mark.slow
def test_weighted_custom_mu_M_bed_identical(oracle_bin, tmp_path):
    """Non-default --mu/--M reach the wLOD decay weights nomut/norec
    (src/garlic-roh.cpp:134-141: e^{-2*M*mu*dppos} and e^{-2*M*dgpos});
    every other weighted test runs the defaults (mu=1e-9, M=7), so this
    pins the parameter plumbing end-to-end against the oracle.

    NB: mu must be written in plain decimal — param_t::goodDouble
    (src/param_t.cpp:232-245) rejects scientific notation, a quirk our
    CLI preserves (cli.py:_good_double)."""
    from .util import write_map_scaffold
    panel, tped, tfam = _prepare(tmp_path, nind=20,
                                 nloci_per_chr=(2500, 2000), seed=37)
    write_map_scaffold(panel, str(tmp_path / "scaff.map.gz"))
    wd = str(tmp_path)
    args = ["--tped", "panel.tped.gz", "--tfam", "panel.tfam",
            "--map", "scaff.map.gz", "--weighted",
            "--build", "hg18", "--winsize", "30", "--error", "0.002",
            "--mu", "0.00000001", "--M", "5",
            "--lod-cutoff", "50", "--size-bounds", "300000", "800000",
            "--kde-subsample", "0", "--ld-subsample", "0"]
    r = run_oracle(oracle_bin, wd, args + ["--out", "oracle"])
    assert r.returncode == 0, r.stderr[-2000:]
    rc = run_ours(wd, args + ["--out", "ours"])
    assert rc == 0
    _assert_same(wd, "oracle", "ours", [".roh.bed"])
    diffs = diff_logs(read_text(os.path.join(wd, "oracle.log")),
                      read_text(os.path.join(wd, "ours.log")))
    assert not diffs, diffs[:10]


def test_tgls_column_mismatch_error_parity(oracle_bin, tmp_path):
    """.error parity for TGLS shape failures (readTGLSData,
    src/garlic-data.cpp:1543-1549): a truncated file (EOF -> 0 fields)
    and a row with an extra column both abort with the reference's
    'Incorrect number of columns' text, byte-identical."""
    import gzip as _gz

    from .util import write_tgls
    panel, tped, tfam = _prepare(tmp_path, nind=15, nloci_per_chr=(800,),
                                 seed=99)
    wd = str(tmp_path)
    write_tgls(panel, os.path.join(wd, "p.tgls.gz"), "GQ")
    with _gz.open(os.path.join(wd, "p.tgls.gz"), "rt") as f:
        lines = f.read().rstrip("\n").split("\n")
    cases = {
        "trunc.tgls.gz": lines[:-10],
        "extracol.tgls.gz": lines[:5] + [lines[5] + "\t0.5"] + lines[6:],
    }
    base = ["--tped", "panel.tped.gz", "--tfam", "panel.tfam",
            "--build", "hg18", "--winsize", "40", "--error", "0.001",
            "--kde-subsample", "0", "--lod-cutoff", "1.2",
            "--size-bounds", "300000", "800000", "--gl-type", "GQ"]
    for name, ls in cases.items():
        with _gz.open(os.path.join(wd, name), "wt") as f:
            f.write("\n".join(ls) + "\n")
        args = base + ["--tgls", name]
        r = run_oracle(oracle_bin, wd, args + ["--out", f"o_{name}"])
        assert r.returncode != 0
        rc = run_ours(wd, args + ["--out", f"m_{name}"])
        assert rc != 0
        a = read_text(os.path.join(wd, f"o_{name}.error"))
        b = read_text(os.path.join(wd, f"m_{name}.error"))
        assert a == b, f"{name}: {_first_diff(a, b)}"


@pytest.mark.slow
def test_weighted_auto_cutoff_fast_engine(oracle_bin, tmp_path):
    """Weighted AUTO-everything on the fast engine (round-5 exactness
    class): the exact f64 wLOD Phase-II sampler must make the .kde x
    column byte-identical to the oracle's, and the BED identical modulo
    the documented randomized-oracle class (the reference's Phase II is
    the same computeKDE for weighted runs, src/garlic-main.cpp:374-378)."""
    from .util import write_map_scaffold
    panel, tped, tfam = _prepare(tmp_path, nind=25,
                                 nloci_per_chr=(3000, 2500), seed=21)
    write_map_scaffold(panel, str(tmp_path / "scaff.map.gz"))
    wd = str(tmp_path)
    args = ["--tped", "panel.tped.gz", "--tfam", "panel.tfam",
            "--map", "scaff.map.gz", "--weighted",
            "--build", "hg18", "--winsize", "30", "--error", "0.002",
            "--kde-subsample", "0", "--ld-subsample", "0"]
    r = run_oracle(oracle_bin, wd, args + ["--out", "oracle"])
    assert r.returncode == 0, r.stderr[-2000:]
    rc = run_ours(wd, args + ["--out", "ours", "--tpu-engine", "fast"])
    assert rc == 0
    # the x grid guarantee holds regardless of which cutoff the oracle drew
    ka = read_text(os.path.join(wd, "oracle.30SNPs.kde"))
    kb = read_text(os.path.join(wd, "ours.30SNPs.kde"))
    xa = [line.split()[0] for line in ka.splitlines() if line.strip()]
    xb = [line.split()[0] for line in kb.splitlines() if line.strip()]
    assert xa == xb, "weighted fast-engine .kde x column differs"
    assert_bed_same_or_oracle_random(oracle_bin, wd, args, "oracle",
                                     "ours", 30)


@pytest.mark.slow
def test_weighted_tgls_auto_cutoff_fast_engine(oracle_bin, tmp_path):
    """Weighted + TGLS auto-cutoff on the fast engine: the exact sampler
    must thread per-genotype GL errors through the f64 wLOD pool."""
    from .util import write_map_scaffold, write_tgls
    panel, tped, tfam = _prepare(tmp_path, nind=22,
                                 nloci_per_chr=(2800, 2200), seed=33)
    write_map_scaffold(panel, str(tmp_path / "scaff.map.gz"))
    write_tgls(panel, str(tmp_path / "panel.tgls.gz"), gl_type="GQ")
    wd = str(tmp_path)
    args = ["--tped", "panel.tped.gz", "--tfam", "panel.tfam",
            "--map", "scaff.map.gz", "--weighted",
            "--tgls", "panel.tgls.gz", "--gl-type", "GQ",
            "--build", "hg18", "--winsize", "30", "--error", "0.002",
            "--kde-subsample", "0", "--ld-subsample", "0",
            # bounds pinned: this panel's ROH length distribution aborts
            # the ORACLE's GSL GMM (log.c domain error); the class under
            # test is the auto-KDE cutoff
            "--size-bounds", "300000", "800000"]
    r = run_oracle(oracle_bin, wd, args + ["--out", "oracle"])
    assert r.returncode == 0, r.stderr[-2000:]
    rc = run_ours(wd, args + ["--out", "ours", "--tpu-engine", "fast"])
    assert rc == 0
    ka = read_text(os.path.join(wd, "oracle.30SNPs.kde"))
    kb = read_text(os.path.join(wd, "ours.30SNPs.kde"))
    xa = [line.split()[0] for line in ka.splitlines() if line.strip()]
    xb = [line.split()[0] for line in kb.splitlines() if line.strip()]
    assert xa == xb, "weighted+TGLS fast-engine .kde x column differs"
    assert_bed_same_or_oracle_random(oracle_bin, wd, args, "oracle",
                                     "ours", 30)
