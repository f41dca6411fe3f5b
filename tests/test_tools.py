"""Companion-tool tests: vcf2tped against the reference perl script (when
perl is available) and count_features_in_roh semantics."""

from __future__ import annotations

import os
import shutil
import subprocess

import pytest

from garlic_tpu.tools import count_features_in_roh as cfr
from garlic_tpu.tools import vcf2tped

VCF = """\
##fileformat=VCFv4.1
##source=test
#CHROM POS ID REF ALT QUAL FILTER INFO FORMAT IND1 IND2 IND3
1 1000 rs1 A C . PASS . GT 0/0 0/1 1/1
1 2000 rs2 G T . PASS . GT ./. 1|0 0/0
2 500 rs3 T A . PASS . GT 1/1 0/0 ./1
"""

PERL_REF = "/root/reference/src/vcf2tped.pl"


def test_vcf2tped_basic(tmp_path):
    vcf = str(tmp_path / "a.vcf")
    with open(vcf, "w") as f:
        f.write(VCF)
    assert vcf2tped.main([vcf]) == 0
    tped = open(str(tmp_path / "a.tped")).read()
    tfam = open(str(tmp_path / "a.tfam")).read()
    assert tfam == "0\tIND1\t0\t0\t0\t0\n0\tIND2\t0\t0\t0\t0\n" \
                   "0\tIND3\t0\t0\t0\t0\n"
    lines = tped.splitlines()
    assert lines[0] == "1\trs1\t0\t1000\tA\tA\tA\tC\tC\tC"
    assert lines[1] == "1\trs2\t0\t2000\t0\t0\tT\tG\tG\tG"
    assert lines[2] == "2\trs3\t0\t500\tA\tA\tT\tT\t0\tA"


@pytest.mark.skipif(shutil.which("perl") is None, reason="perl unavailable")
def test_vcf2tped_matches_reference_perl(tmp_path):
    vcf = str(tmp_path / "ref.vcf")
    with open(vcf, "w") as f:
        f.write(VCF)
    r = subprocess.run(["perl", PERL_REF, vcf], capture_output=True,
                       text=True)
    if r.returncode != 0:
        pytest.skip(f"reference perl failed: {r.stderr[:200]}")
    ref_tped = open(str(tmp_path / "ref.tped")).read()
    ref_tfam = open(str(tmp_path / "ref.tfam")).read()
    vcf2 = str(tmp_path / "ours.vcf")
    with open(vcf2, "w") as f:
        f.write(VCF)
    vcf2tped.main([vcf2])
    assert open(str(tmp_path / "ours.tped")).read() == ref_tped
    assert open(str(tmp_path / "ours.tfam")).read() == ref_tfam


def test_vcf2tped_bad_extension(tmp_path, capsys):
    assert vcf2tped.main([str(tmp_path / "a.txt")]) == 1


def test_hits_interval():
    iv = [(100, 200, "A"), (300, 400, "B"), (500, 600, "C")]
    assert cfr.hits_interval(iv, 150) == "A"
    assert cfr.hits_interval(iv, 100) == "A"
    assert cfr.hits_interval(iv, 200) == "A"
    assert cfr.hits_interval(iv, 250) == "0"
    assert cfr.hits_interval(iv, 350) == "B"
    assert cfr.hits_interval(iv, 601) == "0"
    assert cfr.hits_interval(iv, 50) == "0"
    assert cfr.hits_interval([], 50) == "0"


def test_count_features_end_to_end(tmp_path):
    # feature file: chr:pos ref alt effect
    feat = str(tmp_path / "features.txt")
    with open(feat, "w") as f:
        f.write("chr22:1000 A C MISSENSE\n"
                "chr22:2000 G T SYNONYMOUS\n"
                "chr22:3000 T A MISSENSE\n")
    # ROH bed: IND1 has an A-class ROH covering 900-1500 on chr22
    bed = str(tmp_path / "x.roh.bed")
    with open(bed, "w") as f:
        f.write('track db="hg18" name="IND1" description="Ind: IND1 '
                'Pop:P ROH calls" visibility=2 itemRgb="On"\n')
        f.write("chr22 900 1501 A 600 . 0 0 0,0,0\n")
        f.write('track db="hg18" name="IND2" description="Ind: IND2 '
                'Pop:P ROH calls" visibility=2 itemRgb="On"\n')
    # TPED for chr22: IND1 hom C at 1000 (functional allele C),
    # IND2 hom T at 2000, IND1 het at 3000
    tped = str(tmp_path / "g.chr22.tped")
    with open(tped, "w") as f:
        f.write("22 rs1 0 1000 C C A A\n"
                "22 rs2 0 2000 G G T T\n"
                "22 rs3 0 3000 T A T T\n")
    with open(str(tmp_path / "g.chr22.tfam"), "w") as f:
        f.write("P IND1 0 0 0 -9\nP IND2 0 0 0 -9\n")
    out = str(tmp_path / "counts.txt")
    cfr.run(feat, bed, tped, 22, out)
    lines = open(out).read().splitlines()
    assert lines[0].split() == [
        "MISSENSEA", "MISSENSEB", "MISSENSEC", "MISSENSENONE",
        "SYNONYMOUSA", "SYNONYMOUSB", "SYNONYMOUSC", "SYNONYMOUSNONE"]
    # IND1: hom C at 1000 inside A-class ROH -> MISSENSEA=1;
    #       rs3: a1=T==a2? genotypes "T A" -> a1 != a2, not counted
    assert lines[1].split() == ["IND1", "1", "0", "0", "0",
                                "0", "0", "0", "0"]
    # IND2: hom T at 2000 (SYNONYMOUS), no ROH -> SYNONYMOUSNONE=1;
    #       rs3 hom T (MISSENSE allele is A, T not in features) -> 0
    assert lines[2].split() == ["IND2", "0", "0", "0", "0",
                                "0", "0", "0", "1"]
