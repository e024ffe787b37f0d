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
