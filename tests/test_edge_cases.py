"""Edge-case golden tests: N bases, FASTQ/gzip/stdin inputs, min_occ filters,
multi-file queries, short reads, kount over two indexes."""

import gzip
import subprocess

import pytest

from .conftest import run_ours, run_ref


def test_mem_reads_with_N(ref_bin, ref_index, tmp_path):
    p = tmp_path / "nreads.fa"
    p.write_text(">a\nACGTNNNACGTACGTACGTACGTAGCTAGCTAGNCATGCA\n>b\nNNNNNNNNNNNNNNNNNNNNNNNN\n>c\nACGT\n")
    args = ["mem", "-l13", str(ref_index), str(p)]
    assert run_ours(args) == run_ref(ref_bin, args)


def test_mem_min_occ(ref_bin, ref_index, corpus):
    args = ["mem", "-l21", "-c5", str(ref_index), str(corpus / "reads.fa")]
    assert run_ours(args) == run_ref(ref_bin, args)


def test_mem_fastq_and_gzip(ref_bin, ref_index, corpus, tmp_path):
    lines = open(corpus / "reads.fa").read().strip().split("\n")
    fq = tmp_path / "r.fq"
    with open(fq, "w") as f:
        for i in range(0, 20, 2):
            name, seq = lines[i][1:], lines[i + 1]
            f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    args = ["mem", "-l21", str(ref_index), str(fq)]
    assert run_ours(args) == run_ref(ref_bin, args)
    gz = tmp_path / "r.fq.gz"
    gz.write_bytes(gzip.compress(fq.read_bytes()))
    args = ["mem", "-l21", str(ref_index), str(gz)]
    assert run_ours(args) == run_ref(ref_bin, args)


def test_mem_multiple_files_seq_ids(ref_bin, ref_index, tmp_path):
    # unnamed line-mode reads across two files: seq%d ids must continue
    a, b = tmp_path / "a.txt", tmp_path / "b.txt"
    a.write_text("ACGTACGTACGTACGTACGTACGTACGT\n")
    b.write_text("TTGCATTGCATTGCATTGCATTGCATT\n")
    args = ["mem", "-Ll10", str(ref_index), str(a), str(b)]
    assert run_ours(args) == run_ref(ref_bin, args)


def test_mem_stdin(ref_bin, ref_index):
    inp = b"ACGTACGTACGTACGTACGTACGTACGT\n"
    args = ["mem", "-Ll10", str(ref_index), "-"]
    assert run_ours(args, input=inp) == run_ref(ref_bin, args, input=inp)


def test_mem_short_reads(ref_bin, ref_index):
    inp = b"A\nAC\nACGTACGTACGTACGTACG\n\n"
    args = ["mem", "-Ll19", str(ref_index), "-"]
    assert run_ours(args, input=inp) == run_ref(ref_bin, args, input=inp)


def test_kount_two_indexes(ref_bin, ref_index, corpus, tmp_path):
    # second index from a subset of the corpus
    lines = open(corpus / "genomes.fa").read().strip().split("\n")
    h = tmp_path / "half.fa"
    h.write_text("\n".join(lines[:8]) + "\n")
    idx2 = tmp_path / "half.fmd"
    idx2.write_bytes(run_ref(ref_bin, ["build", "-d", str(h)]))
    args = ["kount", "-k5", "-m3", str(ref_index), str(idx2)]
    assert run_ours(args) == run_ref(ref_bin, args)


def test_build_empty_and_fastq(ref_bin, tmp_path):
    fq = tmp_path / "in.fq"
    fq.write_text("@r1\nACGTACGTAAGG\n+\nIIIIIIIIIIII\n@r2\nTTTTACGT\n+\nIIIIIIII\n")
    assert run_ours(["build", str(fq)]) == run_ref(ref_bin, ["build", str(fq)])


def test_get_out_of_range(ref_bin, ref_index):
    args = ["get", str(ref_index), "999999", "0"]
    assert run_ours(args) == run_ref(ref_bin, args)


def test_suffix_line_mode(ref_bin, ref_index):
    inp = b"GGGGGGGGGGGGGG\nACGTACGTACGT\n"
    args = ["suffix", "-L", str(ref_index), "-"]
    assert run_ours(args, input=inp) == run_ref(ref_bin, args, input=inp)


def test_missing_input_files(ref_bin, ref_index, tmp_path):
    """Missing sequence/input files: stdout and the ERROR stderr line match
    the reference (search.c:571-575 break; build.c:209 continue)."""
    import os
    import subprocess
    import sys

    q = tmp_path / "q.fa"
    q.write_text(">q1\nACGTACGTACGTACGTACGTACGT\n")
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"

    def both(args):
        r = subprocess.run([ref_bin] + args, capture_output=True)
        o = subprocess.run([sys.executable, "-m", "ropebwt3_tpu"] + args, capture_output=True, env=env)
        assert o.stdout == r.stdout, args
        ref_err = [l for l in r.stderr.splitlines() if l.startswith(b"ERROR")]
        our_err = [l for l in o.stderr.splitlines() if l.startswith(b"ERROR")]
        assert our_err == ref_err, (args, our_err, ref_err)

    nf = str(tmp_path / "nofile.fa")
    # mem/sw/hapdiv: process q.fa, then report the missing file and stop
    both(["mem", "-l5", str(ref_index), str(q), nf, str(q)])
    both(["sw", "-m1", str(ref_index), str(q), nf])
    both(["hapdiv", "-a11", str(ref_index), nf])
    # build: report and continue with the remaining inputs
    both(["build", nf, str(q)])
