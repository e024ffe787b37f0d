"""Gated real-TPU smoke tests (VERDICT round-2 item 8).

Run ONCE per round, alone, before the bench:

    RB3TPU_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -x -q

Gated because (a) only one process may attach to the tunneled chip, so these
must never run concurrently with a bench or another suite; (b) fresh kernel
shapes pay 2 s-40 min remote compiles.  Each test talks to the chip through
ONE subprocess at a time (the pytest process itself stays on the CPU
backend), handing back the ambient machine env that conftest scrubbed."""

import os
import subprocess
import sys

import pytest

from .conftest import run_ref

pytestmark = pytest.mark.skipif(
    os.environ.get("RB3TPU_TPU_TESTS") != "1",
    reason="real-TPU smoke: set RB3TPU_TPU_TESTS=1 and run this file alone",
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tpu_env():
    """The pre-conftest machine env: axon sitecustomize back on PYTHONPATH,
    platform pin restored, no virtual-device XLA flags."""
    env = dict(os.environ)
    env["PYTHONPATH"] = env.get("RB3TPU_ORIG_PYTHONPATH", "")
    orig_plat = env.get("RB3TPU_ORIG_JAX_PLATFORMS", "")
    if orig_plat:
        env["JAX_PLATFORMS"] = orig_plat
    else:
        env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return env


def test_mem_jax_golden_on_chip(ref_bin, ref_index, corpus):
    """CLI `mem --engine=jax` (packed TPU kernel) byte-matches the reference
    on the attached chip."""
    want = run_ref(ref_bin, ["mem", "-l13", str(ref_index), str(corpus / "reads.fa")])
    r = subprocess.run(
        [sys.executable, "-m", "ropebwt3_tpu", "mem", "--engine=jax", "-l13", str(ref_index), str(corpus / "reads.fa")],
        env=tpu_env(), capture_output=True, timeout=2400, cwd=ROOT,
    )
    assert r.returncode == 0, r.stderr.decode()[-3000:]
    assert r.stdout == want


def test_sw_hapdiv_jax_golden_on_chip(ref_bin, ref_index, corpus, tmp_path):
    """CLI `sw --engine=jax` and `hapdiv --engine=jax` (device DP engines)
    byte-match the reference on the attached chip."""
    lines = open(corpus / "reads.fa").read().strip().split("\n")
    swr = tmp_path / "reads8.fa"
    swr.write_text("\n".join(lines[:16]) + "\n")
    for cmd in (["sw"], ["hapdiv", "-a61", "-w25"]):
        want = run_ref(ref_bin, cmd + [str(ref_index), str(swr)])
        r = subprocess.run(
            [sys.executable, "-m", "ropebwt3_tpu", cmd[0], "--engine=jax"] + cmd[1:] + [str(ref_index), str(swr)],
            env=tpu_env(), capture_output=True, timeout=2400, cwd=ROOT,
        )
        assert r.returncode == 0, (cmd[0], r.stderr.decode()[-3000:])
        assert r.stdout == want, cmd[0]


def test_mem_mesh_1x1_golden_on_chip(ref_bin, ref_index, corpus):
    """`mem --engine=jax --mesh=1x1` runs the shard_map/psum program ON REAL
    HARDWARE (one chip = a 1x1 mesh; the multi-device variants of the same
    program are golden on the virtual mesh) and stays byte-identical."""
    want = run_ref(ref_bin, ["mem", "-l13", str(ref_index), str(corpus / "reads.fa")])
    r = subprocess.run(
        [sys.executable, "-m", "ropebwt3_tpu", "mem", "--engine=jax", "--mesh=1x1", "-l13", str(ref_index), str(corpus / "reads.fa")],
        env=tpu_env(), capture_output=True, timeout=2400, cwd=ROOT,
    )
    assert r.returncode == 0, r.stderr.decode()[-3000:]
    assert r.stdout == want


def test_server_roundtrip_on_chip(ref_bin, ref_index, corpus):
    """A resident `rb3tpu serve` holding the REAL chip answers a socket-routed
    mem byte-identically, twice (warm reuse), then stops cleanly."""
    import time

    from ropebwt3_tpu.server import server_available

    idx = str(ref_index)
    env = tpu_env()
    srv = subprocess.Popen(
        [sys.executable, "-m", "ropebwt3_tpu", "serve", "--warm=13:150", idx],
        env=env, cwd=ROOT, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )
    try:
        for _ in range(1200):  # fresh-process TPU warmup is 60-300 s
            if server_available(idx):
                break
            if srv.poll() is not None:
                raise AssertionError(f"server died: {srv.communicate()[1].decode()[-3000:]}")
            time.sleep(1.0)
        else:
            raise AssertionError("server never became ready on the chip")
        want = run_ref(ref_bin, ["mem", "-l13", idx, str(corpus / "reads.fa")])
        for _ in range(2):
            r = subprocess.run(
                [sys.executable, "-m", "ropebwt3_tpu", "mem", "-l13", idx, str(corpus / "reads.fa")],
                env=env, cwd=ROOT, capture_output=True, timeout=2400,
            )
            assert r.returncode == 0, r.stderr.decode()[-3000:]
            assert r.stdout == want
    finally:
        subprocess.run(
            [sys.executable, "-m", "ropebwt3_tpu", "serve", "--stop", idx],
            env=env, cwd=ROOT, capture_output=True, timeout=120,
        )
        try:
            srv.wait(timeout=60)
        except subprocess.TimeoutExpired:
            srv.kill()


WORKER = r"""
import sys
import numpy as np

from ropebwt3_tpu.formats import fmd
from ropebwt3_tpu.index.dense import DenseFMIndex
from ropebwt3_tpu.ops.smem import BatchedSmemTG
from ropebwt3_tpu.nt6 import char2nt6
from ropebwt3_tpu.seqio import read_seqs

import jax
assert jax.devices()[0].platform != "cpu", jax.devices()

_, syms, lens = fmd.read_fmd(sys.argv[1])
f = DenseFMIndex.from_runs(syms, lens)
qs = [char2nt6(rec.seq) for rec in read_seqs(sys.argv[2])]
packed = BatchedSmemTG(f, min_occ=1, min_len=13, pack=True).run(qs)
unpacked = BatchedSmemTG(f, min_occ=1, min_len=13, pack=False).run(qs)
for a, b in zip(packed, unpacked):
    ka = sorted((m.start, m.end, m.size, m.lo, m.lo_rc) for m in a)
    kb = sorted((m.start, m.end, m.size, m.lo, m.lo_rc) for m in b)
    assert ka == kb, (ka, kb)
print("EQUIV-OK", len(packed), flush=True)
"""


def test_packed_lane_equivalence_on_chip(ref_index, corpus, tmp_path):
    """Packed multi-read lanes == one-read-per-lane on the real chip (the CPU
    suite covers this on XLA:CPU; Mosaic/axon-specific regressions only show
    here)."""
    w = tmp_path / "worker.py"
    w.write_text(WORKER)
    env = tpu_env()
    env["PYTHONPATH"] = f"{ROOT}:{env.get('PYTHONPATH', '')}"
    r = subprocess.run(
        [sys.executable, str(w), str(ref_index), str(corpus / "reads.fa")],
        env=env, capture_output=True, timeout=2400, cwd=ROOT,
    )
    assert r.returncode == 0, r.stderr.decode()[-3000:]
    assert b"EQUIV-OK" in r.stdout
