#!/usr/bin/env python
"""Device-sw (align/sw_jax.py) vs native sw throughput on the bench index.

Usage: python scripts/sw_jax_bench.py [n_reads] [read_len]"""
import os, sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import bench as B

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
L = int(sys.argv[2]) if len(sys.argv) > 2 else 150

fa, _, _ = B.ensure_corpus()
fmd = B.ensure_index(fa)
f = B.ensure_dense(fmd)
rng = np.random.default_rng(42)
base = np.frombuffer(open(fa, "rb").read().split(b"\n", 2)[1], np.uint8)
tab = np.zeros(256, np.uint8)
for i, ch in enumerate(b"$ACGTN"):
    tab[ch] = i
base = tab[base]
starts = rng.integers(0, len(base) - L, N)
reads = base[starts[:, None] + np.arange(L)]
err = rng.random(reads.shape) < 0.01
reads = np.where(err, rng.integers(1, 5, reads.shape), reads).astype(np.uint8)
qs = [reads[i] for i in range(N)]

from ropebwt3_tpu.align.bwasw import SwOpt, rb3_sw_batch
from ropebwt3_tpu.align.sw_jax import SwDeviceEngine

opt = SwOpt()
t0 = time.time()
nat = rb3_sw_batch(opt, f, qs)
print(f"native sw: {time.time()-t0:.2f}s = {N/(time.time()-t0):,.0f} reads/s", flush=True)

eng = SwDeviceEngine(f, opt, lanes=256)
t0 = time.time()
dev = eng.run(qs[:256])
print(f"device warmup (256 reads, incl. compiles): {time.time()-t0:.1f}s", flush=True)
best = 1e9
for p in range(2):
    t0 = time.time()
    dev = eng.run(qs)
    best = min(best, time.time() - t0)
print(f"device sw: {best:.2f}s = {N/best:,.0f} reads/s", flush=True)
def sig(h):
    return [(x.score, x.lo, x.hi, tuple(x.cigar)) for x in h]
mism = sum(1 for a, b in zip(nat, dev) if sig(a) != sig(b))
print(f"mismatches: {mism}/{N}", flush=True)
