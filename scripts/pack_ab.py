#!/usr/bin/env python
"""A/B the packed-SMEM kernel's (Q, Lbuf) shape on the .bench corpus.

Usage: python scripts/pack_ab.py Q LBUF [M] [passes]

Same staging as bench.py (round-robin deal of the 100k x 150bp reads into
Q lanes x NPL slots of LBUF bytes), so numbers are directly comparable with
the official bench line.  Each new (Q, LBUF, M) combo is a fresh XLA program
on the tunneled TPU (2 s-40 min compile) — pass 0 absorbs it; report best-of.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from ropebwt3_tpu.index.dense import DenseFMIndex
from ropebwt3_tpu.ops.rank import DeviceIndex
from ropebwt3_tpu.ops.smem import smem_tg_batch

Q = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
LBUF = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
M = int(sys.argv[3]) if len(sys.argv) > 3 else 64
PASSES = int(sys.argv[4]) if len(sys.argv) > 4 else 3
READ_LEN, MIN_LEN, RCAP = 150, 31, 32
NPL = min(RCAP, LBUF // (READ_LEN + 1))

import os

D = os.environ.get("RB3TPU_AB_DIR", "/root/repo/.bench")  # e.g. .bench/big640
z = np.load(f"{D}/dense.npz")
f = DenseFMIndex(bwt=z["bwt"], n=int(z["n"]), acc=z["acc"], occ_block=z["occ_block"], occ_super=z["occ_super"])
reads = np.load(f"{D}/reads.npy")
N = len(reads)
idx = DeviceIndex.from_dense(f)
del f

per = Q * NPL
so = np.zeros((Q, RCAP), np.int32)
sl = np.zeros((Q, RCAP), np.int32)
for r in range(NPL):
    so[:, r] = r * (READ_LEN + 1)
    sl[:, r] = READ_LEN
chunks = []
for c0 in range(0, N, per):
    got = reads[c0 : c0 + per]
    block = np.zeros((Q, LBUF), np.uint8)
    ns = np.zeros(Q, np.int32)
    for t, rd in enumerate(got):
        lane, slot = t % Q, t // Q
        block[lane, slot * (READ_LEN + 1) : slot * (READ_LEN + 1) + READ_LEN] = rd
        ns[lane] = max(ns[lane], slot + 1)
    chunks.append((jax.device_put(block), jax.device_put(jnp.asarray(ns))))
seg_off = jax.device_put(jnp.asarray(so))
seg_len = jax.device_put(jnp.asarray(sl))
qlen = jnp.zeros(Q, jnp.int32)
jax.block_until_ready([c[0] for c in chunks])
print(f"[ab] Q={Q} LBUF={LBUF} NPL={NPL} M={M} chunks={len(chunks)} platform={jax.devices()[0].platform}", file=sys.stderr)


UNROLL = int(os.environ.get("RB3TPU_AB_UNROLL", 1))
SEED_K = int(os.environ.get("RB3TPU_AB_SEED", 0))
seed_tab = None
if SEED_K:
    from ropebwt3_tpu.ops.seed import build_seed_table

    t0 = time.time()
    seed_tab = build_seed_table(idx, SEED_K)
    jax.block_until_ready(seed_tab)
    print(f"[ab] seed table k={SEED_K}: {time.time()-t0:.1f}s", file=sys.stderr)


def run(ch):
    return smem_tg_batch(
        idx, ch[0], qlen, min_occ=1, min_len=MIN_LEN, max_mems=M,
        max_iters=RCAP * LBUF + 64, unroll=UNROLL,
        seed_tab=seed_tab, seed_k=SEED_K,
        segments=(seg_off, seg_len, ch[1]),
    )


t0 = time.time()
jax.block_until_ready(run(chunks[0]))
print(f"[ab] warmup/compile {time.time()-t0:.1f}s", file=sys.stderr)
best = float("inf")
for p in range(PASSES):
    t0 = time.time()
    tm = 0
    for ch in chunks:
        mems, n_mem, it = run(ch)
        tm += int(np.asarray(n_mem).sum())
    dt = time.time() - t0
    print(f"[ab] pass {p}: {dt:.2f}s ({N/dt:,.0f} reads/s) mems={tm}", file=sys.stderr)
    best = min(best, dt)
print(f"Q={Q} LBUF={LBUF} M={M}: best {best:.2f}s = {N/best:,.0f} reads/s")
