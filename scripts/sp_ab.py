#!/usr/bin/env python
"""Interleaved same-process A/B of the carried-seg-record loop body
(smem_fsm carry_sp) vs the per-iteration seg take, on the .bench corpus.

Both programs compile in ONE process and passes alternate, so chip-pool
variance (up to ~13x across processes) cancels.

Usage: python scripts/sp_ab.py [passes_per_variant]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from ropebwt3_tpu.index.dense import DenseFMIndex
from ropebwt3_tpu.ops.rank import DeviceIndex
from ropebwt3_tpu.ops.smem import smem_tg_batch

PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 3
Q, LBUF, M, RCAP = 2048, 4096, 64, 32
READ_LEN, MIN_LEN = 150, 31
NPL = LBUF // (READ_LEN + 1)
UNROLL = int(os.environ.get("RB3TPU_AB_UNROLL", 2))

D = os.environ.get("RB3TPU_AB_DIR", "/root/repo/.bench")
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
print(f"[ab] platform={jax.devices()[0].platform} unroll={UNROLL}", file=sys.stderr)


def run(ch, carry):
    return smem_tg_batch(
        idx, ch[0], qlen, min_occ=1, min_len=MIN_LEN, max_mems=M,
        max_iters=RCAP * LBUF + 64, unroll=UNROLL,
        segments=(seg_off, seg_len, ch[1]), carry_sp=carry,
    )


best = {False: float("inf"), True: float("inf")}
mems_tot = {}
for carry in (False, True):
    t0 = time.time()
    jax.block_until_ready(run(chunks[0], carry))
    print(f"[ab] carry_sp={carry} compile {time.time()-t0:.1f}s", file=sys.stderr)
for p in range(PASSES):
    for carry in (False, True):
        t0 = time.time()
        tm = 0
        for ch in chunks:
            mems, n_mem, it = run(ch, carry)
            tm += int(np.asarray(n_mem).sum())
        dt = time.time() - t0
        print(f"[ab] pass {p} carry_sp={carry}: {dt:.2f}s ({N/dt:,.0f} reads/s) mems={tm}", file=sys.stderr)
        best[carry] = min(best[carry], dt)
        mems_tot[carry] = tm
assert mems_tot[False] == mems_tot[True], mems_tot
for carry in (False, True):
    print(f"carry_sp={carry}: best {best[carry]:.2f}s = {N/best[carry]:,.0f} reads/s")
