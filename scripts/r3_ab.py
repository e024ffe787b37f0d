#!/usr/bin/env python
"""Round-3 same-session kernel A/B: general packed vs uniform-stride (and
optional prefix-occ / dual-population variants) on the .bench corpus.

Usage: python scripts/r3_ab.py [variants...] [-- passes]
  variants: general uniform (default: both)
Env: RB3TPU_AB_DIR (default /root/repo/.bench), RB3TPU_AB_UNROLL (default 2).

All variants run interleaved in ONE process/attach so chip-pool variance
cancels; each variant's pass 0 absorbs its compile.  Outputs are checked
equal across variants (same MEM count).
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
from ropebwt3_tpu.ops.smem import smem_tg_batch, smem_tg_batch_dual

variants = [a for a in sys.argv[1:] if not a.isdigit()] or ["general", "uniform"]
PASSES = int(sys.argv[-1]) if sys.argv[-1:] and sys.argv[-1].isdigit() else 3
Q, LBUF, M = 2048, 4096, 64
READ_LEN, MIN_LEN, RCAP = 150, 31, 32
NPL = min(RCAP, LBUF // (READ_LEN + 1))
UNROLL = int(os.environ.get("RB3TPU_AB_UNROLL", 2))

D = os.environ.get("RB3TPU_AB_DIR", "/root/repo/.bench")
z = np.load(f"{D}/dense.npz")
f = DenseFMIndex(bwt=z["bwt"], n=int(z["n"]), acc=z["acc"], occ_block=z["occ_block"], occ_super=z["occ_super"])
reads = np.load(f"{D}/reads.npy")
N = len(reads)
idx = DeviceIndex.from_dense(f)
pidx = DeviceIndex.from_dense(f, prefix=True) if any(v.startswith("uprefix") for v in variants) else None
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
stride_u = jax.device_put(jnp.full((Q,), READ_LEN + 1, jnp.int32))
jax.block_until_ready([c[0] for c in chunks])
print(f"[ab] Q={Q} LBUF={LBUF} M={M} unroll={UNROLL} chunks={len(chunks)} platform={jax.devices()[0].platform} variants={variants}", file=sys.stderr)

args = dict(min_occ=1, min_len=MIN_LEN, max_mems=M, max_iters=RCAP * LBUF + 64, unroll=UNROLL)


def run_general(ch):
    return smem_tg_batch(idx, ch[0], qlen, segments=(seg_off, seg_len, ch[1]), **args)


def run_uniform(ch):
    rlen = jnp.where(ch[1] > 0, jnp.int32(READ_LEN), jnp.int32(0))
    return smem_tg_batch(idx, ch[0], qlen, uniform_segments=(stride_u, rlen, ch[1]), **args)


def run_uprefix(ch):
    rlen = jnp.where(ch[1] > 0, jnp.int32(READ_LEN), jnp.int32(0))
    return smem_tg_batch(pidx, ch[0], qlen, uniform_segments=(stride_u, rlen, ch[1]), **args)


RUNNERS = {"general": run_general, "uniform": run_uniform, "uprefix": run_uprefix}


def pass_dual(which_idx):
    """One pass over ALL chunks via the dual kernel (pairs of chunks per
    program; odd tail falls back to single)."""
    tm = 0
    i = 0
    while i < len(chunks):
        if i + 1 < len(chunks):
            (a, b) = chunks[i], chunks[i + 1]
            ua = (stride_u, jnp.where(a[1] > 0, jnp.int32(READ_LEN), jnp.int32(0)), a[1])
            ub = (stride_u, jnp.where(b[1] > 0, jnp.int32(READ_LEN), jnp.int32(0)), b[1])
            (ma, na), (mb, nb), _ = smem_tg_batch_dual(which_idx, a[0], ua, b[0], ub, **args)
            tm += int(np.asarray(na).sum()) + int(np.asarray(nb).sum())
            i += 2
        else:
            ch = chunks[i]
            rlen = jnp.where(ch[1] > 0, jnp.int32(READ_LEN), jnp.int32(0))
            _, n_mem, _ = smem_tg_batch(which_idx, ch[0], qlen, uniform_segments=(stride_u, rlen, ch[1]), **args)
            tm += int(np.asarray(n_mem).sum())
            i += 1
    return tm

iters: dict = {}


def full_pass(v):
    if v == "udual":
        return pass_dual(idx)
    if v == "uprefix_dual":
        return pass_dual(pidx)
    tm = 0
    iters[v] = 0
    for ch in chunks:
        mems, n_mem, it = RUNNERS[v](ch)
        tm += int(np.asarray(n_mem).sum())
        iters[v] += int(it)
    return tm


for v in variants:
    t0 = time.time()
    full_pass(v)
    print(f"[ab] {v}: warmup/compile {time.time()-t0:.1f}s", file=sys.stderr)

best = {v: float("inf") for v in variants}
mems_seen = {}
for p in range(PASSES):
    for v in variants:
        t0 = time.time()
        tm = full_pass(v)
        dt = time.time() - t0
        print(f"[ab] pass {p} {v}: {dt:.2f}s ({N/dt:,.0f} reads/s) mems={tm}", file=sys.stderr)
        best[v] = min(best[v], dt)
        mems_seen.setdefault(v, tm)
assert len(set(mems_seen.values())) == 1, mems_seen
for v in variants:
    extra = f" ({best[v]/iters[v]*1e6:.1f} us/iter x {iters[v]} iters)" if iters.get(v) else ""
    print(f"{v}: best {best[v]:.2f}s = {N/best[v]:,.0f} reads/s{extra}")
