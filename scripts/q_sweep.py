#!/usr/bin/env python
"""Large-index SMEM lane-count sweep + sorted-gather probe, ONE TPU attach.

The 640M/1.34G per-iteration cost is gather-latency bound (PERF_NOTES round
2): more lanes per gather op buys memory-level parallelism that the small-Q
config leaves on the table at 64M (where per-op dispatch dominates instead).
This sweeps (Q, LBUF, unroll) on the s640 and mtb13 dense caches within one
process (one attach, compiles amortized), then probes whether SORTING gather
row indices improves HBM row-fetch locality at 480 MB table scale.

Usage: python scripts/q_sweep.py [s640 [mtb13 ...]]
Env: RB3TPU_QS_CONFIGS="2048x4096x1,4096x4096x1,..." RB3TPU_QS_PASSES=3
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import ropebwt3_tpu  # noqa: F401  (hugepage fix)
import jax
import jax.numpy as jnp

from ropebwt3_tpu.index.dense import DenseFMIndex
from ropebwt3_tpu.ops.rank import DeviceIndex
from ropebwt3_tpu.ops.smem import smem_tg_batch

READ_LEN, MIN_LEN, RCAP, M = 150, 31, 32, 64
PASSES = int(os.environ.get("RB3TPU_QS_PASSES", 3))
CFGS = [tuple(int(x) for x in c.split("x")) for c in os.environ.get(
    "RB3TPU_QS_CONFIGS", "2048x4096x2,4096x4096x2,8192x4096x2,4096x4096x1").split(",")]
SCALES = sys.argv[1:] or ["s640"]


def log(m):
    print(f"[qs] {m}", file=sys.stderr, flush=True)


def load(scale):
    z = np.load(f"/root/repo/.bench/{scale}/dense.npz")
    f = DenseFMIndex(bwt=z["bwt"], n=int(z["n"]), acc=z["acc"], occ_block=z["occ_block"], occ_super=z["occ_super"])
    reads = np.load(f"/root/repo/.bench/{scale}/reads.npy")
    return f, reads


def stage(reads, Q, LBUF):
    NPL = min(RCAP, LBUF // (READ_LEN + 1))
    per = Q * NPL
    so = np.zeros((Q, RCAP), np.int32)
    sl = np.zeros((Q, RCAP), np.int32)
    for r in range(NPL):
        so[:, r] = r * (READ_LEN + 1)
        sl[:, r] = READ_LEN
    chunks = []
    for c0 in range(0, len(reads), per):
        got = reads[c0 : c0 + per]
        block = np.zeros((Q, LBUF), np.uint8)
        ns = np.zeros(Q, np.int32)
        for t, rd in enumerate(got):
            lane, slot = t % Q, t // Q
            block[lane, slot * (READ_LEN + 1) : slot * (READ_LEN + 1) + READ_LEN] = rd
            ns[lane] = max(ns[lane], slot + 1)
        chunks.append((jax.device_put(block), jax.device_put(jnp.asarray(ns))))
    jax.block_until_ready([c[0] for c in chunks])
    return chunks, jax.device_put(jnp.asarray(so)), jax.device_put(jnp.asarray(sl))


log(f"platform={jax.devices()[0].platform}")
results = []
for scale in SCALES:
    f, reads = load(scale)
    N = len(reads)
    idx = DeviceIndex.from_dense(f)
    del f
    log(f"{scale}: n-symbols table uploaded")
    for Q, LBUF, UNROLL in CFGS:
        chunks, seg_off, seg_len, = stage(reads, Q, LBUF)
        qlen = jnp.zeros(Q, jnp.int32)

        def run(ch):
            return smem_tg_batch(
                idx, ch[0], qlen, min_occ=1, min_len=MIN_LEN, max_mems=M,
                max_iters=RCAP * LBUF + 64, unroll=UNROLL,
                segments=(seg_off, seg_len, ch[1]),
            )

        t0 = time.time()
        _m, n_mem, it = run(chunks[0])
        n0 = int(np.asarray(n_mem).sum())
        log(f"{scale} Q={Q} LBUF={LBUF} u={UNROLL}: warmup/compile {time.time()-t0:.1f}s")
        best, iters = float("inf"), 0
        for p in range(PASSES):
            t0 = time.time()
            tm, iters = 0, 0
            for ch in chunks:
                mems, n_mem, it = run(ch)
                tm += int(np.asarray(n_mem).sum())
                iters += int(np.asarray(it))
            dt = time.time() - t0
            log(f"{scale} Q={Q} pass {p}: {dt:.2f}s ({N/dt:,.0f} reads/s) mems={tm} iters={iters}")
            best = min(best, dt)
        rec = dict(scale=scale, Q=Q, LBUF=LBUF, unroll=UNROLL, best_s=round(best, 3),
                   reads_per_s=round(N / best), iters=iters, us_per_iter=round(best / iters * 1e6, 1))
        results.append(rec)
        print(f"RESULT {rec}", flush=True)
    del idx

# ---- sorted-gather probe: does index order matter at 480 MB? --------------
if os.environ.get("RB3TPU_QS_PROBE", "1") == "1":
    log("sorted-gather probe on a 10M x 12 int32 table (480 MB)")
    nb = 10_000_000
    tab = jnp.arange(nb * 12, dtype=jnp.int32).reshape(nb, 12)
    rng = np.random.default_rng(0)
    for mode in ("random", "sorted"):
        ixs = rng.integers(0, nb, 4096).astype(np.int32)
        if mode == "sorted":
            ixs = np.sort(ixs)
        ix0 = jnp.asarray(ixs)

        @jax.jit
        def chain(ix, t):
            def body(i, carry):
                ix, acc = carry
                rows = jnp.take(t, ix, axis=0)  # (4096, 12)
                acc = acc + rows[:, 0]
                # dependent fold-back: next indices derive from the rows
                ix = (ix + rows[:, 1] % 7 + 1) % np.int32(nb)
                if mode == "sorted":
                    ix = jnp.sort(ix)
                return ix, acc

            return jax.lax.fori_loop(0, 200, body, (ix, jnp.zeros(4096, jnp.int32)))

        out = chain(ix0, tab)
        np.asarray(out[1])
        t0 = time.time()
        out = chain(ix0, tab)
        np.asarray(out[1])
        dt = time.time() - t0
        print(f"PROBE {mode}: {dt/200*1e6:.0f} us/iter ({4096*200/dt/1e6:.1f} Mrows/s)", flush=True)
