#!/usr/bin/env python
"""Same-session A/B of the SMEM extend_one variants on the bench workload.

Cross-session chip-pool variance (~13x worst case) makes separate bench.py
runs incomparable; this times both kernels inside one process on one chip.
Variant A = keyed-plane eq/lt circuit (ops/rank.extend_c); variant B = the
previous per-symbol-counts formulation (rank2a + one-hot row select).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench as B  # noqa: E402


def main():
    fa, reads_fa, reads = B.ensure_corpus()
    fmd = B.ensure_index(fa)
    f = B.ensure_dense(fmd)

    import jax
    import jax.numpy as jnp
    from functools import partial

    from ropebwt3_tpu.ops.rank import (
        ASIZE,
        DeviceIndex,
        _EXT_PREFIX,
        extend,
        extend_c,
        rank2a,
        set_intv,
    )
    from ropebwt3_tpu.ops.smem_fsm import smem_fsm

    idx = DeviceIndex.from_dense(f)
    del f

    def counts_extend_c(idx, ik, c, is_back):
        dt = idx.idx_dtype
        ik = ik.astype(dt)
        prim = jnp.where(is_back, ik[..., 0], ik[..., 1])
        tk, tl = rank2a(idx, prim, prim + ik[..., 2])
        sz = tl - tk
        onehot = (jax.lax.broadcasted_iota(jnp.int32, sz.shape, sz.ndim - 1) == c[..., None]).astype(dt)
        szc = jnp.sum(sz * onehot, axis=-1, dtype=dt)
        tkc = jnp.sum(tk * onehot, axis=-1, dtype=dt)
        prim_out = jnp.take(idx.acc, c) + tkc
        sec_in = jnp.where(is_back, ik[..., 1], ik[..., 0])
        wrow = jnp.take(jnp.asarray(_EXT_PREFIX.reshape(-1)), c[..., None] * ASIZE + jnp.arange(ASIZE, dtype=jnp.int32)).astype(dt)
        sec_out = sec_in + jnp.sum(sz * wrow, axis=-1, dtype=dt)
        x0 = jnp.where(is_back, prim_out, sec_out)
        x1 = jnp.where(is_back, sec_out, prim_out)
        return jnp.stack([x0, x1, szc], axis=-1)

    @partial(jax.jit, static_argnames=("variant",))
    def run_fsm(idx, q, seg_off, seg_len, n_seg, *, variant):
        ext1 = {"circuit": extend_c, "counts": counts_extend_c}[variant]
        return smem_fsm(
            lambda ik, back: extend(idx, ik, back),
            lambda c: set_intv(idx, c),
            idx.comp,
            q.astype(jnp.int32),
            jnp.zeros(q.shape[0], jnp.int32),
            idx.idx_dtype,
            min_occ=1,
            min_len=B.MIN_LEN,
            max_mems=64,
            max_iters=32 * 2048 + 64,
            segments=(seg_off, seg_len, n_seg),
            extend_one=lambda ik, c, back: ext1(idx, ik, c, back),
        )

    LANES, LBUF, RCAP = 2048, 2048, 32
    NPL = LBUF // (B.READ_LEN + 1)
    per = LANES * NPL
    so = np.zeros((LANES, RCAP), np.int32)
    sl = np.zeros((LANES, RCAP), np.int32)
    for r in range(NPL):
        so[:, r] = r * (B.READ_LEN + 1)
        sl[:, r] = B.READ_LEN
    chunks = []
    for c0 in range(0, B.N_READS, per):
        got = reads[c0 : c0 + per]
        block = np.zeros((LANES, LBUF), np.uint8)
        ns = np.zeros(LANES, np.int32)
        for t, rd in enumerate(got):
            lane, slot = t % LANES, t // LANES
            block[lane, slot * (B.READ_LEN + 1) : slot * (B.READ_LEN + 1) + B.READ_LEN] = rd
            ns[lane] = max(ns[lane], slot + 1)
        chunks.append((jax.device_put(block), jax.device_put(jnp.asarray(ns))))
    seg_off = jax.device_put(jnp.asarray(so))
    seg_len = jax.device_put(jnp.asarray(sl))

    results = {}
    for variant in ("circuit", "counts", "circuit2"):
        v = variant.rstrip("2")
        t0 = time.time()
        np.asarray(run_fsm(idx, chunks[0][0], seg_off, seg_len, chunks[0][1], variant=v)[1])
        B.log(f"{variant}: warmup/compile {time.time()-t0:.1f}s")
        best, mems = float("inf"), 0
        for p in range(3):
            t0 = time.time()
            tm = 0
            for ch in chunks:
                _, n_mem, _ = run_fsm(idx, ch[0], seg_off, seg_len, ch[1], variant=v)
                tm += int(np.asarray(n_mem).sum())
            dt = time.time() - t0
            B.log(f"{variant} pass {p}: {dt:.2f}s")
            best = min(best, dt)
            mems = tm
        results[variant] = best
        B.log(f"{variant}: best {best:.2f}s = {B.N_READS/best:,.0f} reads/s ({mems} MEMs)")
    print({k: round(v, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
