#!/usr/bin/env python
"""Dependent-chain rank microbench across occ-table layouts, at a chosen
index size.  The SMEM loop's per-iteration cost grows ~65% from a 64M- to a
640M-symbol index (PERF_NOTES.md scale check); this isolates whether fusing
the occ_bits/occ_block gathers into one row cuts that gather-latency share.

Layouts:
  split : (nb,6)u32 bit-planes + (nb,6)u16 block counts (current DeviceIndex)
  fused : (nb,9)u32 — planes + 3 words of packed u16 count pairs
  pad16 : (nb,16)u32 — fused padded to a 64-byte row

Each step gathers rows for 2*Q dependent positions (the extend pattern),
reduces to the 6 counts, and derives the next positions from the result.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    n_sym = int(sys.argv[1]) if len(sys.argv) > 1 else 640_000_000
    import jax
    import jax.numpy as jnp
    from functools import partial

    from ropebwt3_tpu.index.dense import BLOCK, BLOCKS_PER_SUPER

    nb = n_sym // BLOCK
    ns = nb // BLOCKS_PER_SUPER + 1
    rng = np.random.default_rng(0)
    print(f"[layout] nb={nb:,} rows", file=sys.stderr)
    bits = rng.integers(0, 1 << 32, (nb, 6), dtype=np.uint32)
    blk = rng.integers(0, 1 << 16, (nb, 6), dtype=np.uint16)
    sup = rng.integers(0, 1 << 30, (ns, 6), dtype=np.int32)
    fused = np.zeros((nb, 9), dtype=np.uint32)
    fused[:, :6] = bits
    blk32 = blk.astype(np.uint32)
    for i in range(3):
        fused[:, 6 + i] = blk32[:, 2 * i] | (blk32[:, 2 * i + 1] << 16)
    pad16 = np.zeros((nb, 16), dtype=np.uint32)
    pad16[:, :9] = fused

    Q = 2048
    k0 = rng.integers(0, n_sym, (2, Q), dtype=np.int64).astype(np.int32)
    STEPS = 400

    def counts_from(bits_rows, blk_rows, off):
        # stand-in for _inblock_counts + base: mix planes and counts into 6 lanes
        acc = blk_rows.astype(jnp.int32)
        m = (jnp.uint32(1) << jnp.clip(off, 0, 31).astype(jnp.uint32)) - jnp.uint32(1)
        for p in range(6):
            acc = acc + jax.lax.population_count(bits_rows[..., p:p+1] & m[..., None]).astype(jnp.int32)
        return acc

    @partial(jax.jit, static_argnames=("layout",))
    def chain(bits_d, blk_d, sup_d, k, *, layout):
        def body(i, k):
            bi = k // BLOCK
            si = bi // BLOCKS_PER_SUPER
            off = k % BLOCK
            if layout == "split":
                br = bits_d[bi]
                cr = blk_d[bi].astype(jnp.uint32)
            else:
                row = bits_d[bi]
                br = row[..., :6]
                pk = row[..., 6:9]
                lo = pk & jnp.uint32(0xFFFF)
                hi = pk >> jnp.uint32(16)
                cr = jnp.stack([lo[..., 0], hi[..., 0], lo[..., 1], hi[..., 1], lo[..., 2], hi[..., 2]], axis=-1)
            c6 = counts_from(br, cr, off) + sup_d[si]
            nxt = (jnp.sum(c6, axis=-1) * jnp.int32(-1640531527) + k) % jnp.int32(n_sym)
            return jnp.abs(nxt)
        return jax.lax.fori_loop(0, STEPS, body, k)

    tables = {
        "split": (jnp.asarray(bits), jnp.asarray(blk), jnp.asarray(sup)),
        "fused": (jnp.asarray(fused), None, jnp.asarray(sup)),
        "pad16": (jnp.asarray(pad16), None, jnp.asarray(sup)),
    }
    kd = jnp.asarray(k0)
    for name, (b_d, c_d, s_d) in tables.items():
        c_arg = c_d if c_d is not None else b_d
        t0 = time.time()
        np.asarray(chain(b_d, c_arg, s_d, kd, layout="split" if name == "split" else "fused"))
        print(f"[layout] {name}: compile+1 {time.time()-t0:.1f}s", file=sys.stderr)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            np.asarray(chain(b_d, c_arg, s_d, kd, layout="split" if name == "split" else "fused"))
            best = min(best, time.time() - t0)
        print(f"{name}: {best/STEPS*1e6:.1f} us/step ({best:.2f}s / {STEPS} steps)")


if __name__ == "__main__":
    main()
