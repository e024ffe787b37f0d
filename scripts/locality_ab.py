#!/usr/bin/env python
"""VERDICT r3 item 1a A/B: does locality-shaping the SMEM lane schedule pay?

Arm A: reads staged in input order (production).  Arm B: reads sorted
lexicographically before staging — consecutive sorted reads land in
consecutive LANES (round-robin deal), so at any iteration neighboring lanes
extend near-identical windows and the occf row gathers cluster maximally.
This upper-bounds every cheaper regrouping scheme (in-kernel periodic lane
resorts can only approximate it and pay permutation cost); if B ~= A the
locality-shaping axis is dead on this runtime.

Usage: python scripts/locality_ab.py [scale] [n_reads]
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def log(m):
    print(f"[loc_ab] {m}", file=sys.stderr, flush=True)


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "mtb13"
    n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    d = os.path.join(ROOT, ".bench", scale)
    from ropebwt3_tpu.cli import load_index

    f = load_index(os.path.join(d, "idx.fmd"))
    reads = np.load(os.path.join(d, "reads.npy"))[:n_reads]
    L = reads.shape[1]

    import jax
    import jax.numpy as jnp

    from ropebwt3_tpu.ops.rank import DeviceIndex
    from ropebwt3_tpu.ops.smem import smem_tg_batch

    log(f"platform {jax.devices()[0].platform}, n={f.n:,}")
    idx = DeviceIndex.from_dense(f)
    LANES, LBUF, RCAP, M = 2048, 4096, 32, 64
    NPL = LBUF // (L + 1)
    per = LANES * NPL
    stride_u = jax.device_put(jnp.full((LANES,), L + 1, jnp.int32))
    qlen0 = jnp.zeros(LANES, jnp.int32)

    def stage(rds):
        chunks = []
        for c0 in range(0, len(rds), per):
            got = rds[c0 : c0 + per]
            block = np.zeros((LANES, LBUF), np.uint8)
            ns = np.zeros(LANES, np.int32)
            for t, rd in enumerate(got):
                lane, slot = t % LANES, t // LANES
                block[lane, slot * (L + 1) : slot * (L + 1) + L] = rd
                ns[lane] = max(ns[lane], slot + 1)
            chunks.append((jax.device_put(block), jax.device_put(jnp.asarray(ns))))
        jax.block_until_ready([c[0] for c in chunks])
        return chunks

    def run(ch):
        rlen = jnp.where(ch[1] > 0, jnp.int32(L), jnp.int32(0))
        return smem_tg_batch(
            idx, ch[0], qlen0, min_occ=1, min_len=31, max_mems=M,
            max_iters=RCAP * LBUF + 64, unroll=2,
            uniform_segments=(stride_u, rlen, ch[1]),
        )

    # arm B ordering: lexicographic over read bytes
    order = np.lexsort(reads.T[::-1])
    arms = {"orig": stage(reads), "lex": stage(reads[order])}
    # warm/compile once
    np.asarray(run(arms["orig"][0])[1])
    res = {}
    for p in range(6):
        names = ("lex", "orig") if p % 2 else ("orig", "lex")
        for name in names:
            t0 = time.time()
            tot = 0
            it = 0
            for ch in arms[name]:
                mems, n_mem, iters = run(ch)
                tot += int(np.asarray(n_mem).sum())
                it += int(np.asarray(iters))
            res.setdefault(name, []).append(time.time() - t0)
            res.setdefault(name + "_mems", []).append(tot)
            res.setdefault(name + "_iters", []).append(it)
    out = {"scale": scale, "n_reads": n_reads}
    for name in ("orig", "lex"):
        w = sorted(res[name])[1]
        out[name + "_wall_s"] = round(w, 3)
        out[name + "_reads_per_s"] = round(n_reads / w, 1)
        out[name + "_iters"] = res[name + "_iters"][0]
        log(f"{name}: 2nd-best {w:.2f}s = {n_reads/w:,.0f} r/s iters={res[name+'_iters'][0]} walls={['%.2f' % x for x in res[name]]}")
    assert res["orig_mems"][0] == res["lex_mems"][0]
    out["speedup_lex"] = round(out["orig_wall_s"] / out["lex_wall_s"], 3)
    log(f"lex speedup: {out['speedup_lex']}x")
    json.dump(out, open(os.path.join(d, "locality_ab.json"), "w"))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
