#!/usr/bin/env python
"""Chip A/B of the runblock decode cost structure (VERDICT r4 item 4: rb rows
run 0.61-0.64x dense — find which component pays).

Arms (same reads, same 2048-lane staging as bench.measure_index):
  dense            fused dense rows (baseline)
  rb               production runblock rows (S auto from the sidecar cache)
  rbS<k>           runblock with forced S (fresh build, e.g. rbS256)
  rb-noesc         ablation: skip the escape-plane gather (WRONG results)
  rb-norun         ablation: skip the 64-record scan (WRONG results)

Usage: python scripts/rb_ab.py <scale> [arms...]   # default: all
Writes .bench/<scale>/rb_ab.json.  Run SOLO on the chip.
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
    print(f"[rb_ab] {m}", file=sys.stderr, flush=True)


def measure(idx, reads, passes=3):
    """Same staging/kernel shapes as bench.measure_index, kernel-only."""
    import jax
    import jax.numpy as jnp

    from ropebwt3_tpu.ops.smem import smem_tg_batch

    READ_LEN = reads.shape[1]
    LANES, LBUF, RCAP, M = 2048, 4096, 32, 64
    NPL = LBUF // (READ_LEN + 1)
    per = LANES * NPL
    stride_u = jax.device_put(jnp.full((LANES,), READ_LEN + 1, jnp.int32))
    qlen = jnp.zeros(LANES, jnp.int32)
    chunks = []
    for c0 in range(0, len(reads), per):
        got = reads[c0 : c0 + per]
        block = np.zeros((LANES, LBUF), np.uint8)
        ns = np.zeros(LANES, np.int32)
        for t, rd in enumerate(got):
            lane, slot = t % LANES, t // LANES
            block[lane, slot * (READ_LEN + 1) : slot * (READ_LEN + 1) + READ_LEN] = rd
            ns[lane] = max(ns[lane], slot + 1)
        chunks.append((jax.device_put(block), jax.device_put(jnp.asarray(ns))))
    jax.block_until_ready([c[0] for c in chunks])

    def run(ch):
        rlen = jnp.where(ch[1] > 0, jnp.int32(READ_LEN), jnp.int32(0))
        return smem_tg_batch(
            idx, ch[0], qlen, min_occ=1, min_len=31, max_mems=M,
            max_iters=RCAP * LBUF + 64, unroll=2,
            uniform_segments=(stride_u, rlen, ch[1]),
        )

    t0 = time.time()
    np.asarray(run(chunks[0])[1])
    compile_s = time.time() - t0
    wall, mems = float("inf"), 0
    for _ in range(passes):
        t0 = time.time()
        tm = 0
        for ch in chunks:
            _, n_mem, _ = run(ch)
            tm += int(np.asarray(n_mem).sum())
        dt = time.time() - t0
        if dt < wall:
            wall, mems = dt, tm
    return wall, mems, compile_s


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "mtb13"
    arms = sys.argv[2:] or ["dense", "rb", "rbS256", "rbS1024", "rb-noesc", "rb-norun"]
    d = os.path.join(ROOT, ".bench", scale)
    from ropebwt3_tpu.cli import load_index
    from ropebwt3_tpu.ops import runblock
    from ropebwt3_tpu.ops.rank import DeviceIndex

    f = load_index(os.path.join(d, "idx.fmd"))
    reads = np.load(os.path.join(d, "reads.npy"))
    import jax

    log(f"{scale}: n={f.n:,} platform={jax.devices()[0].platform}")
    res: dict = {"scale": scale, "n": f.n, "n_reads": len(reads)}
    base_mems = None
    for arm in arms:
        if arm == "dense":
            idx = DeviceIndex.from_dense(f)
        elif arm == "rb":
            idx = runblock.from_dense(f)
        elif arm.startswith("rbS"):
            idx = runblock.from_dense(f, S=int(arm[3:]))
        elif arm.startswith("rb-"):
            # ablation: re-trace decode with the component skipped; the jit
            # cache keys on shapes only, so bust it or the cached full
            # program would be reused
            from ropebwt3_tpu.ops.smem import smem_tg_batch as _k

            _k.clear_cache()
            runblock._ABLATE = arm[3:]
            idx = runblock.from_dense(f)
        else:
            raise SystemExit(f"unknown arm {arm}")
        S = getattr(idx, "S", None)
        wall, mems, comp = measure(idx, reads)
        runblock._ABLATE = ""
        ok = base_mems is None or mems == base_mems or arm.startswith("rb-")
        if arm == "dense":
            base_mems = mems
        res[arm] = {"wall_s": round(wall, 3), "reads_per_s": round(len(reads) / wall, 1),
                    "mems": mems, "compile_s": round(comp, 1)}
        if S:
            res[arm]["S"] = int(S)
            res[arm]["bytes_per_sym"] = round((idx.rows.size * 4 + idx.esc.size * 4) / f.n, 4)
        log(f"{arm}: {wall:.2f}s = {len(reads)/wall:,.0f} r/s (compile {comp:.0f}s, mems {mems}{'' if ok else ' MISMATCH'})")
        del idx
    json.dump(res, open(os.path.join(d, "rb_ab.json"), "w"))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
