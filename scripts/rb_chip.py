#!/usr/bin/env python
"""Chip validation + timing of the run-aware compressed device rows
(ops/runblock.py) at scale: golden MEM counts vs the native engine and
per-pass wall vs the dense rows on the same reads.

Usage: python scripts/rb_chip.py <scale> [n_reads]   # e.g. mtb13 / big8g
Writes .bench/<scale>/rb_chip.json.
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
    print(f"[rb_chip] {m}", file=sys.stderr, flush=True)


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "mtb13"
    n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    d = os.path.join(ROOT, ".bench", scale)
    from ropebwt3_tpu.cli import load_index
    from ropebwt3_tpu.ops.smem import BatchedSmemTG

    f = load_index(os.path.join(d, "idx.fmd"))
    reads = np.load(os.path.join(d, "reads.npy"))[:n_reads]
    rlist = [np.ascontiguousarray(r) for r in reads]
    log(f"{scale}: n={f.n:,}")

    import jax

    log(f"platform: {jax.devices()[0].platform}")

    res: dict = {"scale": scale, "n": f.n, "n_reads": n_reads}
    outs = {}
    for occ in ("rb", "dense"):
        t0 = time.time()
        eng = BatchedSmemTG(f, min_occ=1, min_len=31, occ=occ)
        if occ == "rb":
            rbx = eng.idx
            rb_bytes = int(rbx.rows.size * 4 + rbx.esc.size * 4)
            res["rb_S"] = int(rbx.S)
            res["rb_bytes"] = rb_bytes
            res["rb_bytes_per_sym"] = round(rb_bytes / f.n, 4)
            res["dense_bytes_per_sym"] = 0.75
            log(f"rb: S={rbx.S} esc_rows={rbx.esc.shape[0]} {rb_bytes/1e9:.3f} GB = {rb_bytes/f.n:.3f} B/sym")
        log(f"{occ}: engine built in {time.time()-t0:.1f}s; warm pass (compile) ...")
        t0 = time.time()
        out = eng.run(rlist)
        log(f"{occ}: first pass {time.time()-t0:.1f}s")
        best = float("inf")
        for p in range(2):
            t0 = time.time()
            out = eng.run(rlist)
            best = min(best, time.time() - t0)
        nm = sum(len(x) for x in out)
        outs[occ] = out
        res[f"{occ}_wall_s"] = round(best, 3)
        res[f"{occ}_reads_per_s"] = round(n_reads / best, 1)
        res[f"{occ}_mems"] = nm
        log(f"{occ}: best {best:.2f}s = {n_reads/best:,.0f} reads/s ({nm} MEMs)")
        del eng
    key = lambda ms: [(m.start, m.end, m.size, m.lo, m.lo_rc) for m in ms]
    assert all(key(a) == key(b) for a, b in zip(outs["rb"], outs["dense"])), "rb != dense MEMs"
    res["byte_equal"] = True
    log("rb == dense: MEM sets identical")
    json.dump(res, open(os.path.join(d, "rb_chip.json"), "w"))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
