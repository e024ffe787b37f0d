#!/usr/bin/env python
"""Same-process A/B of the long-read packed-kernel config (M, Q): chip-pool
assignment varies up to ~13x between processes, so only same-process
comparisons are meaningful.  Each config compiles once (warmup) then times
best-of-2.

Usage: python scripts/lr_ab.py [n_reads] [read_len]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench as B  # noqa: E402

N_READS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
READ_LEN = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
MIN_LEN = 31

CONFIGS = [
    ("M256_Q256", {"RB3TPU_PACK_Q": "256"}),
    ("M256_Q128", {"RB3TPU_PACK_Q": "128"}),
    ("M256_Q64", {"RB3TPU_PACK_Q": "64"}),
    ("M96_Q256", {"RB3TPU_LR_M": "96", "RB3TPU_PACK_Q": "256"}),
]


def main():
    fa, _, _ = B.ensure_corpus()
    fmd = B.ensure_index(fa)
    f = B.ensure_dense(fmd)
    rng = np.random.default_rng(42)
    base = np.frombuffer(open(fa, "rb").read().split(b"\n", 2)[1], np.uint8)
    tab = np.zeros(256, np.uint8)
    for i, ch in enumerate(b"$ACGTN"):
        tab[ch] = i
    base = tab[base]
    starts = rng.integers(0, len(base) - READ_LEN, N_READS)
    reads = base[starts[:, None] + np.arange(READ_LEN)]
    err = rng.random(reads.shape) < 0.01
    reads = np.where(err, rng.integers(1, 5, reads.shape), reads).astype(np.uint8)
    qs = [reads[i] for i in range(N_READS)]
    mbp = N_READS * READ_LEN / 1e6

    from ropebwt3_tpu.ops.smem import BatchedSmemTG

    eng = BatchedSmemTG(f, min_occ=1, min_len=MIN_LEN)
    results = {}
    for name, envs in CONFIGS:
        for k, v in envs.items():
            os.environ[k] = v
        try:
            t0 = time.time()
            out = eng.run(qs[:64])  # warmup/compile this config's shape
            print(f"[{name}] warmup {time.time()-t0:.1f}s", flush=True)
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                out = eng.run(qs)
                best = min(best, time.time() - t0)
            nm = sum(len(o) for o in out)
            results[name] = (best, nm)
            print(f"[{name}] {best:.2f}s = {mbp/best:.1f} Mbp/s ({nm} MEMs)", flush=True)
        finally:
            for k in envs:
                os.environ.pop(k, None)
    print({k: round(v[0], 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
