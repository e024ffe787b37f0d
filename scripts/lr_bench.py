#!/usr/bin/env python
"""Long-read (HiFi-like) SMEM throughput on the bench index: TPU packed
kernel (32 KB lane buffers) and native host engine vs the reference binary.

Usage: python scripts/lr_bench.py [n_reads] [read_len] [engine]
  engine: tpu | native | ref | all (default all)
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench as B  # noqa: E402

N_READS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
READ_LEN = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
ENGINE = sys.argv[3] if len(sys.argv) > 3 else "all"
MIN_LEN = 31
ERR = 0.01


def main():
    fa, _, _ = B.ensure_corpus()
    fmd = B.ensure_index(fa)
    rng = np.random.default_rng(42)
    base = np.frombuffer(open(fa, "rb").read().split(b"\n", 2)[1], np.uint8)
    tab = np.zeros(256, np.uint8)
    for i, ch in enumerate(b"$ACGTN"):
        tab[ch] = i
    base = tab[base]
    starts = rng.integers(0, len(base) - READ_LEN, N_READS)
    reads = base[starts[:, None] + np.arange(READ_LEN)]
    err = rng.random(reads.shape) < ERR
    reads = np.where(err, rng.integers(1, 5, reads.shape), reads).astype(np.uint8)
    lr_fa = os.path.join(B.BENCH, f"lr_{N_READS}x{READ_LEN}.fa")
    if not os.path.exists(lr_fa):
        alpha = np.frombuffer(b"$ACGTN", np.uint8)
        with open(lr_fa, "w") as f:
            for i, r in enumerate(reads):
                f.write(f">lr{i}\n{alpha[r].tobytes().decode()}\n")

    mbp = N_READS * READ_LEN / 1e6
    if ENGINE in ("ref", "all"):
        ref = B.ensure_ref_bin()
        ncpu = os.cpu_count() or 4
        t0 = time.time()
        subprocess.run([ref, "mem", f"-t{ncpu}", f"-l{MIN_LEN}", fmd, lr_fa], check=True, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        dt = time.time() - t0
        print(f"reference -t{ncpu}: {dt:.2f}s = {mbp/dt:.1f} Mbp/s")

    f = B.ensure_dense(fmd)
    qs = [reads[i] for i in range(N_READS)]

    if ENGINE in ("native", "all"):
        from ropebwt3_tpu.ops.smem_native import smem_tg_batch_native

        t0 = time.time()
        out = smem_tg_batch_native(f, qs, 1, MIN_LEN)
        dt = time.time() - t0
        nm = sum(len(o) for o in out)
        print(f"native host: {dt:.2f}s = {mbp/dt:.1f} Mbp/s ({nm} MEMs)")

    if ENGINE in ("tpu", "all", "hybrid"):
        from ropebwt3_tpu.ops.smem import BatchedSmemTG

        eng = BatchedSmemTG(f, min_occ=1, min_len=MIN_LEN)
        B.log("tpu warmup/compile ...")
        eng.run(qs[:64])
        best = float("inf")
        for p in range(2):
            t0 = time.time()
            out = eng.run(qs)
            best = min(best, time.time() - t0)
        nm = sum(len(o) for o in out)
        print(f"tpu packed kernel: {best:.2f}s = {mbp/best:.1f} Mbp/s ({nm} MEMs)")

    if ENGINE in ("hybrid", "all"):
        # measured chip+host split on long reads (mem --engine=hybrid)
        import threading

        from ropebwt3_tpu.ops.smem_native import smem_tg_flat_native

        flat = np.ascontiguousarray(reads.reshape(-1))
        offs = np.arange(N_READS + 1, dtype=np.int64) * READ_LEN
        tn = time.time()
        smem_tg_flat_native(f, flat, offs, 1, MIN_LEN)
        tn = time.time() - tn
        share = (1 / best) / (1 / best + 1 / tn)
        nd = int(N_READS * share)
        sub = np.ascontiguousarray(flat[nd * READ_LEN :])
        offs_h = np.arange(N_READS - nd + 1, dtype=np.int64) * READ_LEN
        hbest = float("inf")
        for p in range(2):
            th = threading.Thread(target=lambda: eng.run(qs[:nd]))
            t0 = time.time()
            th.start()
            smem_tg_flat_native(f, sub, offs_h, 1, MIN_LEN)
            th.join()
            hbest = min(hbest, time.time() - t0)
        print(f"hybrid (dev share {nd/N_READS:.2f}): {hbest:.2f}s = {mbp/hbest:.1f} Mbp/s")


if __name__ == "__main__":
    main()
