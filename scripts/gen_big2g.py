#!/usr/bin/env python
"""Generate a >2^31-symbol corpus: N_GENOMES mutated copies of a random
GENOME_LEN genome (same recipe as bench.py, scaled up).  Double-strand BWT
symbol count = 2 * N_GENOMES * (GENOME_LEN + 1) ~ 2.4e9 > 2^31, exercising
the int64 index paths (DeviceIndex megablock occf, native engine, formats).

Usage: python scripts/gen_big2g.py [outdir]  (default .bench/big2g)
"""

import os
import sys

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
import numpy as np

N_GENOMES = 24
GENOME_LEN = 50_000_000
DIVERGENCE = 0.01
N_READS = 100_000
READ_LEN = 150
READ_ERR = 0.01
SEED = 20260818

out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench", "big2g")
os.makedirs(out, exist_ok=True)
fa = os.path.join(out, "genomes.fa")
reads_fa = os.path.join(out, "reads.fa")

rng = np.random.default_rng(SEED)
alpha = np.frombuffer(b"$ACGTN", dtype=np.uint8)
base = rng.integers(1, 5, GENOME_LEN).astype(np.uint8)

n_sym = 2 * N_GENOMES * (GENOME_LEN + 1)
print(f"[gen] {N_GENOMES} x {GENOME_LEN/1e6:.0f} Mbp -> {n_sym:,} BWT symbols (2^31 = {1<<31:,})", flush=True)

with open(fa, "w", buffering=1 << 22) as f:
    for i in range(N_GENOMES):
        s = base.copy()
        mut = rng.random(GENOME_LEN) < DIVERGENCE
        s[mut] = rng.integers(1, 5, int(mut.sum()))
        f.write(f">g{i}\n")
        f.write(alpha[s].tobytes().decode())
        f.write("\n")
        print(f"[gen] genome {i} done", flush=True)

starts = rng.integers(0, GENOME_LEN - READ_LEN, N_READS)
reads = base[starts[:, None] + np.arange(READ_LEN)]
err = rng.random(reads.shape) < READ_ERR
reads = np.where(err, rng.integers(1, 5, reads.shape), reads).astype(np.uint8)
with open(reads_fa, "w", buffering=1 << 22) as f:
    for i, r in enumerate(reads):
        f.write(f">r{i}\n")
        f.write(alpha[r].tobytes().decode())
        f.write("\n")
print("[gen] reads done", flush=True)
