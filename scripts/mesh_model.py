#!/usr/bin/env python
"""Multi-chip scaling model for the sharded SMEM kernel (VERDICT r2 item 2).

Hardware for N>1 chips is unavailable in this environment, so this script
produces the two things a quantitative prediction needs:

1. GROUND-TRUTH COMMS ACCOUNTING: lower the production sharded step
   (smem_sharded_fn, uniform packing, Q=2048 global lanes) for a (dp, idx)
   virtual mesh and count the all-reduce ops and payload bytes per loop
   iteration straight from the compiled HLO — not from reading the source.

2. ANALYTIC EFFICIENCY TABLE: combine the measured single-chip iteration
   costs (scripts/r3_ab.py, PERF_NOTES round 3) with v5e ICI parameters to
   predict scaling efficiency per (dp, idx) mesh and the psum-latency
   break-even.

Model
-----
Per-iteration cost on one chip of a (dp, idx) mesh:

    T_shard = T_fix + v(table/idx) * Q_dp + T_psum(idx, bytes)

  - Q_dp = Q/dp lanes per dp row (every chip in a dp row holds the same
    lanes; chips along idx hold table slices).
  - v(table) is the measured per-lane per-iteration cost, a function of the
    LOCAL table slice size (the 64M->640M falloff is gather locality and
    PLATEAUS, PERF_NOTES round 2 scale table) — sharding the table over idx
    moves v back toward the 64M value.
  - T_psum(idx, B) = 2*(idx-1)/idx * B / BW_ici + (2*idx-2) * t_hop + T_disp
    (ring all-reduce of B bytes over the idx axis) + the fixed dispatch cost
    of the collective as a fusion break.

Efficiency vs one chip at the same total lane count:
    eff(dp, idx) = T_single / (T_shard) / (dp*idx) * dp ... computed as
    throughput ratio: (dp * Q / T_shard) / (N * Q / T_single), N = dp*idx.

Run: python scripts/mesh_model.py [--t-single-64m US] [--t-single-640m US] ...
"""
import argparse
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, "/root/repo")

# v5e ICI parameters (public: jax-ml.github.io/scaling-book hardware table;
# v5e has a 2D torus, 4 ICI links/chip, ~45 GB/s one-way per link)
ICI_BW = 45e9  # bytes/s one-way per link
T_HOP = 1e-6  # per-hop latency
T_DISP = 10e-6  # collective dispatch / fusion-break cost on the tunneled
# runtime (same order as a gather dispatch, PERF_NOTES round 2 session 5)


def count_allreduce(dp: int, idx: int, Q: int = 2048) -> dict:
    """Lower the production sharded step on a virtual mesh and count
    all-reduces + payload in the while body from the HLO."""
    if len(__import__("jax").devices()) < dp * idx:
        env = dict(os.environ)
        env["PYTHONPATH"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + f" --xla_force_host_platform_device_count={dp * idx}"
        out = subprocess.run([sys.executable, os.path.abspath(__file__), "--count-only", f"--dp={dp}", f"--idx={idx}", f"--q={Q}"], env=env, capture_output=True, text=True)
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    import jax
    import numpy as np

    from ropebwt3_tpu.parallel.mesh import ShardedIndex, make_mesh
    from ropebwt3_tpu.parallel.smem_sharded import smem_sharded_fn
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _toy_index

    mesh = make_mesh(dp, idx, jax.devices()[: dp * idx])
    f, _ = _toy_index(n_seqs=4, L=512)
    sidx = ShardedIndex.from_dense(f, mesh)
    step = smem_sharded_fn(sidx, min_occ=1, min_len=31, max_mems=64, max_iters=4096 * 32 + 64, uniform=True, unroll=2)
    qp = np.zeros((Q, 4096), np.uint8)
    stride = np.full(Q, 151, np.int32)
    rlen = np.full(Q, 150, np.int32)
    n_seg = np.full(Q, 27, np.int32)
    hlo = step.lower(qp, stride, rlen, n_seg).as_text()
    # stablehlo.all_reduce ops (the while body holds `unroll` copies); the
    # result type on the same line gives the payload shape per shard
    # the op carries a reduction region, so its type signature follows the
    # closing brace several lines later — match across lines, lazily
    ars = re.findall(r"stablehlo\.all_reduce.*?->\s*tensor<([0-9x]+)xi(\d+)>", hlo, re.S)
    per_iter = []
    for shape, bits in ars:
        dims = [int(x) for x in shape.split("x") if x]
        nbytes = int(bits) // 8
        for d in dims:
            nbytes *= d
        per_iter.append(nbytes)
    # unroll=2 -> the body contains 2 copies; report per ITERATION
    n_ar = len(per_iter)
    return {
        "dp": dp, "idx": idx, "Q": Q,
        "all_reduces_in_program": n_ar,
        "bytes_each": sorted(set(per_iter), reverse=True),
        "bytes_per_iteration": sum(per_iter) // 2,
        "allreduce_per_iteration": n_ar / 2,
    }


def t_psum(idx: int, B: float) -> float:
    if idx == 1:
        return 0.0
    return 2 * (idx - 1) / idx * B / ICI_BW + (2 * idx - 2) * T_HOP + T_DISP


def model(args):
    # measured single-chip per-iteration costs (uniform kernel, Q=2048,
    # us/iteration) and the per-lane locality slopes derived from them
    t64, t640, t1338 = args.t64, args.t640, args.t1338
    # decompose T = T_fix + v*Q with the measured Q-sweep fixed cost ~8 us
    T_fix = 8.0
    v = {"64M": (t64 - T_fix) / 2048, "640M": (t640 - T_fix) / 2048, "1.34G": (t1338 - T_fix) / 2048}
    # locality: v as a function of LOCAL slice size; the falloff plateaus at
    # >=640M, and a <=160M slice behaves like the 64M point
    def v_local(total: str, idx: int) -> float:
        size = {"64M": 64e6, "640M": 640e6, "1.34G": 1338e6}[total] / idx
        if size <= 192e6:
            return v["64M"]
        if size <= 768e6:
            return v["640M"]
        return v["1.34G"]

    t_single = {"64M": t64, "640M": t640, "1.34G": t1338}
    rows = []
    for scale in ("64M", "640M", "1.34G"):
        for dp, idx in ((2, 1), (4, 1), (8, 1), (24, 1), (1, 2), (1, 4), (2, 4), (8, 4)):
            N = dp * idx
            Q_dp = 2048  # per-dp-row lane count kept at the single-chip optimum
            B = 2 * Q_dp * 6 * 4  # psum payload: (2, Q, 6) int32
            ts = T_fix + v_local(scale, idx) * Q_dp + t_psum(idx, B) * 1e6
            # throughput: dp rows x Q_dp lanes per T_shard vs N chips x
            # (Q lanes per T_single)
            thr_mesh = dp * Q_dp / ts
            thr_ideal = N * 2048 / t_single[scale]
            rows.append((scale, dp, idx, N, round(ts, 1), round(thr_mesh / thr_ideal, 3)))
    return rows


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--count-only", action="store_true")
    ap.add_argument("--dp", type=int, default=2)
    ap.add_argument("--idx", type=int, default=4)
    ap.add_argument("--q", type=int, default=2048)
    # defaults = round-3 measured uniform-kernel numbers (PERF_NOTES)
    ap.add_argument("--t64", type=float, default=59.6)
    ap.add_argument("--t640", type=float, default=135.0)
    ap.add_argument("--t1338", type=float, default=135.0)
    args = ap.parse_args()
    if args.count_only:
        print(json.dumps(count_allreduce(args.dp, args.idx, args.q)))
        sys.exit(0)
    acc = count_allreduce(args.dp, args.idx, args.q)
    print("[comms accounting from compiled HLO]", json.dumps(acc, indent=1))
    print("\n[predicted efficiency] (dp, idx) meshes; eff = mesh throughput / (N x single-chip)")
    print(f"{'scale':>6} {'dp':>3} {'idx':>3} {'N':>3} {'T_shard us':>10} {'efficiency':>10}")
    for r in model(args):
        print(f"{r[0]:>6} {r[1]:>3} {r[2]:>3} {r[3]:>3} {r[4]:>10} {r[5]:>10}")
