"""Batched SMEM-TG on device — the flagship query kernel.

The Travis-Gagie long-MEM algorithm (fm-index.c:483-528, paper Algorithm 4) is
a per-read state machine over bidirectional-extend steps.  Here every read is
a *lane*: each global iteration performs one vectorized resolve (no memory
traffic) plus one batched extend (two rank gathers) for every active lane, in
lock-step under `lax.while_loop`.  Control flow is data-independent — phases
are integers selected with `where` — so XLA compiles a single fused loop body.
The FSM itself lives in ops/smem_fsm.py and is shared with the sharded
multi-chip path (parallel/).
"""

from __future__ import annotations

from functools import partial

from .. import _jax_setup as __jx
__jx()
import jax
import jax.numpy as jnp
import numpy as np

from ..index.dense import DenseFMIndex
from .rank import DeviceIndex, extend, set_intv
from .smem_fsm import smem_fsm
from .smem_ref import Mem


@partial(jax.jit, static_argnames=("min_occ", "min_len", "max_mems", "max_iters", "unroll", "seed_k"))
def smem_tg_batch(
    idx: DeviceIndex,
    q: jax.Array,  # (Q, L) uint8, 0-padded
    qlen: jax.Array,  # (Q,) int32
    *,
    min_occ: int,
    min_len: int,
    max_mems: int,
    max_iters: int,
    unroll: int = 1,
    seed_tab: jax.Array | None = None,
    seed_k: int = 0,
):
    """Returns (mems (Q, max_mems, 5) idx_dtype, n_mem (Q,) int32, iters)."""
    return smem_fsm(
        lambda ik, back: extend(idx, ik, back),
        lambda c: set_intv(idx, c),
        idx.comp,
        q.astype(jnp.int32),
        qlen,
        idx.idx_dtype,
        min_occ=min_occ,
        min_len=min_len,
        max_mems=max_mems,
        max_iters=max_iters,
        unroll=unroll,
        seed_tab=seed_tab,
        seed_k=seed_k,
    )


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class BatchedSmemTG:
    """Host-side driver: pads reads into fixed-shape batches, runs the jitted
    kernel, unpacks Mem lists.  Lane count is fixed per length bucket (L is
    bucketed to powers of two) so each bucket compiles exactly once; large
    inputs stream through in chunks."""

    def __init__(
        self,
        f: DenseFMIndex,
        min_occ: int = 1,
        min_len: int = 19,
        max_mems: int | None = None,
        lanes: int = 8192,
        use_pallas: bool | None = None,
        unroll: int | None = None,
        seed_k: int | None = None,
    ):
        self.idx = DeviceIndex.from_dense(f)
        self._dense = f  # host-side fallback for per-read overflow reruns
        self.min_occ = int(min_occ)
        self.min_len = int(min_len)
        self.max_mems = max_mems
        self.lanes = lanes
        if use_pallas is None:
            # Measured on the tunneled v5e, the fused Pallas body loses to the
            # XLA FSM (per-call buffer DMA setup dominates its saved
            # dispatches), so the XLA path is the default; the Pallas kernel
            # stays available (and correctness-tested) for future tuning.
            use_pallas = False
        self.use_pallas = use_pallas and self.idx.idx_dtype == jnp.int32
        self.unroll = int(unroll) if unroll is not None else 1
        if seed_k is None:
            # k-mer seed table: skips k-1 backward extends per window attempt
            # (bit-identical; see ops/seed.py).  ~12 is the memory/benefit
            # sweet spot (4**12 rows); always bounded by min_len - 1.
            seed_k = 12
        self.seed_k = max(0, min(int(seed_k), self.min_len - 1))
        self.seed_tab = None
        if self.seed_k >= 4 and not self.use_pallas:
            from .seed import build_seed_table

            self.seed_tab = build_seed_table(self.idx, self.seed_k)
        else:
            self.seed_k = 0

    def _run_chunk(self, queries: list[np.ndarray], L: int) -> list[list[Mem]]:
        Q = len(queries)
        # scale lanes down for long reads so q + mems stay within HBM budget;
        # cap the per-lane MEM buffer (overflowing reads rerun on host)
        lanes = max(256, min(self.lanes, self.lanes * 512 // max(512, L)))
        Qp = min(lanes, _round_up(Q, 256))
        out: list[list[Mem]] = []
        M = self.max_mems if self.max_mems else min(256, max(4, L - self.min_len + 1))
        if self.use_pallas:
            from .smem_pallas import smem_tg_pallas

            kernel = lambda *a, **kw: smem_tg_pallas(*a, **kw)
            M = self.max_mems if self.max_mems else min(32, max(4, L - self.min_len + 1))
        else:
            kernel = smem_tg_batch
        for c0 in range(0, Q, Qp):
            chunk = queries[c0 : c0 + Qp]
            qarr = np.zeros((Qp, L), dtype=np.uint8)
            qlen = np.zeros(Qp, dtype=np.int32)
            for t, qq in enumerate(chunk):
                qarr[t, : len(qq)] = qq
                qlen[t] = len(qq)
            kw = {}
            if not self.use_pallas:
                kw = dict(unroll=self.unroll, seed_tab=self.seed_tab, seed_k=self.seed_k)
            mems, n_mem, _ = kernel(
                self.idx,
                jnp.asarray(qarr),
                jnp.asarray(qlen),
                min_occ=self.min_occ,
                min_len=self.min_len,
                max_mems=M,
                max_iters=4 * L + 64,
                **kw,
            )
            mems = np.asarray(mems[: len(chunk)])
            n_mem = np.asarray(n_mem[: len(chunk)])
            for t in range(len(chunk)):
                if n_mem[t] > M:  # buffer overflow: recompute this read on host
                    from . import smem_ref

                    out.append(smem_ref.smem_tg(self._dense, chunk[t], self.min_occ, self.min_len))
                else:
                    out.append([Mem(int(r[0]), int(r[1]), int(r[2]), int(r[3]), int(r[4])) for r in mems[t, : n_mem[t]]])
        return out

    def run(self, queries: list[np.ndarray]) -> list[list[Mem]]:
        if not queries:
            return []
        # bucket by padded length; keep original order on output
        order = sorted(range(len(queries)), key=lambda t: len(queries[t]))
        buckets: dict[int, list[int]] = {}
        for t in order:
            L = max(64, 1 << (max(1, len(queries[t]) - 1)).bit_length())
            buckets.setdefault(L, []).append(t)
        results: list[list[Mem] | None] = [None] * len(queries)
        for L, idxs in buckets.items():
            outs = self._run_chunk([queries[t] for t in idxs], L)
            for t, o in zip(idxs, outs):
                results[t] = o
        return results  # type: ignore[return-value]
