"""Pallas single-kernel SMEM-TG loop body.

The pure-XLA FSM (ops/smem_fsm.py) spends ~100 small kernel dispatches per
iteration; on TPU that overhead dominates the actual rank work by >100x.  Here
the entire per-iteration state update — bidirectional extend math (bit-plane
popcount rank), FSM transitions, set_intv resolution, and the next-iteration
resolve — runs as ONE Pallas kernel on VMEM-resident lane state.  The XLA glue
per iteration is minimal: five flat 1-D table gathers (the fast hardware
gather path, no transposes), the emit select, and the loop condition.

Iteration order is [transitions; resolve] with a resolve-only first iteration
(all lanes start inactive), which reproduces ops/smem_fsm.py's
[resolve; extend] sequence exactly, one iteration offset.

The kernel outputs the five query positions whose symbols the next iteration
might need (extend symbol, FWD-fail set_intv, and the 3 ways a lane can
(re)enter START) so XLA prefetches them with one stacked gather.

Lane state is shaped (R, 128) (R = Q/128) for native VPU tiling; 6-column
data is (6, R, 128).  All bit math is int32 (Mosaic recurses lowering uint32
converts) and all scalar constants are np.int32 (bare Python ints become i64
under x64, another lowering recursion).
"""

from __future__ import annotations

import sys
from functools import partial

from .. import _jax_setup as __jx

# tracing the fused loop body builds a deep Python expression graph
if sys.getrecursionlimit() < 20000:
    sys.setrecursionlimit(20000)

__jx()
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..index.dense import BLOCK, BLOCKS_PER_SUPER
from .rank import DeviceIndex

PH_START, PH_BACK1, PH_FWD, PH_BACK2, PH_DONE = 0, 1, 2, 3, 4
_EXT_ORDER = (0, 4, 3, 2, 1, 5)
_I_START, _I_BACK1, _I_FWD, _I_BACK2, _I_DONE = (np.int32(v) for v in range(5))
_I_ONE, _I_ZERO = np.int32(1), np.int32(0)
# position slots in the stacked symbol prefetch
P_EXT, P_FAIL, P_A, P_B, P_C = range(5)


def _inblock6(bits, off):
    """bits: list of 6 (R,128) int32 bit-plane words; off: (R,128) int32 in
    [0,64]. Returns list of 6 (R,128) int32 symbol counts before off."""
    one = np.int32(1)
    full = np.int32(-1)
    off_lo = jnp.minimum(off, 32)
    off_hi = jnp.maximum(off - 32, np.int32(0))
    # (1<<31)-1 wraps to 0x7fffffff, exactly the 31-bit mask; shift-by-32 is
    # clamped to 31 and discarded by the where
    mask_lo = jnp.where(off_lo >= 32, full, (one << jnp.minimum(off_lo, np.int32(31))) - one)
    mask_hi = jnp.where(off_hi >= 32, full, (one << jnp.minimum(off_hi, np.int32(31))) - one)
    from .rank import KEY

    out = []
    for c in range(6):
        kc = int(KEY[c])  # planes hold keyed (complement-order) symbols
        eq_lo = mask_lo
        eq_hi = mask_hi
        for plane in range(3):
            if (kc >> plane) & 1:
                eq_lo = eq_lo & bits[plane * 2]
                eq_hi = eq_hi & bits[plane * 2 + 1]
            else:
                eq_lo = eq_lo & ~bits[plane * 2]
                eq_hi = eq_hi & ~bits[plane * 2 + 1]
        out.append((jax.lax.population_count(eq_lo) + jax.lax.population_count(eq_hi)).astype(jnp.int32))
    return out


# state rows: 0 phase, 1 x, 2 i, 3 j, 4..6 ik, 7 primk, 8 priml, 9..13 pos
S_PHASE, S_X, S_I, S_J, S_IK0, S_IK1, S_IK2, S_PRIMK, S_PRIML, S_POS = 0, 1, 2, 3, 4, 5, 6, 7, 8, 9
N_STATE = 14
# pack rows: 0..5 bits_k, 6..11 bits_l, 12..17 base_k, 18..23 base_l, 24..28 syms, 29 qlen
G_BITSK, G_BITSL, G_BASEK, G_BASEL, G_SYMS, G_QLEN = 0, 6, 12, 18, 24, 29
N_PACK = 30


def _make_kernel(min_occ: int, min_len: int):
    def kernel(
        acc_ref,  # SMEM (8,) int32 cumulative counts
        st_ref,  # (N_STATE, R, 128) packed lane state
        pk_ref,  # (N_PACK, R, 128) packed gathered data
        # outputs
        st_o,  # (N_STATE, R, 128)
        emit_o,  # (6, R, 128): mask + 5 row fields
    ):
        def set_intv_vec(s):
            """In-kernel rb3_fmd_set_intv via 6-way select with SMEM scalars."""
            r0 = jnp.zeros_like(s)
            r1 = jnp.zeros_like(s)
            r2 = jnp.zeros_like(s)
            for sym in range(6):
                csym = 5 - sym if 1 <= sym <= 4 else sym
                m = s == sym
                r0 = jnp.where(m, acc_ref[sym], r0)
                r1 = jnp.where(m, acc_ref[csym], r1)
                r2 = jnp.where(m, acc_ref[sym + 1] - acc_ref[sym], r2)
            return r0, r1, r2

        phase = st_ref[S_PHASE]
        x = st_ref[S_X]
        i = st_ref[S_I]
        j = st_ref[S_J]
        qlen = pk_ref[G_QLEN]
        ik0 = st_ref[S_IK0]
        ik1 = st_ref[S_IK1]
        ik2 = st_ref[S_IK2]

        fw = phase == PH_FWD
        b1 = phase == PH_BACK1
        b2 = phase == PH_BACK2
        active = b1 | b2 | fw

        # ---- extend: finish the rank and the bi-interval math ------------
        craw = pk_ref[G_SYMS + P_EXT]
        comp_c = jnp.where((craw >= 1) & (craw <= 4), 5 - craw, craw)
        c = jnp.where(fw, comp_c, craw)
        offk = st_ref[S_PRIMK] & (BLOCK - 1)
        offl = st_ref[S_PRIML] & (BLOCK - 1)
        cntk = _inblock6([pk_ref[G_BITSK + p] for p in range(6)], offk)
        cntl = _inblock6([pk_ref[G_BITSL + p] for p in range(6)], offl)
        tk = [pk_ref[G_BASEK + p] + cntk[p] for p in range(6)]
        tl = [pk_ref[G_BASEL + p] + cntl[p] for p in range(6)]
        sz = [tl[p] - tk[p] for p in range(6)]
        sec_in = jnp.where(fw, ik0, ik1)
        sec = {}
        o = sec_in
        for sym, prev in zip(_EXT_ORDER, (None,) + _EXT_ORDER[:-1]):
            if prev is not None:
                o = o + sz[prev]
            sec[sym] = o
        okc0 = jnp.zeros_like(x)
        okc1 = jnp.zeros_like(x)
        okc2 = jnp.zeros_like(x)
        for sym in range(6):
            is_c = c == sym
            prim_out = acc_ref[sym] + tk[sym]
            x0s = jnp.where(fw, sec[sym], prim_out)
            x1s = jnp.where(fw, prim_out, sec[sym])
            okc0 = jnp.where(is_c, x0s, okc0)
            okc1 = jnp.where(is_c, x1s, okc1)
            okc2 = jnp.where(is_c, sz[sym], okc2)
        succ = active & (okc2 >= min_occ)

        # ---- transitions -------------------------------------------------
        emit_mask = jnp.zeros_like(x)
        emit_st = jnp.zeros_like(x)
        emit_en = jnp.zeros_like(x)
        e_ik0 = jnp.zeros_like(x)
        e_ik1 = jnp.zeros_like(x)
        e_ik2 = jnp.zeros_like(x)

        # BACK1
        m = b1 & succ
        ik0 = jnp.where(m, okc0, ik0)
        ik1 = jnp.where(m, okc1, ik1)
        ik2 = jnp.where(m, okc2, ik2)
        i = jnp.where(m, i - 1, i)
        to_fwd = m & (i < x)
        j = jnp.where(to_fwd, x + min_len, j)
        phase = jnp.where(to_fwd, _I_FWD, phase)
        m = b1 & ~succ
        x = jnp.where(m, i + 1, x)
        phase = jnp.where(m, _I_START, phase)

        # FWD
        m = fw & succ
        ik0 = jnp.where(m, okc0, ik0)
        ik1 = jnp.where(m, okc1, ik1)
        ik2 = jnp.where(m, okc2, ik2)
        j = jnp.where(m, j + 1, j)
        hit_end = m & (j >= qlen)
        phase = jnp.where(hit_end, _I_DONE, phase)
        mf = fw & ~succ
        both = hit_end | mf
        emit_mask = jnp.where(both, _I_ONE, emit_mask)
        emit_st = jnp.where(both, x, emit_st)
        emit_en = jnp.where(hit_end, qlen, jnp.where(mf, j, emit_en))
        e_ik0 = jnp.where(both, ik0, e_ik0)
        e_ik1 = jnp.where(both, ik1, e_ik1)
        e_ik2 = jnp.where(both, ik2, e_ik2)
        f0, f1, f2 = set_intv_vec(pk_ref[G_SYMS + P_FAIL])
        ik0 = jnp.where(mf, f0, ik0)
        ik1 = jnp.where(mf, f1, ik1)
        ik2 = jnp.where(mf, f2, ik2)
        i = jnp.where(mf, j - 1, i)
        phase = jnp.where(mf, _I_BACK2, phase)

        # BACK2
        i_entry_b2 = i  # i before the decrement, for pos_c
        m = b2 & succ
        ik0 = jnp.where(m, okc0, ik0)
        ik1 = jnp.where(m, okc1, ik1)
        ik2 = jnp.where(m, okc2, ik2)
        i = jnp.where(m, i - 1, i)
        fell = m & (i <= x)
        x = jnp.where(fell, i + 1, x)
        phase = jnp.where(fell, _I_START, phase)
        m = b2 & ~succ
        x = jnp.where(m, i + 1, x)
        phase = jnp.where(m, _I_START, phase)

        # ---- resolve (next iteration's) ---------------------------------
        was_start = st_ref[S_PHASE] == PH_START
        start = phase == PH_START
        fin = start & (qlen - x < min_len)
        phase = jnp.where(fin, _I_DONE, phase)
        begin = start & ~fin
        use_a = begin & was_start
        use_c = begin & fell
        use_b = begin & ~was_start & ~fell
        for slot, mask in ((P_A, use_a), (P_B, use_b), (P_C, use_c)):
            r0, r1, r2 = set_intv_vec(pk_ref[G_SYMS + slot])
            ik0 = jnp.where(mask, r0, ik0)
            ik1 = jnp.where(mask, r1, ik1)
            ik2 = jnp.where(mask, r2, ik2)
        i = jnp.where(begin, x + min_len - 2, i)
        phase = jnp.where(begin, _I_BACK1, phase)
        skip = (phase == PH_BACK1) & begin & (i < x)
        j = jnp.where(skip, x + min_len, j)
        phase = jnp.where(skip, _I_FWD, phase)
        fwd_end = (phase == PH_FWD) & skip & (j >= qlen)
        emit_mask = jnp.where(fwd_end, _I_ONE, emit_mask)
        emit_st = jnp.where(fwd_end, x, emit_st)
        emit_en = jnp.where(fwd_end, qlen, emit_en)
        e_ik0 = jnp.where(fwd_end, ik0, e_ik0)
        e_ik1 = jnp.where(fwd_end, ik1, e_ik1)
        e_ik2 = jnp.where(fwd_end, ik2, e_ik2)
        phase = jnp.where(fwd_end, _I_DONE, phase)
        b2_end = (phase == PH_BACK2) & (i <= x)
        x = jnp.where(b2_end, i + 1, x)
        phase = jnp.where(b2_end, _I_START, phase)

        # ---- outputs -----------------------------------------------------
        fw_n = phase == PH_FWD
        b1_n = phase == PH_BACK1
        b2_n = phase == PH_BACK2
        active_n = fw_n | b1_n | b2_n
        prim = jnp.where(fw_n, ik1, ik0)
        prim = jnp.where(active_n, prim, _I_ZERO)
        szn = jnp.where(active_n, ik2, _I_ZERO)
        st_o[S_PHASE] = phase
        st_o[S_X] = x
        st_o[S_I] = i
        st_o[S_J] = j
        st_o[S_IK0] = ik0
        st_o[S_IK1] = ik1
        st_o[S_IK2] = ik2
        st_o[S_PRIMK] = prim
        st_o[S_PRIML] = prim + szn
        st_o[S_POS + P_EXT] = jnp.where(fw_n, j, i)
        st_o[S_POS + P_FAIL] = j
        st_o[S_POS + P_A] = x + min_len - 1
        st_o[S_POS + P_B] = i + min_len  # valid when x will become i+1
        st_o[S_POS + P_C] = i_entry_b2 + min_len - 1
        emit_o[0] = emit_mask
        emit_o[1] = emit_st
        emit_o[2] = emit_en
        emit_o[3] = e_ik2
        emit_o[4] = e_ik0
        emit_o[5] = e_ik1

    return kernel


@partial(jax.jit, static_argnames=("min_occ", "min_len", "max_mems", "max_iters", "interpret"))
def smem_tg_pallas(
    idx: DeviceIndex,
    q: jax.Array,  # (Q, L) uint8
    qlen_in: jax.Array,  # (Q,) int32
    *,
    min_occ: int,
    min_len: int,
    max_mems: int,
    max_iters: int,
    interpret: bool = False,
):
    Q, L = q.shape
    assert Q % 128 == 0, "lane count must be a multiple of 128"
    R = Q // 128
    sh = (R, 128)
    dt = jnp.int32
    assert idx.idx_dtype == jnp.int32, "pallas path requires int32 indexes"
    acc32 = idx.acc.astype(jnp.int32)
    q_flat = q.astype(jnp.int32).reshape(-1)
    lane_base = jnp.arange(Q, dtype=jnp.int32).reshape(sh) * L
    qlen = qlen_in.reshape(sh)
    # flattened tables for transpose-free (6, R, 128) gathers: row-major
    # (nb, 6) flattens so entry (bi, p) sits at bi*6 + p.  int32 indexes store
    # the fused (nb, 12) occf row table (ops/rank.py) — slice it back out
    # here, once, outside the loop.
    if idx.occf is not None:
        # int64-mode occf counts are megablock-relative uint32 (ops/rank.py);
        # this kernel only supports the absolute int32 layout
        assert idx.idx_dtype == jnp.int32, "pallas SMEM requires the int32 fused layout"
        bits_flat = idx.occf[:, :6].reshape(-1)
        blk_flat = idx.occf[:, 6:12].reshape(-1)
        sup_flat = jnp.zeros((6,), dt)
    else:
        bits_flat = jax.lax.bitcast_convert_type(idx.occ_bits, jnp.int32).reshape(-1)
        blk_flat = idx.occ_block.reshape(-1)
        sup_flat = idx.occ_super.astype(dt).reshape(-1)
    plane6 = jnp.arange(6, dtype=jnp.int32)[:, None, None]

    kernel = _make_kernel(min_occ, min_len)
    out_shapes = (
        jax.ShapeDtypeStruct((N_STATE,) + sh, dt),  # packed state
        jax.ShapeDtypeStruct((6,) + sh, dt),  # emit mask + row
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vmem, vmem],
        out_specs=(vmem, vmem),
        input_output_aliases={1: 0},  # state updated in place
        interpret=interpret,
    )

    st0 = jnp.zeros((N_STATE,) + sh, dt).at[S_POS + P_A].set(min_len - 1)
    state = dict(
        st=st0,
        n_mem=jnp.zeros((Q,), jnp.int32),
        mems=jnp.zeros((Q, max_mems, 5), dt),
        it=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), jnp.bool_),
    )

    def cond(s):
        return (~s["done"]) & (s["it"] < max_iters + 1)

    def body(s):
        st = s["st"]
        # one stacked flat gather per table: bits for both endpoints at once
        bi2 = jnp.stack([st[S_PRIMK], st[S_PRIML]], 0) // BLOCK  # (2, R, 128)
        fi = (bi2[:, None] * 6 + plane6[None]).reshape(-1)  # (2,6,R,128) flat
        bits = jnp.take(bits_flat, fi).reshape((12,) + sh)
        if idx.occf is not None:  # absolute int32 block rows
            base = jnp.take(blk_flat, fi).astype(dt).reshape((12,) + sh)
        else:
            base = (
                jnp.take(sup_flat, ((bi2[:, None] // BLOCKS_PER_SUPER) * 6 + plane6[None]).reshape(-1))
                + jnp.take(blk_flat, fi).astype(dt)
            ).reshape((12,) + sh)
        p = jnp.clip(st[S_POS : S_POS + 5], 0, L - 1)
        syms = jnp.take(q_flat, (lane_base[None] + p).reshape(-1)).reshape((5,) + sh)
        pack = jnp.concatenate([bits, base, syms, qlen[None]], axis=0)
        st2, emit = call(acc32, st, pack)
        mems, n_mem = s["mems"], s["n_mem"]
        em = emit[0].reshape(Q) != 0
        row = jnp.moveaxis(emit[1:6].reshape(5, Q), 0, 1)  # (Q, 5)
        slot = jnp.minimum(n_mem, max_mems - 1)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (Q, max_mems), 1) == slot[:, None]) & em[:, None]
        mems = jnp.where(sel[:, :, None], row[:, None, :], mems)
        n_mem = jnp.where(em, n_mem + 1, n_mem)
        return dict(
            st=st2,
            n_mem=n_mem,
            mems=mems,
            it=s["it"] + 1,
            done=jnp.all(st2[S_PHASE] == PH_DONE),
        )

    out = jax.lax.while_loop(cond, body, state)
    return out["mems"], out["n_mem"], out["it"]
