"""Pallas single-kernel SMEM-TG loop body.

The pure-XLA FSM (ops/smem_fsm.py) spends ~100 small kernel dispatches per
iteration; on TPU that overhead dominates the actual rank work by >100x.  Here
the entire per-iteration state update — bidirectional extend math (bit-plane
popcount rank), FSM transitions, and next-iteration resolve — runs as ONE
Pallas kernel on VMEM-resident lane state; only the table gathers (which XLA
lowers to the fast hardware gather path) and the emit select stay in XLA.

Iteration order is [transitions; resolve] with a resolve-only first iteration
(all lanes start inactive), which reproduces ops/smem_fsm.py's
[resolve; extend] sequence exactly, one iteration offset.

Positions whose symbols the next resolve/extend might need are computed at the
end of the kernel so XLA can prefetch them:
  pos_ext  — symbol driving the next extend (i or j)
  pos_a/b/c — set_intv window symbols for the 3 ways a lane can (re)enter
              START: entry x, post-fail x=i+1, post-fell-through x=i_old
  pos_fail — q[j] for the FWD-fail set_intv

Lane state is shaped (R, 128) (R = Q/128) for native VPU tiling; 6-column
data is (6, R, 128).
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
from .smem_ref import Mem

PH_START, PH_BACK1, PH_FWD, PH_BACK2, PH_DONE = 0, 1, 2, 3, 4
_EXT_ORDER = (0, 4, 3, 2, 1, 5)
# int32 scalar constants: bare Python ints inside jnp.where become i64 under
# x64 and Mosaic's i64->i32 convert lowering recurses forever


# NumPy scalars (not jnp arrays: pallas kernels may not capture array consts)
_I_START, _I_BACK1, _I_FWD, _I_BACK2, _I_DONE = (np.int32(v) for v in range(5))
_I_ONE, _I_ZERO = np.int32(1), np.int32(0)


def _inblock6(bits, off):
    """bits: list of 6 (R,128) int32 bit-plane words (bit patterns; Mosaic
    recurses forever lowering uint32 converts, so all bit math is int32 with
    wrapping semantics); off: (R,128) int32 in [0,64].
    Returns list of 6 (R,128) int32 counts."""
    one = np.int32(1)
    full = np.int32(-1)
    off_lo = jnp.minimum(off, 32)
    off_hi = jnp.maximum(off - 32, np.int32(0))
    # (1<<31)-1 wraps to 0x7fffffff, exactly the 31-bit mask; shift-by-32 is
    # clamped to 31 and discarded by the where
    mask_lo = jnp.where(off_lo >= 32, full, (one << jnp.minimum(off_lo, np.int32(31))) - one)
    mask_hi = jnp.where(off_hi >= 32, full, (one << jnp.minimum(off_hi, np.int32(31))) - one)
    out = []
    for c in range(6):
        eq_lo = mask_lo
        eq_hi = mask_hi
        for plane in range(3):
            if (c >> plane) & 1:
                eq_lo = eq_lo & bits[plane * 2]
                eq_hi = eq_hi & bits[plane * 2 + 1]
            else:
                eq_lo = eq_lo & ~bits[plane * 2]
                eq_hi = eq_hi & ~bits[plane * 2 + 1]
        out.append((jax.lax.population_count(eq_lo) + jax.lax.population_count(eq_hi)).astype(jnp.int32))
    return out


def _make_kernel(min_occ: int, min_len: int):
    def kernel(
        acc_ref,  # SMEM (8,) int32 cumulative counts
        qlen_ref,
        phase_ref,
        x_ref,
        i_ref,
        j_ref,
        ik_ref,  # (3, R, 128)
        bits_k_ref,  # (6, R, 128) uint32
        bits_l_ref,
        base_k_ref,  # (6, R, 128) int32
        base_l_ref,
        primk_ref,
        priml_ref,
        csym_ref,  # (R, 128) int32: symbol at pos_ext
        ik_fail_ref,  # (3, R, 128): set_intv(q[pos_fail])
        rs_a_ref,  # (3, R, 128): set_intv(q[pos_a])
        rs_b_ref,
        rs_c_ref,
        # outputs
        phase_o,
        x_o,
        i_o,
        j_o,
        ik_o,
        primk_o,
        priml_o,
        pos_ext_o,
        pos_a_o,
        pos_b_o,
        pos_c_o,
        pos_fail_o,
        emit_mask_o,
        emit_row_o,  # (5, R, 128)
    ):
        phase = phase_ref[:]
        x = x_ref[:]
        i = i_ref[:]
        j = j_ref[:]
        qlen = qlen_ref[:]
        ik0 = ik_ref[0]
        ik1 = ik_ref[1]
        ik2 = ik_ref[2]

        fw = phase == PH_FWD
        b1 = phase == PH_BACK1
        b2 = phase == PH_BACK2
        active = b1 | b2 | fw

        # ---- extend: finish the rank and the bi-interval math ------------
        craw = csym_ref[:]
        comp_c = jnp.where((craw >= 1) & (craw <= 4), 5 - craw, craw)
        c = jnp.where(fw, comp_c, craw)
        offk = primk_ref[:] & (BLOCK - 1)
        offl = priml_ref[:] & (BLOCK - 1)
        cntk = _inblock6([bits_k_ref[p] for p in range(6)], offk)
        cntl = _inblock6([bits_l_ref[p] for p in range(6)], offl)
        tk = [base_k_ref[p] + cntk[p] for p in range(6)]
        tl = [base_l_ref[p] + cntl[p] for p in range(6)]
        sz = [tl[p] - tk[p] for p in range(6)]
        sec_in = jnp.where(fw, ik0, ik1)
        sec = {}
        o = sec_in
        for sym, prev in zip(_EXT_ORDER, (None,) + _EXT_ORDER[:-1]):
            if prev is not None:
                o = o + sz[prev]
            sec[sym] = o
        # select row c
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
        emit_mask = jnp.zeros_like(x, dtype=jnp.int32)
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
        mf = fw & active & ~succ
        both = hit_end | mf
        emit_mask = jnp.where(both, _I_ONE, emit_mask)
        emit_st = jnp.where(both, x, emit_st)
        emit_en = jnp.where(hit_end, qlen, jnp.where(mf, j, emit_en))
        e_ik0 = jnp.where(both, ik0, e_ik0)
        e_ik1 = jnp.where(both, ik1, e_ik1)
        e_ik2 = jnp.where(both, ik2, e_ik2)
        ik0 = jnp.where(mf, ik_fail_ref[0], ik0)
        ik1 = jnp.where(mf, ik_fail_ref[1], ik1)
        ik2 = jnp.where(mf, ik_fail_ref[2], ik2)
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
        # Select the precomputed set_intv row for the window symbol: lanes
        # that entered START via a fail use rs_b (pos = i+min_len), via
        # fell-through use rs_c (pos = i_old+min_len-1), otherwise rs_a
        # (pos = entry x+min_len-1).
        was_start = phase_ref[:] == PH_START
        start = phase == PH_START
        fin = start & (qlen - x < min_len)
        phase = jnp.where(fin, _I_DONE, phase)
        begin = start & ~fin
        use_a = begin & was_start
        use_c = begin & fell
        use_b = begin & ~was_start & ~fell
        for ref, mask in ((rs_a_ref, use_a), (rs_b_ref, use_b), (rs_c_ref, use_c)):
            ik0 = jnp.where(mask, ref[0], ik0)
            ik1 = jnp.where(mask, ref[1], ik1)
            ik2 = jnp.where(mask, ref[2], ik2)
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
        phase_o[:] = phase
        x_o[:] = x
        i_o[:] = i
        j_o[:] = j
        ik_o[0] = ik0
        ik_o[1] = ik1
        ik_o[2] = ik2
        primk_o[:] = prim
        priml_o[:] = prim + szn
        pos_ext_o[:] = jnp.where(fw_n, j, i)
        pos_a_o[:] = x + min_len - 1
        pos_b_o[:] = i + min_len  # valid when x will become i+1
        pos_c_o[:] = i_entry_b2 + min_len - 1
        pos_fail_o[:] = j
        emit_mask_o[:] = emit_mask
        emit_row_o[0] = emit_st
        emit_row_o[1] = emit_en
        emit_row_o[2] = e_ik2
        emit_row_o[3] = e_ik0
        emit_row_o[4] = e_ik1

    return kernel


def _set_intv_rows(acc, comp, c):
    """(..., ) int32 symbols -> (3, ...) set_intv rows."""
    cc = comp[c]
    return jnp.stack([acc[c], acc[cc], acc[c + 1] - acc[c]], axis=0)


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
    comp = idx.comp
    q_flat = q.astype(jnp.int32).reshape(-1)
    lane_base = (jnp.arange(Q, dtype=jnp.int32) * L).reshape(sh)
    qlen = qlen_in.reshape(sh)

    kernel = _make_kernel(min_occ, min_len)
    out_shapes = (
        jax.ShapeDtypeStruct(sh, dt),  # phase
        jax.ShapeDtypeStruct(sh, dt),  # x
        jax.ShapeDtypeStruct(sh, dt),  # i
        jax.ShapeDtypeStruct(sh, dt),  # j
        jax.ShapeDtypeStruct((3,) + sh, dt),  # ik
        jax.ShapeDtypeStruct(sh, dt),  # primk
        jax.ShapeDtypeStruct(sh, dt),  # priml
        jax.ShapeDtypeStruct(sh, dt),  # pos_ext
        jax.ShapeDtypeStruct(sh, dt),  # pos_a
        jax.ShapeDtypeStruct(sh, dt),  # pos_b
        jax.ShapeDtypeStruct(sh, dt),  # pos_c
        jax.ShapeDtypeStruct(sh, dt),  # pos_fail
        jax.ShapeDtypeStruct(sh, dt),  # emit_mask
        jax.ShapeDtypeStruct((5,) + sh, dt),  # emit_row
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_in = 17
    call = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem] * n_in,
        out_specs=tuple(vmem for _ in out_shapes),
        interpret=interpret,
    )

    def qsym(pos):
        p = jnp.clip(pos, 0, L - 1)
        return jnp.take(q_flat, (lane_base + p).reshape(-1)).reshape(sh)

    def gather_tables(primk, priml):
        def one(prim):
            bi = (prim // BLOCK).reshape(-1)
            si = bi // BLOCKS_PER_SUPER
            bits_u32 = idx.occ_bits[bi].reshape(sh + (6,))
            bits = jnp.moveaxis(jax.lax.bitcast_convert_type(bits_u32, jnp.int32), -1, 0)
            base = (idx.occ_super[si].astype(dt) + idx.occ_block[bi].astype(dt)).reshape(sh + (6,))
            return bits, jnp.moveaxis(base, -1, 0)

        bk, basek = one(primk)
        bl, basel = one(priml)
        return bk, bl, basek, basel

    zero = jnp.zeros(sh, dt)
    state = dict(
        phase=zero,
        x=zero,
        i=zero,
        j=zero,
        ik=jnp.zeros((3,) + sh, dt),
        primk=zero,
        priml=zero,
        pos_ext=zero,
        pos_a=jnp.full(sh, min_len - 1, dt),
        pos_b=zero,
        pos_c=zero,
        pos_fail=zero,
        n_mem=jnp.zeros((Q,), jnp.int32),
        mems=jnp.zeros((Q, max_mems, 5), dt),
        it=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), jnp.bool_),
    )

    def cond(s):
        return (~s["done"]) & (s["it"] < max_iters + 1)

    def body(s):
        bits_k, bits_l, base_k, base_l = gather_tables(s["primk"], s["priml"])
        csym = qsym(s["pos_ext"])
        ik_fail = _set_intv_rows(acc32, comp, qsym(s["pos_fail"]))
        rs_a = _set_intv_rows(acc32, comp, qsym(s["pos_a"]))
        rs_b = _set_intv_rows(acc32, comp, qsym(s["pos_b"]))
        rs_c = _set_intv_rows(acc32, comp, qsym(s["pos_c"]))
        outs = call(
            acc32.astype(jnp.int32),
            qlen,
            s["phase"],
            s["x"],
            s["i"],
            s["j"],
            s["ik"],
            bits_k,
            bits_l,
            base_k,
            base_l,
            s["primk"],
            s["priml"],
            csym,
            ik_fail,
            rs_a,
            rs_b,
            rs_c,
        )
        (phase, x, i, j, ik, primk, priml, pos_ext, pos_a, pos_b, pos_c, pos_fail, emit_mask, emit_row) = outs
        # emit: one-hot select over the M axis
        mems, n_mem = s["mems"], s["n_mem"]
        em = emit_mask.reshape(Q) != 0
        row = jnp.moveaxis(emit_row.reshape(5, Q), 0, 1)  # (Q, 5)
        slot = jnp.minimum(n_mem, max_mems - 1)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (Q, max_mems), 1) == slot[:, None]) & em[:, None]
        mems = jnp.where(sel[:, :, None], row[:, None, :], mems)
        # n_mem counts TRUE emits (may exceed max_mems); host reruns overflows
        n_mem = jnp.where(em, n_mem + 1, n_mem)
        return dict(
            phase=phase,
            x=x,
            i=i,
            j=j,
            ik=ik,
            primk=primk,
            priml=priml,
            pos_ext=pos_ext,
            pos_a=pos_a,
            pos_b=pos_b,
            pos_c=pos_c,
            pos_fail=pos_fail,
            n_mem=n_mem,
            mems=mems,
            it=s["it"] + 1,
            done=jnp.all(phase == PH_DONE),
        )

    out = jax.lax.while_loop(cond, body, state)
    return out["mems"], out["n_mem"], out["it"]
