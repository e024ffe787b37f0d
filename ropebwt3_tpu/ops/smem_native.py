"""Threaded native (C++) SMEM-TG engine — CPU fallback / baseline for the
TPU kernel (ops/smem.py).  Same TG algorithm as ops/smem_ref.smem_tg
(fm-index.c:483-528), implemented in native/bwasw_core.cpp with the dense
occ tables and a rank cache; bit-identical outputs, equivalence-tested in
tests/test_native_sw.py."""

from __future__ import annotations

import ctypes
import os

import numpy as np

from ..index.dense import DenseFMIndex
from .smem_ref import Mem


def native_smem_lib():
    if os.environ.get("RB3TPU_NATIVE_SW", "1") == "0":
        return None
    from ..native import get_sw_lib

    return get_sw_lib()


def smem_tg_batch_native(f: DenseFMIndex, seqs: list[np.ndarray], min_occ: int, min_len: int) -> list[list[Mem]]:
    lib = native_smem_lib()
    assert lib is not None
    n_reads = len(seqs)
    if n_reads == 0:
        return []
    flat = np.ascontiguousarray(np.concatenate([np.asarray(s, dtype=np.uint8) for s in seqs]))
    seq_off = np.zeros(n_reads + 1, dtype=np.int64)
    seq_off[1:] = np.cumsum([len(s) for s in seqs])
    out_len = ctypes.c_int64(0)
    P = ctypes.c_void_p
    ptr = lib.rb3t_smem_batch(
        P(f.bwt.ctypes.data), P(f.occ_block.ctypes.data), P(f.occ_super.ctypes.data), P(f.acc.ctypes.data),
        int(f.n), int(min_occ), int(min_len), P(flat.ctypes.data), P(seq_off.ctypes.data), n_reads,
        min(os.cpu_count() or 1, n_reads), ctypes.byref(out_len),
    )
    try:
        raw = ctypes.string_at(ptr, out_len.value)
    finally:
        lib.rb3t_buf_free(ptr)
    offs = np.frombuffer(raw, dtype=np.int64, count=n_reads + 1)
    base = (n_reads + 1) * 8
    out: list[list[Mem]] = []
    for r in range(n_reads):
        o = base + int(offs[r])
        n_mems = int.from_bytes(raw[o : o + 8], "little")
        rows = np.frombuffer(raw, dtype=np.int64, count=n_mems * 5, offset=o + 8).reshape(n_mems, 5)
        out.append([Mem(int(a), int(b), int(c), int(d), int(e)) for a, b, c, d, e in rows])
    return out
