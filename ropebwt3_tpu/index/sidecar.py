"""Mmap-able dense-table sidecar — the analog of the reference's `-M` mmap
load (rld0.c:322-341).

The FMD run-length decode plus occ-table build costs seconds per gigabase;
queries only need the final dense arrays.  `<index>.dense` stores them raw
(64-byte-aligned little-endian sections) so a later load is a single mmap:
the OS pages tables in on first touch and shares them across processes.

Layout: magic "RB3TDNS1" | int64 n, n_bwt, n_block_rows, n_super_rows |
int64 acc[7] | pad to 64 | bwt uint8[n_bwt] | pad | occ_block uint16[rows,6]
| pad | occ_super int64[rows,6].
"""

from __future__ import annotations

import os

import numpy as np

from .dense import DenseFMIndex

MAGIC = b"RB3TDNS1"
_ALIGN = 64


def _aligned(x: int) -> int:
    return (x + _ALIGN - 1) & ~(_ALIGN - 1)


def write_sidecar(path: str, f: DenseFMIndex) -> None:
    header = np.zeros(_ALIGN * 2 // 8, dtype="<i8")
    header[1:5] = [f.n, len(f.bwt), f.occ_block.shape[0], f.occ_super.shape[0]]
    header[5:12] = f.acc
    hb = bytearray(header.tobytes())
    hb[:8] = MAGIC
    tmp = path + ".tmp"
    with open(tmp, "wb") as fp:
        fp.write(hb)
        for arr in (f.bwt, f.occ_block, f.occ_super):
            np.ascontiguousarray(arr).tofile(fp)
            pad = _aligned(fp.tell()) - fp.tell()
            if pad:
                fp.write(b"\0" * pad)
    os.replace(tmp, path)


def read_sidecar(path: str) -> DenseFMIndex | None:
    """Mmap the sidecar; returns None when absent/invalid."""
    try:
        mm = np.memmap(path, dtype=np.uint8, mode="r")
    except (OSError, ValueError):
        return None
    if len(mm) < _ALIGN * 2 or bytes(mm[:8]) != MAGIC:
        return None
    header = np.frombuffer(mm, dtype="<i8", count=12)
    n, n_bwt, nb_rows, ns_rows = (int(x) for x in header[1:5])
    acc = np.array(header[5:12], dtype=np.int64)
    off = _ALIGN * 2
    bwt = np.frombuffer(mm, dtype=np.uint8, count=n_bwt, offset=off)
    off = _aligned(off + n_bwt)
    occ_block = np.frombuffer(mm, dtype="<u2", count=nb_rows * 6, offset=off).reshape(nb_rows, 6)
    off = _aligned(off + nb_rows * 12)
    occ_super = np.frombuffer(mm, dtype="<i8", count=ns_rows * 6, offset=off).reshape(ns_rows, 6)
    if off + ns_rows * 48 > len(mm):
        return None
    return DenseFMIndex(bwt=bwt, n=n, acc=acc, occ_block=occ_block, occ_super=occ_super)
