"""Multi-chip sharding of the FM-index and query batches.

Sharding story (SURVEY.md §2.6): the analog of tensor parallelism is
*occ-table sharding* — the BWT position axis is split across the `idx` mesh
axis so indexes larger than one HBM fit on a slice; queries are data-parallel
across the `dp` axis.  A rank request at position k touches only the shard
owning k: every device computes a masked local rank and a `psum` over `idx`
reconstitutes the full occ row (one small all-reduce per extend step, riding
ICI).  Small indexes replicate instead (idx=1) and the psum is free.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

from .. import _jax_setup as __jx
__jx()
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.dense import BLOCK, BLOCKS_PER_SUPER, DenseFMIndex

ASIZE = 6
_EXT_ORDER = (0, 4, 3, 2, 1, 5)


@dataclass
class ShardedIndex:
    """Dense FM-index laid out for a (dp, idx) mesh."""

    mesh: Mesh
    occ_bits: jax.Array  # (nb_pad, 6) uint32 bit-planes, sharded over idx rows
    occ_block: jax.Array  # (nb_pad, 6) uint16, sharded over idx rows
    occ_super: jax.Array  # (ns, 6) idx-dtype, replicated
    acc: jax.Array  # (7,) replicated
    comp: jax.Array  # (6,) replicated
    n: int
    nb_local: int  # blocks per idx shard

    @classmethod
    def from_dense(cls, f: DenseFMIndex, mesh: Mesh, idx_dtype=None) -> "ShardedIndex":
        from ..ops.rank import pack_bitplanes

        if idx_dtype is None:
            idx_dtype = jnp.int32 if f.n < (1 << 31) - (1 << 20) else jnp.int64
        n_idx = mesh.shape["idx"]
        nb = len(f.occ_block)
        nb_pad = (nb + n_idx - 1) // n_idx * n_idx
        occ_bits = np.zeros((nb_pad, 6), dtype=np.uint32)
        occ_bits[:nb] = pack_bitplanes(f.bwt[: nb * BLOCK].reshape(nb, BLOCK))
        occ_block = np.zeros((nb_pad, ASIZE), dtype=np.uint16)
        occ_block[:nb] = f.occ_block
        shard = NamedSharding(mesh, P("idx", None))
        repl = NamedSharding(mesh, P())
        return cls(
            mesh=mesh,
            occ_bits=jax.device_put(occ_bits, shard),
            occ_block=jax.device_put(occ_block, shard),
            occ_super=jax.device_put(f.occ_super.astype(idx_dtype), repl),
            acc=jax.device_put(f.acc.astype(idx_dtype), repl),
            comp=jax.device_put(np.array([0, 4, 3, 2, 1, 5], dtype=np.int32), repl),
            n=f.n,
            nb_local=nb_pad // n_idx,
        )


def rank1a_local(occ_bits, occ_block, occ_super, nb_local: int, k: jax.Array, dt):
    """Masked local rank partial for positions k against THIS shard's blocks.

    Inside shard_map: occ_bits/occ_block are the local (nb_local, ·) slabs;
    the caller psums the result over the `idx` axis.  The superblock row and
    the in-block count are only contributed by the owning shard."""
    from ..ops.rank import _inblock_counts

    shard_id = jax.lax.axis_index("idx").astype(jnp.int32)
    bi_glob = (k // BLOCK).astype(jnp.int32)
    owner = bi_glob // nb_local
    mine = owner == shard_id
    bi_loc = jnp.where(mine, bi_glob - shard_id * nb_local, 0)
    si = (bi_glob // BLOCKS_PER_SUPER).astype(jnp.int32)
    base = occ_super[si] + occ_block[bi_loc].astype(dt)
    off = (k % BLOCK).astype(jnp.int32)
    local = base + _inblock_counts(occ_bits[bi_loc], off).astype(dt)
    return jnp.where(mine[..., None], local, jnp.zeros_like(local))


def extend_sharded(occ_bits, occ_block, occ_super, acc, nb_local: int, ik: jax.Array, is_back: jax.Array):
    """Bidirectional extend inside shard_map; one psum over `idx` per call."""
    dt = acc.dtype
    ik = ik.astype(dt)
    prim = jnp.where(is_back, ik[..., 0], ik[..., 1])
    kl = jnp.stack([prim, prim + ik[..., 2]], 0)
    r = rank1a_local(occ_bits, occ_block, occ_super, nb_local, kl, dt)
    r = jax.lax.psum(r, "idx")
    tk, tl = r[0], r[1]
    sz = tl - tk
    prim_out = acc[:ASIZE] + tk
    sec_in = jnp.where(is_back, ik[..., 1], ik[..., 0])
    sec_out = jnp.zeros_like(prim_out)
    o = sec_in
    for c, prev in zip(_EXT_ORDER, (None,) + _EXT_ORDER[:-1]):
        if prev is not None:
            o = o + sz[..., prev]
        sec_out = sec_out.at[..., c].set(o)
    x0 = jnp.where(is_back[..., None], prim_out, sec_out)
    x1 = jnp.where(is_back[..., None], sec_out, prim_out)
    return jnp.stack([x0, x1, sz], axis=-1)


def extend_sharded_c(occ_bits, occ_block, occ_super, acc, nb_local: int, ik: jax.Array, c: jax.Array, is_back: jax.Array):
    """Single-symbol bidirectional extend inside shard_map (bit-identical to
    extend_sharded row c, cf. ops/rank.extend_c): one psum over `idx`, no
    (Q, 6, 3) candidate tensor."""
    from ..ops.rank import _EXT_PREFIX

    dt = acc.dtype
    ik = ik.astype(dt)
    prim = jnp.where(is_back, ik[..., 0], ik[..., 1])
    kl = jnp.stack([prim, prim + ik[..., 2]], 0)
    r = rank1a_local(occ_bits, occ_block, occ_super, nb_local, kl, dt)
    r = jax.lax.psum(r, "idx")
    tk, tl = r[0], r[1]
    sz = tl - tk  # (Q, 6)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, sz.shape, sz.ndim - 1) == c[..., None]).astype(dt)
    szc = jnp.sum(sz * onehot, axis=-1, dtype=dt)
    tkc = jnp.sum(tk * onehot, axis=-1, dtype=dt)
    prim_out = jnp.take(acc, c) + tkc
    sec_in = jnp.where(is_back, ik[..., 1], ik[..., 0])
    wrow = jnp.take(jnp.asarray(_EXT_PREFIX.reshape(-1)), c[..., None] * ASIZE + jnp.arange(ASIZE, dtype=jnp.int32)).astype(dt)
    sec_out = sec_in + jnp.sum(sz * wrow, axis=-1, dtype=dt)
    x0 = jnp.where(is_back, prim_out, sec_out)
    x1 = jnp.where(is_back, sec_out, prim_out)
    return jnp.stack([x0, x1, szc], axis=-1)


def make_mesh(dp: int, idx: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices()[: dp * idx])
    return Mesh(devices.reshape(dp, idx), ("dp", "idx"))
