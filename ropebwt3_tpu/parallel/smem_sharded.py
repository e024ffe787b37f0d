"""SMEM search over a sharded index — queries data-parallel over `dp`,
occ tables sharded over `idx`, rank reconstituted by psum per extend step."""

from __future__ import annotations



from .. import _jax_setup as __jx
__jx()
import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from ..ops.smem_fsm import smem_fsm
from .mesh import ShardedIndex, extend_sharded, extend_sharded_c

ASIZE = 6


def _set_intv_tables(acc, comp, c):
    c = c.astype(jnp.int32)
    cc = comp[c]
    return jnp.stack([acc[c], acc[cc], acc[c + 1] - acc[c]], axis=-1)


def smem_sharded_fn(sidx: ShardedIndex, *, min_occ: int, min_len: int, max_mems: int, max_iters: int):
    """Build a jitted sharded SMEM step: (q (Q,L) u8 sharded over dp, qlen) ->
    (mems, n_mem, iters-per-dp-row)."""
    mesh = sidx.mesh
    nb_local = sidx.nb_local

    def inner(occ_bits, occ_block, occ_super, acc, comp, q, qlen):
        mems, n_mem, it = smem_fsm(
            lambda ik, back: extend_sharded(occ_bits, occ_block, occ_super, acc, nb_local, ik, back),
            lambda c: _set_intv_tables(acc, comp, c),
            comp,
            q.astype(jnp.int32),
            qlen,
            acc.dtype,
            min_occ=min_occ,
            min_len=min_len,
            max_mems=max_mems,
            max_iters=max_iters,
            extend_one=lambda ik, c, back: extend_sharded_c(occ_bits, occ_block, occ_super, acc, nb_local, ik, c, back),
        )
        return mems, n_mem, it[None]

    smapped = shard_map(
        inner,
        mesh=mesh,
        in_specs=(P("idx", None), P("idx", None), P(), P(), P(), P("dp", None), P("dp")),
        out_specs=(P("dp", None, None), P("dp"), P("dp")),
        check_rep=False,
    )

    @jax.jit
    def step(q, qlen):
        return smapped(sidx.occ_bits, sidx.occ_block, sidx.occ_super, sidx.acc, sidx.comp, q, qlen)

    return step
