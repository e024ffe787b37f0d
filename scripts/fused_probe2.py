"""Fused-SMEM feasibility probes, round 2 (fixed Mosaic pitfalls).

  1. VMEM capacity (row store, not scalar store).
  2. Pallas scalar-loop gather from a VMEM-resident table (idx in SMEM,
     optimistic: index stream independent of fetched data).
  3. Pallas per-row DMA gather from an HBM table (idx in SMEM).
  4. XLA dependent row-gather where ALL columns are consumed (so the gather
     isn't narrowed), vs probe-1's single-column variant.

Run: python scripts/fused_probe2.py
"""

import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

import ropebwt3_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return np.asarray(x)


def timeit(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


print("device:", jax.devices()[0], flush=True)


# ---------------------------------------------------------------- 1. VMEM cap
def vmem_probe(mb):
    rows = mb * 1024 * 1024 // 512

    def kern(o_ref, scratch):
        scratch[0, :] = jnp.full((128,), np.int32(1), jnp.int32)
        scratch[rows - 1, :] = jnp.full((128,), np.int32(2), jnp.int32)
        o_ref[0, :] = scratch[0, :] + scratch[rows - 1, :]

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rows, 128), jnp.int32)],
    )
    try:
        sync(jax.jit(f)())
        return True
    except Exception as e:
        print(f"  vmem {mb} MB: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
        return False


print("[1] VMEM capacity", flush=True)
ok_mb = 0
for mb in (8, 16, 32, 64, 100, 120):
    if not vmem_probe(mb):
        break
    ok_mb = mb
    print(f"  vmem {mb} MB: ok", flush=True)
print(f"  => cap ~{ok_mb} MB", flush=True)


# ---------------------------------- 2. Pallas scalar-loop gather, VMEM table
def pallas_vmem_gather(nb, q, iters):
    def kern(tab_ref, idx_ref, out_ref, rows_scr, ii):
        def it_body(it, carry):
            def lane(i, c):
                bi = idx_ref[i]
                rows_scr[i, :] = tab_ref[(bi + it) % np.int32(nb), :]
                return c

            return jax.lax.fori_loop(0, q, lane, carry)

        jax.lax.fori_loop(0, iters, it_body, np.int32(0))
        out_ref[:] = rows_scr[0:8, :]

    tab = jnp.asarray(np.random.randint(0, 1 << 30, (nb, 128), np.int32))
    idx = jnp.asarray(np.random.randint(0, nb, q).astype(np.int32))
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((q, 128), jnp.int32), pltpu.SMEM((4,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    jf = jax.jit(f)
    sync(jf(tab, idx))
    dt = timeit(lambda: sync(jf(tab, idx)))
    return dt / iters


print("[2] Pallas scalar-loop VMEM gather (rows of 512B)", flush=True)
try:
    per_it = pallas_vmem_gather(20_000, 512, 100)  # 10MB table
    print(f"  nb=20k q=512: {per_it*1e6:.1f} us/iter ({512/per_it/1e6:.1f} Mrows/s)", flush=True)
except Exception as e:
    print(f"  FAIL: {type(e).__name__}: {str(e)[:240]}", flush=True)


# ---------------------------------- 3. Pallas per-row DMA gather from HBM
def pallas_hbm_dma_gather(nb, q, iters):
    def kern(idx_ref, tab_ref, out_ref, rows_scr, sems):
        def it_body(it, carry):
            def start(i, c):
                pltpu.make_async_copy(
                    tab_ref.at[(idx_ref[i] + it) % np.int32(nb)], rows_scr.at[i], sems.at[i]
                ).start()
                return c

            c = jax.lax.fori_loop(0, q, start, carry)

            def wait(i, c):
                pltpu.make_async_copy(
                    tab_ref.at[(idx_ref[i] + it) % np.int32(nb)], rows_scr.at[i], sems.at[i]
                ).wait()
                return c

            return jax.lax.fori_loop(0, q, wait, c)

        jax.lax.fori_loop(0, iters, it_body, np.int32(0))
        out_ref[:] = rows_scr[0:8, :]

    tab = jnp.asarray(np.random.randint(0, 1 << 30, (nb, 128), np.int32))
    idx = jnp.asarray(np.random.randint(0, nb, q).astype(np.int32))
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((q, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((q,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    jf = jax.jit(f)
    sync(jf(idx, tab))
    dt = timeit(lambda: sync(jf(idx, tab)))
    return dt / iters


print("[3] Pallas per-row DMA HBM gather (rows of 512B)", flush=True)
try:
    per_it = pallas_hbm_dma_gather(2_000_000, 512, 50)  # 1GB table
    print(f"  nb=2M q=512: {per_it*1e6:.1f} us/iter ({512/per_it/1e6:.2f} Mrows/s)", flush=True)
except Exception as e:
    print(f"  FAIL: {type(e).__name__}: {str(e)[:240]}", flush=True)


# ------------------- 4. XLA dependent gather, all columns consumed
def gather_chain_full(tab, idx0, iters):
    nb = tab.shape[0]

    def body(_, idx):
        rows = tab[idx]  # (Q, 12)
        s = jnp.sum(rows, axis=1)  # consume ALL columns
        nxt = (idx * np.int32(1103515245) + s + np.int32(12345)) % np.int32(nb)
        return jnp.abs(nxt)

    return jax.lax.fori_loop(0, iters, body, idx0)


print("[4] XLA dependent row-gather, all 12 cols consumed (4096 rows/iter)", flush=True)
for nb, tag in ((1_000_000, "48MB"), (10_000_000, "480MB")):
    tab = jnp.asarray(np.random.randint(0, 1 << 20, (nb, 12), np.int32))
    idx0 = jnp.asarray(np.random.randint(0, nb, 4096).astype(np.int32))
    f = jax.jit(gather_chain_full, static_argnums=2)
    sync(f(tab, idx0, 200))
    dt = timeit(lambda: sync(f(tab, idx0, 200)))
    print(f"  {tag}: {dt/200*1e6:.1f} us/iter ({4096/(dt/200)/1e6:.0f} Mrows/s)", flush=True)
    del tab

print("done", flush=True)
