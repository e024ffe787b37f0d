"""Probe the TPU for fused-SMEM-kernel feasibility (VERDICT round-2 item 1).

Measures, in ONE process/attach (tunneled v5e, one-attach rule):
  1. VMEM capacity: largest pallas VMEM scratch that compiles+runs.
  2. XLA row-gather cost: (nb,12) int32 occf-row gather of 4096 random rows,
     dependent chain, at 64M-scale (1M rows) and 640M-scale (10M rows) tables.
  3. Pallas scalar-loop gather from a VMEM-resident table (dynamic row index
     in a fori_loop): rows/s achievable.
  4. Pallas per-row DMA gather from an HBM-resident table: rows/s achievable.

Run:  python scripts/fused_probe.py  (TPU; ~minutes incl. compiles)
"""

import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

import ropebwt3_tpu  # noqa: F401  (jax setup, hugepage fix)
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

dev = jax.devices()[0]
print("device:", dev, flush=True)


def sync(x):
    return np.asarray(x)


def timeit(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


# ---------------------------------------------------------------- 1. VMEM cap
def vmem_probe(mb):
    n = mb * 1024 * 1024 // 4

    def kern(o_ref, scratch):
        scratch[0, :] = jnp.full((128,), np.int32(1), jnp.int32)
        o_ref[0, 0] = scratch[0, 0]

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n // 128, 128), jnp.int32)],
    )
    try:
        sync(jax.jit(f)())
        return True
    except Exception as e:
        print(f"  vmem {mb} MB: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)
        return False


print("[1] VMEM capacity probe", flush=True)
ok_mb = 0
for mb in (8, 16, 32, 64, 96, 112, 120):
    if vmem_probe(mb):
        ok_mb = mb
        print(f"  vmem {mb} MB: ok", flush=True)
    else:
        break
print(f"  => VMEM scratch cap ~{ok_mb} MB", flush=True)


# ------------------------------------------------- 2. XLA dependent row gather
def gather_chain(tab, idx0, iters):
    nb = tab.shape[0]

    def body(_, idx):
        rows = tab[idx]  # (4096, 12)
        # fold the row back into the next index (dependent chain, like rank)
        nxt = (idx * np.int32(1103515245) + rows[:, 6] + np.int32(12345)) % np.int32(nb)
        return jnp.abs(nxt)

    return jax.lax.fori_loop(0, iters, body, idx0)


print("[2] XLA dependent row-gather (4096 rows/iter, 200 iters)", flush=True)
for nb, tag in ((1_000_000, "64M-scale 48MB"), (10_000_000, "640M-scale 480MB")):
    tab = jnp.asarray(np.random.randint(0, 1 << 30, (nb, 12), np.int32))
    idx0 = jnp.asarray(np.random.randint(0, nb, 4096).astype(np.int32))
    f = jax.jit(gather_chain, static_argnums=2)
    sync(f(tab, idx0, 200))  # compile+warm
    dt = timeit(lambda: sync(f(tab, idx0, 200)))
    print(f"  {tag}: {dt/200*1e6:.1f} us/iter ({4096/ (dt/200) /1e6:.0f} Mrows/s)", flush=True)
    del tab


# --------------------------------- 3. Pallas scalar-loop gather, VMEM table
def pallas_vmem_gather(nb, q, iters):
    def kern(tab_ref, idx_ref, out_ref, rows_scr):
        def it_body(_, carry):
            def lane(i, c):
                bi = idx_ref[i]
                rows_scr[i, :] = tab_ref[bi, :]
                return c

            c = jax.lax.fori_loop(0, q, lane, carry)
            # fold back so iterations are dependent
            s = rows_scr[:, 6]
            idx_ref[:] = jnp.abs((idx_ref[:] * np.int32(1103515245) + s) % np.int32(nb))
            return c

        jax.lax.fori_loop(0, iters, it_body, np.int32(0))
        out_ref[:] = rows_scr[0:8, :]

    tab = jnp.asarray(np.random.randint(0, 1 << 30, (nb, 128), np.int32))
    idx = jnp.asarray(np.random.randint(0, nb, q).astype(np.int32))
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((q, 128), jnp.int32)],
        input_output_aliases={},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    jf = jax.jit(lambda t, i: f(t, i))
    sync(jf(tab, idx))
    dt = timeit(lambda: sync(jf(tab, idx)))
    return dt / iters


print("[3] Pallas scalar-loop VMEM gather (rows of 128 int32)", flush=True)
try:
    per_it = pallas_vmem_gather(100_000, 512, 50)  # 100k*512B = 51MB table
    print(f"  nb=100k q=512: {per_it*1e6:.1f} us/iter ({512/per_it/1e6:.1f} Mrows/s)", flush=True)
except Exception as e:
    print(f"  FAIL: {type(e).__name__}: {str(e)[:300]}", flush=True)


# --------------------------------- 4. Pallas per-row DMA gather from HBM
def pallas_hbm_dma_gather(nb, q, iters):
    def kern(idx_ref, tab_ref, out_ref, rows_scr, sems):
        def it_body(_, carry):
            def start(i, c):
                pltpu.make_async_copy(tab_ref.at[idx_ref[i]], rows_scr.at[i], sems.at[i]).start()
                return c

            c = jax.lax.fori_loop(0, q, start, carry)

            def wait(i, c):
                pltpu.make_async_copy(tab_ref.at[idx_ref[i]], rows_scr.at[i], sems.at[i]).wait()
                return c

            c = jax.lax.fori_loop(0, q, wait, c)
            s = rows_scr[:, 6]
            idx_ref[:] = jnp.abs((idx_ref[:] * np.int32(1103515245) + s) % np.int32(nb))
            return c

        jax.lax.fori_loop(0, iters, it_body, np.int32(0))
        out_ref[:] = rows_scr[0:8, :]

    tab = jnp.asarray(np.random.randint(0, 1 << 30, (nb, 16), np.int32))
    idx = jnp.asarray(np.random.randint(0, nb, q).astype(np.int32))
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 16), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((q, 16), jnp.int32),
            pltpu.SemaphoreType.DMA((q,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    jf = jax.jit(lambda i, t: f(i, t))
    sync(jf(idx, tab))
    dt = timeit(lambda: sync(jf(idx, tab)))
    return dt / iters


print("[4] Pallas per-row DMA gather from HBM (rows of 16 int32 = 64B)", flush=True)
try:
    per_it = pallas_hbm_dma_gather(10_000_000, 512, 50)
    print(f"  nb=10M q=512: {per_it*1e6:.1f} us/iter ({512/per_it/1e6:.2f} Mrows/s)", flush=True)
except Exception as e:
    print(f"  FAIL: {type(e).__name__}: {str(e)[:300]}", flush=True)

print("done", flush=True)
