"""Probe 3: per-row DMA gather from HBM with a small semaphore pool.

The q-sized DMA-semaphore array in fused_probe2 crashed the remote Mosaic
compiler; this variant round-robins 8 semaphores and waits for completion
counts.  If this gets anywhere near XLA's ~19 Mrows/s dependent-gather rate,
a fused loop body with in-kernel gathers becomes plausible; if it is much
slower, the fused-kernel route is dead on this hardware generation.

Also probes a grouped variant: each DMA copies G consecutive rows for lanes
whose indices were pre-sorted — measures whether DMA count, not bytes, is the
cost (it sets the coalescing win ceiling).
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

NSEM = 8


def dma_gather(nb, q, iters, row128=True):
    cols = 128 if row128 else 16

    def kern(idx_ref, tab_ref, out_ref, rows_scr, sems):
        def it_body(it, carry):
            def start(i, c):
                pltpu.make_async_copy(
                    tab_ref.at[(idx_ref[i] + it) % np.int32(nb)],
                    rows_scr.at[i],
                    sems.at[i % NSEM],
                ).start()
                return c

            c = jax.lax.fori_loop(0, q, start, carry)

            def drain(i, c):
                # one wait per issued copy, in issue order (DMA sems cannot be
                # counted with semaphore_wait)
                pltpu.make_async_copy(
                    tab_ref.at[(idx_ref[i] + it) % np.int32(nb)],
                    rows_scr.at[i],
                    sems.at[i % NSEM],
                ).wait()
                return c

            return jax.lax.fori_loop(0, q, drain, c)

        jax.lax.fori_loop(0, iters, it_body, np.int32(0))
        out_ref[:] = rows_scr[0:8, :]

    tab = jnp.asarray(np.random.randint(0, 1 << 20, (nb, cols), np.int32))
    idx = jnp.asarray(np.random.randint(0, nb, q).astype(np.int32))
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, cols), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((q, cols), jnp.int32),
            pltpu.SemaphoreType.DMA((NSEM,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    jf = jax.jit(f)
    sync(jf(idx, tab))
    dt = timeit(lambda: sync(jf(idx, tab)))
    return dt / iters


for tag, nb, q, cols in (("48B rows (occf-like)", 4_000_000, 512, False), ("512B rows", 2_000_000, 512, True)):
    try:
        per_it = dma_gather(nb, q, 50, row128=cols)
        print(f"[dma] {tag} q={q}: {per_it*1e6:.1f} us/iter ({q/per_it/1e6:.2f} Mrows/s)", flush=True)
    except Exception as e:
        print(f"[dma] {tag}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)

print("done", flush=True)
