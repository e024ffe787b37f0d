"""Per-op TPU microbench for the hapdiv per-node suspects.

Chains 101 dependent copies of each op (the per-node cadence) and reports
ms per op instance."""

import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

import ropebwt3_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def sync(x):
    return jax.tree.map(np.asarray, x)


def bench(name, fn, x, iters=101):
    f = jax.jit(lambda v: jax.lax.fori_loop(0, iters, lambda i, a: fn(a), v))
    sync(f(x))
    t0 = time.perf_counter()
    sync(f(x))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt/iters*1e3:.2f} ms/op", flush=True)


W = 4096
k64 = jnp.asarray(np.random.randint(0, 1 << 60, (W, 128)).astype(np.int64))
k32 = jnp.asarray(np.random.randint(0, 1 << 30, (W, 128)).astype(np.int32))
c64 = jnp.asarray(np.random.randint(0, 1 << 60, (W, 150)).astype(np.int64))
c32 = jnp.asarray(np.random.randint(0, 1 << 30, (W, 150)).astype(np.int32))

bench("sort (W,128) i64 desc", lambda a: jnp.sort(a ^ 1, axis=1, descending=True), k64)
bench("sort (W,128) i32 desc", lambda a: jnp.sort(a ^ 1, axis=1, descending=True), k32)
def apply_perm(a):
    perm = jnp.argsort(a, axis=1, stable=True)
    base = (jnp.arange(W, dtype=jnp.int32) * np.int32(a.shape[1]))[:, None]
    return jnp.take(a.reshape(-1), base + perm.astype(jnp.int32)) + jnp.ones((), a.dtype)


bench("argsort+perm (W,150) i64 stable", apply_perm, c64)
bench("argsort+perm (W,150) i32 stable", apply_perm, c32)


def segmax(a):
    head = jnp.concatenate([jnp.ones((W, 1), bool), a[:, 1:] > a[:, :-1]], 1)

    def comb(x, y):
        return x[0] | y[0], jnp.where(y[0], y[1], jnp.maximum(x[1], y[1]))

    _, out = jax.lax.associative_scan(comb, (head, a), axis=1)
    return out


bench("assoc segmax (W,150) i32", segmax, c32)
bench("flat take 2x(W,150) of (W*150)", lambda a: jnp.take(a.reshape(-1), (a.reshape(-1) % np.int32(W * 150)).astype(jnp.int32)).reshape(W, 150), c32)

# 40 small elementwise (W,150) i32 ops chained, per "op" = the whole group
def group(a):
    for _ in range(40):
        a = a + np.int32(1)
        a = jnp.where(a > np.int32(5), a - np.int32(2), a)
    return a

bench("40x elementwise (W,150) i32 group", group, c32)
print("done", flush=True)
