"""Microbenchmark: landmark-indexed scatter-add patterns on the TPU vs
alternative formulations (sort-based segment sum, one-hot matmul at small P).
Decides how to speed up the BA/culling kernels."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.utils import compile_cache

compile_cache.enable()


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0:1])


def timeit(fn, *a, reps=20, name=""):
    out = fn(*a)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    sync(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms")


F = 28 * 1024
L = 32768
P = 28
rng = np.random.default_rng(0)
lidx = jnp.asarray(rng.integers(0, L, F).astype(np.int32))
pidx = jnp.asarray(np.repeat(np.arange(P), 1024).astype(np.int32))
v3 = jnp.asarray(rng.normal(size=(F, 3)).astype(np.float32))
v33 = jnp.asarray(rng.normal(size=(F, 3, 3)).astype(np.float32))
v6 = jnp.asarray(rng.normal(size=(F, 6)).astype(np.float32))
v66 = jnp.asarray(rng.normal(size=(F, 6, 6)).astype(np.float32))

print(f"backend: {jax.devices()[0].platform}  F={F} L={L} P={P}", flush=True)

timeit(jax.jit(lambda v: jnp.zeros((L, 3)).at[lidx].add(v)), v3,
       name="scatter-add (F,3)->(L,3)")
timeit(jax.jit(lambda v: jnp.zeros((L, 3, 3)).at[lidx].add(v)), v33,
       name="scatter-add (F,3,3)->(L,3,3)")
timeit(jax.jit(lambda v: jnp.zeros((P, 6)).at[pidx].add(v)), v6,
       name="scatter-add (F,6)->(P,6)")
timeit(jax.jit(lambda v: jnp.zeros((P, 6, 6)).at[pidx].add(v)), v66,
       name="scatter-add (F,6,6)->(P,6,6)")

# one-hot matmul for the pose side (P small)
onehot_p = jax.nn.one_hot(pidx, P, dtype=jnp.float32)  # (F, P)

timeit(jax.jit(lambda v: jnp.einsum("fp,fi->pi", onehot_p, v)), v6,
       name="one-hot matmul (F,6)->(P,6)")
timeit(jax.jit(lambda v: jnp.einsum(
    "fp,fij->pij", onehot_p, v)), v66,
       name="one-hot matmul (F,6,6)->(P,6,6)")

# structured landmark accumulation: factors laid out (W, N) where within a
# row each landmark appears at most once -> scatter .set per row, sum rows
lidx_wn = jnp.asarray(rng.permuted(
    np.tile(np.arange(0, L, L // 1024)[:1024], (P, 1)), axis=1).astype(np.int32))
v3_wn = v3.reshape(P, 1024, 3)


def rowwise_set_sum(v):
    def row(l, x):
        return jnp.zeros((L, 3)).at[l].set(x)
    return jax.vmap(row)(lidx_wn, v).sum(0)


timeit(jax.jit(rowwise_set_sum), v3_wn,
       name="rowwise set+sum (W,N,3)->(L,3)")

# gather (for comparison)
timeit(jax.jit(lambda v: v[lidx]), jnp.asarray(
    rng.normal(size=(L, 3)).astype(np.float32)),
       name="gather (L,3)[F]")

# sort-based segment sum
perm = jnp.argsort(lidx)


def sorted_scatter(v):
    return jnp.zeros((L, 3)).at[lidx[perm]].add(v[perm])


timeit(jax.jit(sorted_scatter), v3, name="pre-sorted scatter-add (F,3)")
