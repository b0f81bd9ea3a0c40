"""Why is pdense.dense_intersect 44x slower than the same code inlined?"""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.ops import pallas_intersect as pdense
from scripts.dissect_kernel import make_scene, make_rays

tab = make_scene()
W = jnp.asarray(tab["W"])
cb = jnp.asarray(tab["chunk_bounds"])
center = jnp.asarray(tab["center"])
n_pad = tab["n_pad"]
B = 65536

inner = pdense.dense_intersect.__wrapped__   # undecorated


@jax.jit
def jitted_outer(r16, tmax):
    t, prim = inner(r16, tmax, W, cb, n_pad)
    return t.sum() + prim.sum()


@jax.jit
def jitted_ray_and_call(seed):
    # everything inside one jit, calling the module's jitted fn (nested)
    k1, _ = jax.random.split(jax.random.PRNGKey(seed))
    px = jax.random.uniform(k1, (B, 2)) * 24 - 12
    o = jnp.concatenate([px[:, :1], px[:, 1:], jnp.full((B, 1), -40.0)], 1)
    tgt = jnp.concatenate([px * 0.8, jnp.zeros((B, 1))], 1)
    d = tgt - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    r16 = pdense.ray_vectors(o, d, center)
    tmax = jnp.full((B,), 1e30, jnp.float32)
    t, prim = pdense.dense_intersect(r16, tmax, W, cb, n_pad)
    return t.sum() + prim.sum()


def timeit(label, fn, argmaker, iters=5):
    float(fn(*argmaker(0)))
    t0 = time.time()
    for s in range(1, iters + 1):
        float(fn(*argmaker(s)))
    dt = (time.time() - t0) / iters
    print(f"{label}: {dt*1e3:.1f} ms/call", flush=True)


def eager_args(seed):
    o, d = make_rays(seed)
    r16 = pdense.ray_vectors(o, d, center)
    tmax = jnp.full((B,), 1e30, jnp.float32)
    return r16, tmax


timeit("inner-in-my-jit (eager ray gen)", jitted_outer, eager_args)
timeit("module jit, eager sums",
       lambda r16, tmax: pdense.dense_intersect(r16, tmax, W, cb, n_pad)[0].sum(),
       eager_args)
timeit("all-in-one-jit nested", jitted_ray_and_call, lambda s: (s,))
