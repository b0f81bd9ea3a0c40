"""Micro-bench the coherence-sort machinery pieces on TPU (fresh process;
see verify skill note about gather-degradation — measure relative costs)."""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

B = 131072
rs = np.random.RandomState(0)
keys = jnp.asarray(rs.randint(0, 1 << 14, B), jnp.int32)
rows = jnp.asarray(rs.rand(B, 16), jnp.float32)
vals = jnp.asarray(rs.rand(B), jnp.float32)


def timed(fn, *a, n=20):
    jax.block_until_ready(fn(*a))
    t0 = time.time()
    out = [fn(*a) for _ in range(n)]
    jax.block_until_ready(out)
    return (time.time() - t0) / n


@jax.jit
def f_argsort(k):
    return jnp.argsort(k)


@jax.jit
def f_sort_packed(k):
    # pack key<<17 | lane into one u32, single-array sort
    lane = jnp.arange(B, dtype=jnp.int32)
    packed = (k << 17) | lane
    s = jax.lax.sort(packed)
    return s & ((1 << 17) - 1)


@jax.jit
def f_gather_rows(order, rows):
    return rows[order]


@jax.jit
def f_scatter(order, vals):
    return jnp.zeros_like(vals).at[order].set(vals)


@jax.jit
def f_counting_sort(k):
    # 512-bucket counting sort: rank via cumsum over one-hot
    nb = 512
    kb = jnp.clip(k >> 5, 0, nb - 1)
    oh = jax.nn.one_hot(kb, nb, dtype=jnp.int32)          # [B, nb]
    within = jnp.cumsum(oh, axis=0) - oh                  # exclusive
    counts = jnp.sum(oh, 0)
    starts = jnp.cumsum(counts) - counts
    pos = starts[kb] + jnp.sum(within * oh, 1)
    inv = jnp.zeros((B,), jnp.int32).at[pos].set(
        jnp.arange(B, dtype=jnp.int32))
    return inv


order = f_argsort(keys)
for name, fn, args in [
    ("argsort        ", f_argsort, (keys,)),
    ("sort packed u32", f_sort_packed, (keys,)),
    ("gather [B,16]  ", f_gather_rows, (order, rows)),
    ("scatter [B]    ", f_scatter, (order, vals)),
    ("counting sort  ", f_counting_sort, (keys,)),
]:
    try:
        dt = timed(fn, *args)
        print(f"{name}: {dt*1e3:7.3f} ms")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}")
