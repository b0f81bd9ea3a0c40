import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp

x = jnp.arange(256.0)

@jax.jit
def tiny(x):
    return (x * 2).sum()

def timed(fn, *a, n=20):
    jax.block_until_ready(fn(*a))
    t0 = time.time()
    out = [fn(*a) for _ in range(n)]
    jax.block_until_ready(out)
    return (time.time() - t0) / n

print(f"tiny pre-gather : {timed(tiny, x)*1e3:.3f} ms")
# now run a program with a gather
idx = jnp.arange(1024, dtype=jnp.int32) % 7
tbl = jnp.arange(4096.0).reshape(32, 128)

@jax.jit
def g(idx):
    return tbl[idx].sum()

jax.block_until_ready(g(idx))
print(f"tiny post-gather: {timed(tiny, x)*1e3:.3f} ms")
