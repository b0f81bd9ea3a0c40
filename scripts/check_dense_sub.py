"""Dense-kernel correctness check (TPU): sub-chunk kernel vs BVH loop.

Shoots coherent + incoherent ray batches at the cornell bench scene and
compares (prim, t) between the dense MXU path and the octant-threaded BVH
while_loop; then checks the any-hit flag agrees on found/not-found.
"""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.models import flagship
from pbrt_tpu.core import geometry as geom
from pbrt_tpu.ops import intersect as isect

scene, cam_ctor = flagship.cornell(tessellate=True)
B = 8192
rs = np.random.RandomState(0)

# mixed batch: hemisphere bounce-style rays from inside the box
o = rs.rand(B, 3) * 4.6 + 0.2
d = rs.randn(B, 3)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
ray = geom.Ray.make(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
                    tmax=jnp.full((B,), 1e30, jnp.float32),
                    wavelength=jnp.full((B,), 550.0, jnp.float32))


@jax.jit
def run_dense(ray):
    return isect._intersect_dense(scene, ray)


@jax.jit
def run_bvh(ray):
    return isect._intersect_bvh(scene, ray)


@jax.jit
def run_dense_anyhit(ray):
    return isect._intersect_dense(
        scene, ray, anyhit_mask=jnp.ones(ray.o.shape[0], bool))


td, pd_, ud, vd, fd = jax.block_until_ready(run_dense(ray))
tb, pb, ub, vb, fb = jax.block_until_ready(run_bvh(ray))

td, pd_, fd = np.asarray(td), np.asarray(pd_), np.asarray(fd)
tb, pb, fb = np.asarray(tb), np.asarray(pb), np.asarray(fb)

agree_found = np.mean(fd == fb)
both = fd & fb
t_rel = np.abs(td[both] - tb[both]) / np.maximum(tb[both], 1e-6)
prim_agree = np.mean(pd_[both] == pb[both])
print(f"found agree: {agree_found:.5f}  ({np.sum(fd != fb)} of {B})")
print(f"prim agree (both found): {prim_agree:.5f}")
print(f"t rel err: median {np.median(t_rel):.2e} max {t_rel.max():.2e}")
# disagreeing prims are fine when t ties (shared edges); check t matches
dis = both & (pd_ != pb)
if dis.any():
    dt = np.abs(td[dis] - tb[dis]) / np.maximum(tb[dis], 1e-6)
    print(f"prim-disagree lanes: {dis.sum()}, t rel err max {dt.max():.2e}")

ta, pa, _, _, fa = jax.block_until_ready(run_dense_anyhit(ray))
fa = np.asarray(fa)
print(f"anyhit found agree vs closest found: {np.mean(fa == fd):.5f} "
      f"({np.sum(fa != fd)} diff)")

ok = (agree_found > 0.999 and np.median(t_rel) < 1e-4
      and np.mean(fa == fd) > 0.999)
print("OK" if ok else "FAIL")
sys.exit(0 if ok else 1)
