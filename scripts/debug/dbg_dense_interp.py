"""Run the failing check_dense_tpu case-1 rays under Pallas interpret
mode (CPU) to learn whether the mismatch is semantic or hardware."""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.ops import pallas_intersect as pdense
from dbg_dense_mismatch import brute  # noqa: reuse  (same dir)

rs = np.random.RandomState(0)
n_tris, n_rays = 600, 2048
base = rs.rand(n_tris, 3) * 10 - 5
e1 = rs.randn(n_tris, 3) * 0.4
e2 = rs.randn(n_tris, 3) * 0.4
v0 = base
tab = pdense.build_dense_tables(v0, e1, e2)

o = np.tile(np.array([[0.0, 0.0, -20.0]]), (n_rays, 1))
px = rs.rand(n_rays, 2) * 12 - 6
tgt = np.concatenate([px, np.zeros((n_rays, 1))], 1)
d = tgt - o
d = d / np.linalg.norm(d, axis=-1, keepdims=True)
# keep only the first 1024 rays (tiles 0-1, which contain mismatches)
o, d = o[:1024], d[:1024]
tmax = np.full(1024, 1e30, np.float32)

r16 = pdense.ray_vectors(jnp.asarray(o, jnp.float32),
                         jnp.asarray(d, jnp.float32),
                         jnp.asarray(tab["center"]))
t, prim = pdense.dense_intersect_loop(
    r16, jnp.asarray(tmax),
    jnp.asarray(tab["W"]),
    jnp.asarray(tab["chunk_bounds"]), tab["n_pad"], interpret=True)
t = np.asarray(t)
prim = np.asarray(prim)

t_ref, prim_ref = brute(v0, e1, e2, o, d, tmax.astype(np.float64))
hit = prim >= 0
hit_ref = prim_ref >= 0
dis = hit != hit_ref
print("INTERPRET mismatch rays:", dis.sum(), "of 1024")
print("  kernel-hit-only:", (hit & ~hit_ref).sum(),
      " ref-hit-only:", (~hit & hit_ref).sum())
both = hit & hit_ref
rel = np.abs(t[both] - t_ref[both]) / np.maximum(t_ref[both], 1e-6)
print("both-hit median rel:", np.median(rel), "max:", rel.max())
idx = np.nonzero(dis)[0]
print("mismatch ray ids:", idx[:20])
