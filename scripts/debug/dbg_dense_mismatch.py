"""Diagnose the dense-kernel mismatch seen by check_dense_tpu case 1."""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.ops import pallas_intersect as pdense


def brute(v0, e1, e2, o, d, tmax):
    t_best = tmax.copy()
    prim = np.full(o.shape[0], -1, np.int64)
    for i in range(v0.shape[0]):
        pvec = np.cross(d, e2[i])
        det = (e1[i] * pvec).sum(-1)
        ok = np.abs(det) > 1e-9
        inv = np.where(ok, 1.0 / np.where(det == 0, 1, det), 0.0)
        tvec = o - v0[i]
        b1 = (tvec * pvec).sum(-1) * inv
        qvec = np.cross(tvec, e1[i])
        b2 = (d * qvec).sum(-1) * inv
        t = (e2[i] * qvec).sum(-1) * inv
        h = ok & (b1 >= -1e-7) & (b2 >= -1e-7) & (b1 + b2 <= 1 + 1e-7) & (t > 1e-4)
        upd = h & (t < t_best)
        t_best = np.where(upd, t, t_best)
        prim = np.where(upd, i, prim)
    return t_best, prim


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
tmax = np.full(n_rays, 1e30, np.float32)

r16 = pdense.ray_vectors(jnp.asarray(o, jnp.float32),
                         jnp.asarray(d, jnp.float32),
                         jnp.asarray(tab["center"]))
t, prim = pdense.dense_intersect_loop(
    r16, jnp.asarray(tmax),
    jnp.asarray(tab["W"]),
    jnp.asarray(tab["chunk_bounds"]), tab["n_pad"])
t = np.asarray(t)
prim = np.asarray(prim)

t_ref, prim_ref = brute(v0, e1, e2, o, d, tmax.astype(np.float64))
hit = prim >= 0
hit_ref = prim_ref >= 0
dis = hit != hit_ref
print("mismatch rays:", dis.sum(), "of", n_rays)
print("  kernel-hit-only:", (hit & ~hit_ref).sum(),
      " ref-hit-only:", (~hit & hit_ref).sum())
order = np.asarray(tab.get("order", np.arange(n_tris)))
idx = np.nonzero(dis)[0]
# where ref hit but kernel missed: which chunk is the ref winner in?
ko = np.full(n_tris, -1)
if "order" in tab:
    ko[order] = np.arange(n_tris)     # orig prim -> kernel slot
miss = idx[~hit[idx]]
if len(miss):
    slots = ko[prim_ref[miss]] if "order" in tab else prim_ref[miss]
    print("missed winners' kernel slots:", slots[:20])
    print("  chunk ids:", (slots // pdense.CHUNK)[:20])
    print("  ray ids:", miss[:10], "-> ray tiles:", (miss // pdense.RAY_TILE)[:10])
# t error on BOTH-hit rays where prim agrees
both = hit & hit_ref
rel = np.abs(t[both] - t_ref[both]) / np.maximum(t_ref[both], 1e-6)
print("both-hit median rel t err:", np.median(rel), "max:", rel.max())
bad_t = np.nonzero(both)[0][rel > 1e-2]
print("rays with big t error:", len(bad_t), bad_t[:10])
if len(bad_t):
    b = bad_t[0]
    print("example ray", b, "kernel t/prim:", t[b], prim[b],
          "ref t/prim:", t_ref[b], prim_ref[b])
