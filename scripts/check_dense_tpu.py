"""TPU correctness check for the dense Pluecker kernel (prefetch chunk lists).

Compares dense_intersect's closest-hit (t, prim) against a numpy
Moller-Trumbore brute force on random triangle soup, for coherent and
incoherent rays.
"""
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


def run_case(n_tris, n_rays, seed, coherent, motion=False):
    rs = np.random.RandomState(seed)
    base = rs.rand(n_tris, 3) * 10 - 5
    e1 = rs.randn(n_tris, 3) * 0.4
    e2 = rs.randn(n_tris, 3) * 0.4
    v0 = base
    if motion:
        dm = np.concatenate([rs.randn(n_tris, 9) * 0.3,
                             np.zeros((n_tris, 3))], 1)
        tab = pdense.build_dense_tables_motion(v0, e1, e2, dm)
        times = rs.rand(n_rays).astype(np.float32)
        # brute-force against the time-shifted geometry per ray is
        # O(P*B); instead shift every ray's geometry ONCE by testing at
        # a single shared time per sub-batch (4 strata)
    else:
        tab = pdense.build_dense_tables(v0, e1, e2)

    if coherent:
        o = np.tile(np.array([[0.0, 0.0, -20.0]]), (n_rays, 1))
        px = rs.rand(n_rays, 2) * 12 - 6
        tgt = np.concatenate([px, np.zeros((n_rays, 1))], 1)
        d = tgt - o
    else:
        o = rs.rand(n_rays, 3) * 30 - 15
        d = rs.randn(n_rays, 3)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    tmax = np.full(n_rays, 1e30, np.float32)

    r16 = pdense.ray_vectors(jnp.asarray(o, jnp.float32),
                             jnp.asarray(d, jnp.float32),
                             jnp.asarray(tab["center"]))
    if motion:
        # stratified shared times so the numpy brute force stays O(P*B)
        times = np.repeat(np.array([0.0, 1.0 / 3, 2.0 / 3, 1.0],
                                   np.float32), n_rays // 4)[:n_rays]
        t, prim = pdense.dense_intersect_loop(
            r16, jnp.asarray(tmax), jnp.asarray(tab["W"]),
            jnp.asarray(tab["chunk_bounds"]), tab["n_pad"],
            time=jnp.asarray(times))
        t = np.asarray(t)
        prim = np.asarray(prim)
        t_ref = tmax.astype(np.float64).copy()
        prim_ref = np.full(n_rays, -1, np.int64)
        for tv in np.unique(times):
            sel = times == tv
            tr, pr = brute(v0 + tv * dm[:, 0:3], e1 + tv * dm[:, 3:6],
                           e2 + tv * dm[:, 6:9], o[sel], d[sel],
                           tmax[sel].astype(np.float64))
            t_ref[sel] = tr
            prim_ref[sel] = pr
    else:
        t, prim = pdense.dense_intersect_loop(
            r16, jnp.asarray(tmax),
            jnp.asarray(tab["W"]),
            jnp.asarray(tab["chunk_bounds"]), tab["n_pad"])
        t = np.asarray(t)
        prim = np.asarray(prim)
        t_ref, prim_ref = brute(v0, e1, e2, o, d, tmax.astype(np.float64))
    hit = prim >= 0
    hit_ref = prim_ref >= 0
    agree_found = (hit == hit_ref).mean()
    both = hit & hit_ref
    # t agreement where both hit (kernel t is bf16x2, ~1e-4 rel)
    rel = np.abs(t[both] - t_ref[both]) / np.maximum(t_ref[both], 1e-6)
    prim_agree = (prim[both] == prim_ref[both]) | (rel < 1e-3)
    tag = ("coherent" if coherent else "incoherent") \
        + (" motion" if motion else "")
    print(f"{tag} P={n_tris} B={n_rays}: found-agree={agree_found:.4f} "
          f"hit-rate={hit_ref.mean():.3f} max-rel-t={rel.max() if both.any() else 0:.2e} "
          f"prim/t-agree={prim_agree.mean():.4f}")
    assert agree_found > 0.995, "found mismatch"
    if both.any():
        assert np.median(rel) < 1e-3, "t error"
        assert prim_agree.mean() > 0.99, "prim mismatch"


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    run_case(600, 2048, 0, coherent=True)
    run_case(600, 2048, 1, coherent=False)
    run_case(1500, 4096, 2, coherent=True)
    run_case(40, 1024, 3, coherent=False)   # single-chunk edge case
    run_case(600, 2048, 4, coherent=True, motion=True)
    run_case(1500, 4096, 5, coherent=False, motion=True)
    print("OK")
