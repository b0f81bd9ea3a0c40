"""BVH + primitive intersection tests (model: reference src/tests/shapes.cpp
randomized ray tests)."""
import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.accel.bvh import build_bvh
from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core.transform import Transform, translate, scale as scale_t
from pbrt_tpu.scene.ir import SceneBuilder, MaterialSpec
from pbrt_tpu.ops import intersect as isect


def _random_tri_scene(n_tris=200, seed=0):
    rs = np.random.RandomState(seed)
    b = SceneBuilder()
    m = b.add_material(MaterialSpec())
    base = rs.rand(n_tris, 3) * 10 - 5
    offs = rs.randn(n_tris, 2, 3) * 0.5
    verts = np.concatenate([base[:, None, :], base[:, None, :] + offs], 1)
    for i in range(n_tris):
        b.add_triangle_mesh(verts[i], [[0, 1, 2]], m)
    return b.build(), verts


def _brute_force(verts, o, d):
    v0 = verts[:, 0]
    e1 = verts[:, 1] - verts[:, 0]
    e2 = verts[:, 2] - verts[:, 0]
    t_best = np.full(o.shape[0], np.inf)
    hit_any = np.zeros(o.shape[0], bool)
    for i in range(verts.shape[0]):
        pvec = np.cross(d, e2[i])
        det = (e1[i] * pvec).sum(-1)
        ok = np.abs(det) > 1e-7
        inv = np.where(ok, 1.0 / np.where(det == 0, 1, det), 0.0)
        tvec = o - v0[i]
        b1 = (tvec * pvec).sum(-1) * inv
        qvec = np.cross(tvec, e1[i])
        b2 = (d * qvec).sum(-1) * inv
        t = (e2[i] * qvec).sum(-1) * inv
        h = ok & (b1 >= 0) & (b2 >= 0) & (b1 + b2 <= 1) & (t > 1e-5)
        upd = h & (t < t_best)
        t_best = np.where(upd, t, t_best)
        hit_any |= h
    return t_best, hit_any


def test_bvh_structure():
    rs = np.random.RandomState(1)
    lo = rs.rand(64, 3)
    hi = lo + rs.rand(64, 3)
    bvh = build_bvh(lo, hi, max_leaf_size=4)
    assert bvh.prim_order.shape == (64,)
    assert sorted(bvh.prim_order.tolist()) == list(range(64))
    # leaf prim counts cover all prims exactly once
    assert bvh.prim_count.sum() == 64
    N = bvh.n_nodes
    # every octant's miss link of the root is the sentinel
    assert (bvh.miss_links[:, 0] == N).all()
    # links are in range and every leaf is reachable in every octant
    assert bvh.hit_links.max() <= N and bvh.miss_links.max() <= N
    for octant in range(8):
        seen = set()
        node = 0
        steps = 0
        while node < N and steps < 10 * N:
            seen.add(node)
            if bvh.prim_offset[node] >= 0:
                node = bvh.miss_links[octant, node]
            else:
                node = bvh.hit_links[octant, node]
            steps += 1
        # full enter-everything walk must reach every node
        assert len(seen) == N, (octant, len(seen), N)


def test_bvh_vs_brute_force():
    scene, verts = _random_tri_scene()
    rs = np.random.RandomState(3)
    B = 256
    o = (rs.rand(B, 3) * 20 - 10).astype(np.float32)
    d = rs.randn(B, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ray = geom.Ray.make(jnp.asarray(o), jnp.asarray(d))
    t, prim, u, v, found = jax.jit(
        lambda r: isect.intersect(scene, r))(ray)
    t_ref, hit_ref = _brute_force(verts, o.astype(np.float64),
                                  d.astype(np.float64))
    found = np.asarray(found)
    assert (found == hit_ref).mean() > 0.99, "hit/miss mismatch"
    m = found & hit_ref
    assert np.allclose(np.asarray(t)[m], t_ref[m], rtol=1e-3, atol=1e-3)


def test_any_hit_matches():
    scene, verts = _random_tri_scene(50, seed=5)
    rs = np.random.RandomState(6)
    B = 128
    o = (rs.rand(B, 3) * 20 - 10).astype(np.float32)
    d = rs.randn(B, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ray = geom.Ray.make(jnp.asarray(o), jnp.asarray(d))
    occ = np.asarray(isect.occluded(scene, ray))
    _, hit_ref = _brute_force(verts, o.astype(np.float64), d.astype(np.float64))
    assert (occ == hit_ref).mean() > 0.99


def test_sphere_intersect():
    b = SceneBuilder()
    m = b.add_material(MaterialSpec())
    b.add_sphere(translate(0, 0, 0), 1.0, m)
    scene = b.build()
    o = jnp.asarray([[0, 0, -5], [0, 0, -5], [3, 0, -5]], jnp.float32)
    d = jnp.asarray([[0, 0, 1], [0.05, 0, 1], [0, 0, 1]], jnp.float32)
    d = geom.normalize(d)
    ray = geom.Ray.make(o, d)
    hit = isect.intersect_full(scene, ray)
    assert bool(hit.valid[0]) and bool(hit.valid[1]) and not bool(hit.valid[2])
    assert np.isclose(float(hit.t[0]), 4.0, atol=1e-4)
    # normal at front hit points back toward ray
    assert float(geom.dot(hit.ng, -d)[0]) > 0.99


def test_scaled_sphere():
    b = SceneBuilder()
    m = b.add_material(MaterialSpec())
    b.add_sphere(translate(10, 0, 0) * scale_t(2, 2, 2), 1.0, m)
    scene = b.build()
    ray = geom.Ray.make(jnp.asarray([[10, 0, -10.0]]),
                        jnp.asarray([[0, 0, 1.0]]))
    hit = isect.intersect_full(scene, ray)
    assert bool(hit.valid[0])
    assert np.isclose(float(hit.t[0]), 8.0, atol=1e-3)  # radius 2 world


def test_partial_sphere_zclip():
    b = SceneBuilder()
    m = b.add_material(MaterialSpec())
    # upper hemisphere only
    b.add_sphere(Transform(), 1.0, m, zmin=0.0, zmax=1.0)
    scene = b.build()
    o = jnp.asarray([[0, 0, 5.0], [0, 0, -5.0]], jnp.float32)
    d = jnp.asarray([[0, 0, -1.0], [0, 0, 1.0]], jnp.float32)
    ray = geom.Ray.make(o, d)
    hit = isect.intersect_full(scene, ray)
    # from above: hits top (t=4); from below: passes zmin cut, hits top
    # interior z=+1 surface at t=6
    assert bool(hit.valid[0]) and np.isclose(float(hit.t[0]), 4.0, atol=1e-3)
    assert bool(hit.valid[1]) and np.isclose(float(hit.t[1]), 6.0, atol=1e-3)


def test_instance_and_material_ids():
    b = SceneBuilder()
    m0 = b.add_material(MaterialSpec())
    m1 = b.add_material(MaterialSpec())
    b.add_triangle_mesh([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], [[0, 1, 2]],
                        m0, instance_id=7)
    b.add_triangle_mesh([[-1, -1, 2], [1, -1, 2], [0, 1, 2]], [[0, 1, 2]],
                        m1, instance_id=9)
    scene = b.build()
    ray = geom.Ray.make(jnp.asarray([[0, 0, -5.0], [0, 0, 5.0]]),
                        jnp.asarray([[0, 0, 1.0], [0, 0, -1.0]]))
    hit = isect.intersect_full(scene, ray)
    assert int(hit.instance[0]) == 7 and int(hit.material[0]) == 0
    assert int(hit.instance[1]) == 9 and int(hit.material[1]) == 1


def test_kdtree_matches_bvh():
    """Accelerator "kdtree" (real SAH kd-tree with primitive duplication,
    accel/kdtree.py; reference kdtreeaccel.cpp) must return exactly the
    BVH's intersections — accelerators change performance, never
    radiometry (VERDICT r2 item 8)."""
    import numpy as np
    import jax.numpy as jnp
    from pbrt_tpu.core import geometry as geom
    from pbrt_tpu.scene.ir import SceneBuilder, MaterialSpec
    from pbrt_tpu.core import transform as tfm
    from pbrt_tpu.ops import intersect as isect

    rs = np.random.RandomState(7)

    def make(accel):
        b = SceneBuilder()
        m = b.add_material(MaterialSpec())
        base = rs2.rand(400, 3) * 10 - 5
        offs = rs2.randn(400, 2, 3) * 0.6
        verts = np.concatenate([base[:, None, :], base[:, None, :] + offs],
                               1)
        for i in range(400):
            b.add_triangle_mesh(verts[i], [[0, 1, 2]], m)
        b.add_sphere(tfm.Transform(), 1.5, m)
        return b.build(accel=accel)

    rs2 = np.random.RandomState(7)
    s_kd = make("kdtree")
    rs2 = np.random.RandomState(7)
    s_bvh = make("bvh")
    assert s_kd.use_kd and not s_bvh.use_kd

    for coherent in (True, False):
        if coherent:
            o = np.tile(np.array([[0.0, 0.0, -12.0]]), (2048, 1))
            d = rs.rand(2048, 3) * 10 - 5 - o
        else:
            o = rs.rand(2048, 3) * 14 - 7
            d = rs.randn(2048, 3)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        ray = geom.Ray.make(jnp.asarray(o, jnp.float32),
                            jnp.asarray(d, jnp.float32))
        t1, p1, u1, v1, f1 = isect.intersect(s_kd, ray)
        t2, p2, u2, v2, f2 = isect.intersect(s_bvh, ray)
        f1, f2 = np.asarray(f1), np.asarray(f2)
        assert (f1 == f2).all()
        t1, t2 = np.asarray(t1), np.asarray(t2)
        assert np.allclose(t1[f1], t2[f1], rtol=1e-5)
        # prim may differ only where two prims share the exact same t
        same = np.asarray(p1) == np.asarray(p2)
        assert same[f1].mean() > 0.999, same[f1].mean()

    # shadow-ray occlusion agrees too
    tmax = np.full(2048, 9.0, np.float32)
    tmax[::5] = -1.0
    sray = geom.Ray.make(jnp.asarray(o, jnp.float32),
                         jnp.asarray(d, jnp.float32),
                         tmax=jnp.asarray(tmax))
    occ1 = np.asarray(isect.occluded(s_kd, sray))
    occ2 = np.asarray(isect.occluded(s_bvh, sray))
    assert (occ1 == occ2).all()


def test_kdtree_flat_quad_on_split_plane():
    """A zero-extent axis-aligned quad lying exactly on the best SAH
    split plane must stay in the tree (ADVICE r3: strict-inequality
    classification dropped such prims from BOTH children, leaving holes
    in kdtree scenes with axis-aligned walls/floors)."""
    import numpy as np
    import jax.numpy as jnp
    from pbrt_tpu.core import geometry as geom
    from pbrt_tpu.scene.ir import SceneBuilder, MaterialSpec
    from pbrt_tpu.ops import intersect as isect

    b = SceneBuilder()
    m = b.add_material(MaterialSpec())
    # flat quad at y=0 (two triangles), plus two prim clusters above and
    # below so SAH wants to split at exactly y=0 (empty-gap boundary)
    quad = np.array([[-4, 0, -4], [4, 0, -4], [4, 0, 4], [-4, 0, 4]],
                    np.float32)
    b.add_triangle_mesh(quad, [[0, 1, 2], [0, 2, 3]], m)
    rs = np.random.RandomState(0)
    for yc in (3.0, -3.0):
        base = rs.rand(40, 3).astype(np.float32)
        base[:, 1] = yc + base[:, 1] * 0.5
        for i in range(40):
            tri = np.stack([base[i], base[i] + [0.3, 0, 0],
                            base[i] + [0, 0.1, 0.3]])
            b.add_triangle_mesh(tri, [[0, 1, 2]], m)
    scene = b.build(accel="kdtree")
    assert scene.use_kd
    # rays straight down at the quad: every one must hit it
    o = np.stack([np.linspace(-3.5, 3.5, 64),
                  np.full(64, 10.0), np.linspace(-3.5, 3.5, 64)], -1)
    d = np.tile(np.array([[0.0, -1.0, 0.0]], np.float32), (64, 1))
    ray = geom.Ray.make(jnp.asarray(o, jnp.float32), jnp.asarray(d))
    t, p, u, v, f = isect.intersect(scene, ray)
    assert np.asarray(f).all(), "flat quad on split plane vanished"
    # every ray hits the quad (t=10) unless a cluster tri is in the way
    assert (np.asarray(t)[np.asarray(f)] <= 10.0 + 1e-3).all()
