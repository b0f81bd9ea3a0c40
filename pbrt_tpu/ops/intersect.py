"""Ray-scene intersection: skip-link BVH traversal over lockstep ray batches.

This replaces the reference's stack-based LinearBVHNode traversal + per-shape
virtual Intersect calls (bvh.cpp:662-700, triangle.cpp:188-426, sphere.cpp)
with a single `lax.while_loop` advancing every ray through the threaded BVH
in lockstep:

    box hit & interior -> next node (i+1, DFS child)
    box hit & leaf     -> test the leaf's <=K primitives, then skip[i]
    box miss           -> skip[i]

All rays share the iteration count of the slowest ray but there is no
divergence *inside* an iteration — every lane does one AABB slab test and K
primitive tests (triangle Moller-Trumbore or quadric, selected by mask).
A Pallas variant with per-ray early exit lives in ops/pallas_bvh.py.

Hit records are SoA (reference SurfaceInteraction, interaction.h:103-160)
including the fork's instanceId/materialId columns.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from pbrt_tpu.core import geometry as geom
from pbrt_tpu.scene.ir import (SceneData, PRIM_TRIANGLE, PRIM_SPHERE,
                               PRIM_CYLINDER, PRIM_DISK, PRIM_CONE,
                               PRIM_PARABOLOID, PRIM_HYPERBOLOID, MAT_NONE)

F32_MAX = jnp.float32(3.4e38)

# CI escape hatch: when True, `intersect()` routes dense-compiled scenes
# through the Pallas TPU *interpreter* even off-TPU, so the dense kernel
# (the production TPU path) is exercised by the CPU test suite
# (tests/test_dense_kernel.py).  Tests toggling this must
# jax.clear_caches() — the flag is read at trace time.
FORCE_DENSE_INTERPRET = False


@struct.dataclass
class Hit:
    """SoA surface-interaction batch."""
    valid: jnp.ndarray       # [B] bool
    t: jnp.ndarray           # [B]
    p: jnp.ndarray           # [B,3]
    ng: jnp.ndarray          # [B,3] geometric normal (unit)
    ns: jnp.ndarray          # [B,3] shading normal (unit)
    uv: jnp.ndarray          # [B,2]
    wo: jnp.ndarray          # [B,3]
    prim: jnp.ndarray        # [B] prim index (BVH order)
    material: jnp.ndarray    # [B] materialId (fork: interaction.h:155)
    light: jnp.ndarray       # [B] area light idx or -1
    instance: jnp.ndarray    # [B] instanceId (fork: interaction.h:154)
    # uv-per-world-unit at the hit (sqrt of uv-area / world-area for
    # triangles): a ray cone of world radius r covers ~r*uv_density in
    # texture space — the wavefront stand-in for the reference's
    # dudx/dvdx ray differentials (interaction.cpp ComputeDifferentials)
    uv_density: jnp.ndarray = None   # [B]
    # per-mesh face index (fork faceIndex; drives ptex per-face lookup)
    face: jnp.ndarray = None         # [B]
    # first-hit uv screen-space gradients [dudx,dvdx,dudy,dvdy] from
    # camera ray differentials (reference interaction.cpp
    # ComputeDifferentials); None when the trace carries no differentials
    duv: jnp.ndarray = None          # [B,4]
    # world-space footprint offsets + shading-normal screen gradients
    # (isect.dpdx/dpdy and dndu*dudx+dndv*dvdx of integrator.cpp:
    # 361-368) — carried so specular bounces can propagate the
    # differentials (SpecularReflect/Transmit, integrator.cpp:344-429)
    dpdx: jnp.ndarray = None         # [B,3]
    dpdy: jnp.ndarray = None         # [B,3]
    dndx: jnp.ndarray = None         # [B,3]
    dndy: jnp.ndarray = None         # [B,3]


# ---------------------------------------------------------------------------
# primitive tests
# ---------------------------------------------------------------------------

def ray_triangle(o, d, v0, e1, e2, tmax):
    """Watertight ray-triangle test; o,d [B,3] vs triangles [B,K,3].

    Returns (t, b1, b2, hit) each [B,K].  Implements the reference's
    translate/permute/shear formulation (triangle.cpp:188-310): the 2D
    edge functions of triangles sharing an edge are computed from the
    SAME sheared vertex coordinates, so their signs are consistent and a
    ray through a shared edge can never slip between both triangles (the
    crack Moller-Trumbore allows).  The reference's exact-zero
    double-precision fallback is omitted — an exactly-zero f32 edge
    function already passes the mixed-sign test for both neighbors, and
    closest-hit resolution picks one.
    """
    B = o.shape[0]
    # permutation: kz = argmax |d|, then (kx, ky, kz) cyclic — per ray
    ad = jnp.abs(d)
    kz = jnp.argmax(ad, axis=-1)                       # [B]
    kx = (kz + 1) % 3
    ky = (kx + 1) % 3

    def pick(v, k):
        # v [B,...,3], k [B] -> component k per lane
        return jnp.take_along_axis(
            v, k.reshape((B,) + (1,) * (v.ndim - 1)), axis=-1)[..., 0]

    dz = pick(d, kz)
    dx = pick(d, kx)
    dy = pick(d, ky)
    sx = -dx / dz
    sy = -dy / dz
    sz = 1.0 / dz

    p1 = v0 + e1
    p2 = v0 + e2

    def shear(p):
        # translate to ray origin, permute (per-B k over [B,K,3]), shear
        pt = p - o[:, None, :]
        xx = jnp.take_along_axis(pt, jnp.broadcast_to(
            kx[:, None, None], pt.shape[:2] + (1,)), axis=-1)[..., 0]
        yy = jnp.take_along_axis(pt, jnp.broadcast_to(
            ky[:, None, None], pt.shape[:2] + (1,)), axis=-1)[..., 0]
        zz = jnp.take_along_axis(pt, jnp.broadcast_to(
            kz[:, None, None], pt.shape[:2] + (1,)), axis=-1)[..., 0]
        return (xx + sx[:, None] * zz, yy + sy[:, None] * zz, zz)

    x0, y0, z0 = shear(v0)
    x1, y1, z1 = shear(p1)
    x2, y2, z2 = shear(p2)

    # 2D edge functions (triangle.cpp:263).  The reference gets exact
    # shared-edge antisymmetry from identical fp expressions (+ a double
    # fallback at exact zero); XLA's FMA contraction breaks that, so a
    # near-zero edge value (within fp error of its terms) counts as ON
    # the edge — both neighbors of a shared edge then hit and closest-hit
    # selection picks one, instead of the ray slipping through a crack.
    e0 = x1 * y2 - y1 * x2
    e1f = x2 * y0 - y2 * x0
    e2f = x0 * y1 - y0 * x1
    m0 = jnp.abs(x1 * y2) + jnp.abs(y1 * x2)
    m1 = jnp.abs(x2 * y0) + jnp.abs(y2 * x0)
    m2 = jnp.abs(x0 * y1) + jnp.abs(y0 * x1)
    TOL = 4e-7                      # a few ulps of the term magnitude
    on0 = jnp.abs(e0) <= m0 * TOL
    on1 = jnp.abs(e1f) <= m1 * TOL
    on2 = jnp.abs(e2f) <= m2 * TOL
    e0 = jnp.where(on0, 0.0, e0)
    e1f = jnp.where(on1, 0.0, e1f)
    e2f = jnp.where(on2, 0.0, e2f)
    neg = (e0 < 0) | (e1f < 0) | (e2f < 0)
    pos = (e0 > 0) | (e1f > 0) | (e2f > 0)
    det = e0 + e1f + e2f
    ok = ~(neg & pos) & (det != 0)

    t_scaled = (e0 * z0 + e1f * z1 + e2f * z2) * sz[:, None]
    # sign-consistent range test (triangle.cpp:286-293)
    tm = tmax[:, None] * det
    bad = jnp.where(det < 0,
                    (t_scaled >= 0) | (t_scaled < tm),
                    (t_scaled <= 0) | (t_scaled > tm))
    ok = ok & ~bad
    inv_det = 1.0 / jnp.where(det == 0, 1.0, det)
    t = t_scaled * inv_det
    b1 = e1f * inv_det        # weight of p1 = v0 + e1
    b2 = e2f * inv_det        # weight of p2 = v0 + e2
    return t, b1, b2, ok


def _quadric_ts(qtype, params, oo, od):
    """Solve the quadric for both roots in object space.

    oo,od: [B,K,3] object-space origin/dir. Returns (t0, t1, ok) with
    t0<=t1.  Implements sphere/cylinder/disk/cone/paraboloid/hyperboloid
    (reference: src/shapes/*.cpp quadratic setups).
    """
    r = params[..., 0]
    zmin = params[..., 1]
    zmax = params[..., 2]
    ox, oy, oz = oo[..., 0], oo[..., 1], oo[..., 2]
    dx, dy, dz = od[..., 0], od[..., 1], od[..., 2]

    is_sphere = qtype == PRIM_SPHERE
    is_cyl = qtype == PRIM_CYLINDER
    is_disk = qtype == PRIM_DISK
    is_cone = qtype == PRIM_CONE
    is_par = qtype == PRIM_PARABOLOID

    # default quadratic coefficients (sphere)
    a = dx * dx + dy * dy + dz * dz
    b = 2 * (dx * ox + dy * oy + dz * oz)
    c = ox * ox + oy * oy + oz * oz - r * r
    # cylinder
    a = jnp.where(is_cyl, dx * dx + dy * dy, a)
    b = jnp.where(is_cyl, 2 * (dx * ox + dy * oy), b)
    c = jnp.where(is_cyl, ox * ox + oy * oy - r * r, c)
    # cone: height h = zmax, radius r at z=0 tapering to 0 at h
    h = zmax
    k = (r / jnp.where(h == 0, 1.0, h)) ** 2
    a = jnp.where(is_cone, dx * dx + dy * dy - k * dz * dz, a)
    b = jnp.where(is_cone, 2 * (dx * ox + dy * oy - k * dz * (oz - h)), b)
    c = jnp.where(is_cone, ox * ox + oy * oy - k * (oz - h) ** 2, c)
    # paraboloid: z = h*(x^2+y^2)/r^2
    kp = zmax / jnp.where(r == 0, 1.0, r * r)
    a = jnp.where(is_par, kp * (dx * dx + dy * dy), a)
    b = jnp.where(is_par, 2 * kp * (dx * ox + dy * oy) - dz, b)
    c = jnp.where(is_par, kp * (ox * ox + oy * oy) - oz, c)

    disc = b * b - 4 * a * c
    ok = disc >= 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    # numerically stable roots
    q = jnp.where(b < 0, -0.5 * (b - sq), -0.5 * (b + sq))
    safe_a = jnp.where(a == 0, 1.0, a)
    safe_q = jnp.where(q == 0, 1.0, q)
    t0 = q / safe_a
    t1 = c / safe_q
    lin = jnp.abs(a) < 1e-12
    # disk: plane z = zmin ("height"); single root
    t_disk = (zmin - oz) / jnp.where(dz == 0, 1.0, dz)
    t0 = jnp.where(is_disk, t_disk, jnp.minimum(t0, t1))
    t1 = jnp.where(is_disk, t_disk, jnp.maximum(q / safe_a, c / safe_q))
    ok = jnp.where(is_disk, dz != 0, ok & ~lin)
    return t0, t1, ok


def ray_quadric(qtype, w2o, params, o, d, tmax, clip=True):
    """Quadric intersection: o,d [B,3]; w2o [B,K,4,4]; params [B,K,4].

    Returns (t, u, v, hit) in world-space t units.  `clip=False` skips the
    z/phi extent tests (static specialization for full-sphere-only scenes).
    """
    oo = jnp.einsum('bkij,bj->bki', w2o[..., :3, :3], o) + w2o[..., :3, 3]
    od = jnp.einsum('bkij,bj->bki', w2o[..., :3, :3], d)
    t0, t1, ok = _quadric_ts(qtype, params, oo, od)

    zmin = params[..., 1]
    zmax = params[..., 2]
    phimax = params[..., 3]
    r = params[..., 0]
    is_disk = qtype == PRIM_DISK

    def clip_ok(t):
        ph = oo + t[..., None] * od
        if not clip:
            return jnp.ones(ph.shape[:-1], bool), ph, jnp.zeros(ph.shape[:-1])
        z_ok = (ph[..., 2] >= jnp.minimum(zmin, zmax) - 1e-5) & \
               (ph[..., 2] <= jnp.maximum(zmin, zmax) + 1e-5)
        # disks: radial clipping, zmax slot stores inner radius
        rad2 = ph[..., 0] ** 2 + ph[..., 1] ** 2
        z_ok = jnp.where(is_disk, rad2 <= r * r, z_ok)
        phi = jnp.arctan2(ph[..., 1], ph[..., 0])
        phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
        return z_ok & (phi <= phimax + 1e-5), ph, phi

    ok0, p0, phi0 = clip_ok(t0)
    ok1, p1, phi1 = clip_ok(t1)
    use0 = ok & (t0 > 1e-5) & (t0 < tmax[:, None]) & ok0
    use1 = ok & (t1 > 1e-5) & (t1 < tmax[:, None]) & ok1 & ~use0
    hit = use0 | use1
    t = jnp.where(use0, t0, t1)
    # uv is reconstructed once per final hit in make_hit (quadric_uv) —
    # not per traversal step — to keep the hot loop transcendental-free
    return t, hit & (jnp.abs(t) < F32_MAX)


def quadric_uv(qtype, params, ph):
    """Parameterization at object-space hit point ph (sphere.cpp:190 etc).

    arccos/arctan2/sqrt are guarded away from their infinite-derivative
    points: reverse-mode camera/geometry gradients otherwise pick up
    0 * inf = NaN through these even when uv itself has zero cotangent.
    """
    r = params[..., 0]
    phimax = params[..., 3]
    is_disk = qtype == PRIM_DISK
    px, py = ph[..., 0], ph[..., 1]
    deg = (px * px + py * py) < 1e-12
    phi = jnp.arctan2(jnp.where(deg, 0.0, py), jnp.where(deg, 1.0, px))
    phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
    u = phi / jnp.maximum(phimax, 1e-6)
    zc = jnp.clip(ph[..., 2] / jnp.maximum(r, 1e-6),
                  -1.0 + 1e-6, 1.0 - 1e-6)
    v = jnp.where(is_disk,
                  jnp.sqrt(px * px + py * py + 1e-20)
                  / jnp.maximum(r, 1e-6),
                  (jnp.arccos(zc)) / jnp.pi)
    return u, v


def _animated_quad_w2o(scene: SceneData, time):
    """Per-(ray, quad) interpolated world-to-object affine [B,Q,3,4] for
    scenes with two-keyframe quadric transforms (reference:
    AnimatedTransform applied per ray, transform.cpp:255+).  Assumes the
    default TransformTimes 0..1 window."""
    from pbrt_tpu.core import transform as tfm
    u = jnp.clip(time, 0.0, 1.0)[:, None]                      # [B,1]
    m34 = tfm.interp_matrix_j(scene.quad_anim_t[None],
                              scene.quad_anim_q[None],
                              scene.quad_anim_s[None],
                              jnp.broadcast_to(
                                  u, (u.shape[0],
                                      scene.quad_params.shape[0])))
    return tfm.affine_inverse_j(m34)                           # [B,Q,3,4]


def all_quadrics_test(scene: SceneData, o, d, tmax, time=None):
    """Test every quadric in the scene against every ray — done ONCE
    outside the BVH loop (quadric counts are small; triangles dominate).

    Returns (t [B], prim [B], hit [B]).
    """
    Q = scene.quad_params.shape[0]
    if scene.has_animated_quads and time is not None:
        w34 = _animated_quad_w2o(scene, time)                  # [B,Q,3,4]
        oo = jnp.einsum('bqij,bj->bqi', w34[..., :3], o) + w34[..., 3]
        od = jnp.einsum('bqij,bj->bqi', w34[..., :3], d)
    else:
        w2o = scene.quad_w2o
        oo = jnp.einsum('qij,bj->bqi', w2o[:, :3, :3], o) \
            + w2o[None, :, :3, 3]
        od = jnp.einsum('qij,bj->bqi', w2o[:, :3, :3], d)
    qtype = scene.quad_type[None, :]
    params = scene.quad_params[None, :, :]
    t0, t1, ok = _quadric_ts(qtype, params, oo, od)

    zmin = params[..., 1]
    zmax = params[..., 2]
    phimax = params[..., 3]
    r = params[..., 0]
    is_disk = qtype == PRIM_DISK

    def clip_ok(t):
        if not scene.clip_quadrics:
            return jnp.ones(t.shape, bool)
        ph = oo + t[..., None] * od
        z_ok = (ph[..., 2] >= jnp.minimum(zmin, zmax) - 1e-5) & \
               (ph[..., 2] <= jnp.maximum(zmin, zmax) + 1e-5)
        rad2 = ph[..., 0] ** 2 + ph[..., 1] ** 2
        z_ok = jnp.where(is_disk, rad2 <= r * r, z_ok)
        phi = jnp.arctan2(ph[..., 1], ph[..., 0])
        phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
        return z_ok & (phi <= phimax + 1e-5)

    use0 = ok & (t0 > 1e-5) & (t0 < tmax[:, None]) & clip_ok(t0)
    use1 = ok & (t1 > 1e-5) & (t1 < tmax[:, None]) & clip_ok(t1) & ~use0
    hit = use0 | use1
    t = jnp.where(use0, t0, t1)
    t_masked = jnp.where(hit, t, F32_MAX)
    # min-reduction + one-hot select instead of argmin/take_along_axis/
    # table gather: those lower to row-serial TPU gathers (~2GB/s) that
    # profiled at ~4ms per 262k-ray call on v5e — 20+ ms/pass on the
    # killeroo bench — while the reductions below are plain VPU passes
    t_best = jnp.min(t_masked, axis=1)
    hit_any = jnp.any(hit, axis=1)
    eq = t_masked <= t_best[:, None]
    first = eq & (jnp.cumsum(eq.astype(jnp.int32), axis=1) == 1)
    prim = jnp.sum(jnp.where(first, scene.quad_prim[None, :], 0), axis=1)
    return t_best, prim, hit_any


def quadric_normal_obj(qtype, params, ph):
    """Object-space outward normal at object-space hit point ph [...,3]."""
    r = params[..., 0]
    zmax = params[..., 2]
    n_sphere = ph
    n_cyl = jnp.stack([ph[..., 0], ph[..., 1], jnp.zeros_like(ph[..., 0])], -1)
    n_disk = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), ph.shape)
    h = jnp.where(zmax == 0, 1.0, zmax)
    k = (r / h) ** 2
    n_cone = jnp.stack([ph[..., 0], ph[..., 1], k * (h - ph[..., 2])], -1)
    kp = zmax / jnp.where(r == 0, 1.0, r * r)
    n_par = jnp.stack([2 * kp * ph[..., 0], 2 * kp * ph[..., 1],
                       -jnp.ones_like(ph[..., 0])], -1)
    n = n_sphere
    n = jnp.where((qtype == PRIM_CYLINDER)[..., None], n_cyl, n)
    n = jnp.where((qtype == PRIM_DISK)[..., None], n_disk, n)
    n = jnp.where((qtype == PRIM_CONE)[..., None], n_cone, n)
    n = jnp.where((qtype == PRIM_PARABOLOID)[..., None], n_par, n)
    return n


# ---------------------------------------------------------------------------
# BVH traversal
# ---------------------------------------------------------------------------

def _leaf_test(scene: SceneData, o, d, offs, count, t_best, leaf_mask,
               time=None):
    """Test the K primitives of each lane's leaf. Returns updated
    (t_best, prim_best, b1, b2) candidates."""
    K = scene.max_leaf
    P = scene.prim_type.shape[0]
    pid = offs[:, None] + jnp.arange(K)[None, :]            # [B,K]
    valid = leaf_mask[:, None] & (jnp.arange(K)[None, :] < count[:, None])
    pid_safe = jnp.clip(pid, 0, P - 1)

    # triangles only: single packed gather [B,K,12].  Quadrics are tested
    # OUTSIDE the traversal loop (all_quadrics_test) so the hot loop never
    # gathers 4x4 matrices; tri_packed rows for quadric prims are zeroed
    # degenerate triangles that can never hit.
    tp = scene.tri_packed[pid_safe]
    v0 = tp[..., 0:3]
    e1 = tp[..., 3:6]
    e2 = tp[..., 6:9]
    if scene.has_animated_mesh and time is not None:
        # mesh motion blur: per-ray time interpolates the two-keyframe
        # vertex positions (reference TransformedPrimitive +
        # AnimatedTransform, primitive.cpp:73-89)
        tm = scene.tri_motion[pid_safe]
        u = jnp.clip(time, 0.0, 1.0)[:, None, None]
        v0 = v0 + u * tm[..., 0:3]
        e1 = e1 + u * tm[..., 3:6]
        e2 = e2 + u * tm[..., 6:9]
    t_tri, b1, b2, hit_tri = ray_triangle(o, d, v0, e1, e2, t_best)
    t_cand, hit = t_tri, valid & hit_tri
    u_cand, v_cand = b1, b2

    t_masked = jnp.where(hit, t_cand, F32_MAX)
    k_best = jnp.argmin(t_masked, axis=1)                    # [B]
    t_new = jnp.take_along_axis(t_masked, k_best[:, None], 1)[:, 0]
    hit_best = jnp.take_along_axis(hit, k_best[:, None], 1)[:, 0]
    any_hit = hit_best & (t_new < t_best)
    prim_new = jnp.take_along_axis(pid_safe, k_best[:, None], 1)[:, 0]
    u_new = jnp.take_along_axis(u_cand, k_best[:, None], 1)[:, 0]
    v_new = jnp.take_along_axis(v_cand, k_best[:, None], 1)[:, 0]
    return any_hit, t_new, prim_new, u_new, v_new


def intersect(scene: SceneData, ray: geom.Ray, any_hit: bool = False,
              presorted: bool = False, anyhit_mask=None):
    """Closest-hit (or any-hit) query.

    Dispatches to the dense MXU Pluecker kernel (ops/pallas_intersect.py)
    when the scene is compiled for it, else to the octant-threaded BVH
    `lax.while_loop`.  Returns (t, prim, u, v, found) arrays [B]; use
    `make_hit` to build the full surface-interaction record.
    presorted: skip the coherence sort (camera batches arrive in scanline
    order, which is already tile-coherent).
    anyhit_mask: optional [B] bool — flagged lanes (shadow rays) stop at
    their first accepted hit in the dense kernel (IntersectP semantics,
    scene.h:59); their returned t is meaningless, only `found`/prim count.
    """
    import jax as _jax
    # visibility is not differentiated (no edge-sampling / boundary
    # reparameterization); without this the BVH while_loop becomes
    # structurally reverse-mode-differentiable whenever sampled ray
    # directions depend on material params (e.g. GGX alpha through the
    # packed material table) and transposition fails.  Material/light
    # gradients flow through shading, not through the hit search.
    ray = _jax.tree.map(_jax.lax.stop_gradient, ray)
    if scene.use_dense and (_jax.default_backend() != "cpu"
                            or FORCE_DENSE_INTERPRET):
        if anyhit_mask is None and any_hit:
            anyhit_mask = jnp.ones(ray.o.shape[0], bool)
        return _intersect_dense(scene, ray, presorted=presorted,
                                anyhit_mask=anyhit_mask,
                                interpret=FORCE_DENSE_INTERPRET)
    if scene.use_kd:
        return _intersect_kd(scene, ray, any_hit)
    return _intersect_bvh(scene, ray, any_hit)


def _coherence_key(scene: SceneData, o, d, tmax):
    """Sort key packing (dead, direction octant, Morton cell).

    Bounce/shadow batches arrive incoherent, so every 512-ray tile touches
    every chunk and the work-queue cull does nothing.  Sorting gathers rays
    of similar origin+octant into the same tile, restoring the cull for
    secondary rays; dead lanes (tmax<=0) sink to the back where whole
    tiles drop out of the queue.  Camera batches are near-sorted already
    and pass through unharmed.  19 bits: dead | octant(3) | morton(15).
    A 512-ray tile's chunk queue is the UNION of its lanes' chunk lists,
    so cell granularity directly sets the union penalty — the earlier
    9-bit morton (8^3 cells, scene/8-sized) left ~3x more chunks queued
    per tile than its median lane needed (measured on killeroo bounce
    batches); 32^3 cells tighten tiles to near per-ray lists.
    """
    lo = scene.dense_cb[:, 0:3].min(0)
    hi = scene.dense_cb[:, 4:7].max(0)
    cell = jnp.clip(((o - scene.dense_center - lo) /
                     jnp.maximum(hi - lo, 1e-6) * 32).astype(jnp.int32),
                    0, 31)
    m = 0
    for b in range(5):
        for ax in range(3):
            m = m | (((cell[:, ax] >> b) & 1) << (3 * b + ax))
    octant = ((d[:, 0] < 0).astype(jnp.int32)
              | ((d[:, 1] < 0).astype(jnp.int32) << 1)
              | ((d[:, 2] < 0).astype(jnp.int32) << 2))
    key = (octant << 15) | m
    return jnp.where(tmax > 0, key, 1 << 18)


def _coherence_order(scene: SceneData, o, d, tmax):
    """Permutation that groups rays by _coherence_key (used by tests and
    the huge-batch fallback; the main path rides _sorted_pipeline)."""
    key = _coherence_key(scene, o, d, tmax)
    B = key.shape[0]
    if B <= (1 << 18):
        lane = jax.lax.broadcasted_iota(jnp.int32, (B,), 0)
        # lane rides as a VALUE column (stable sort), keeping all 19 key
        # bits available — packing both into one i32 would overflow
        _, order = jax.lax.sort((key, lane), num_keys=1)
        return order
    return jnp.argsort(key.astype(jnp.int32)).astype(jnp.int32)


def _intersect_dense(scene: SceneData, ray: geom.Ray, presorted=False,
                     anyhit_mask=None, interpret=False):
    from pbrt_tpu.ops import pallas_intersect as pdense
    o, d = ray.o, ray.d
    t_init = ray.tmax.astype(jnp.float32)
    prim_init = jnp.full_like(t_init, -1.0).astype(jnp.int32)
    if scene.n_quadrics > 0:
        tq, qprim, qhit = all_quadrics_test(scene, o, d, t_init,
                                            time=ray.time)
        t_init = jnp.where(qhit, tq, t_init)
        prim_init = jnp.where(qhit, qprim, prim_init)
    motion = getattr(scene, "dense_motion", False)
    rtime = (jnp.clip(ray.time, 0.0, 1.0) if motion
             else None)
    if presorted:
        r16 = pdense.ray_vectors(o, d, scene.dense_center,
                                 anyhit=anyhit_mask)
        t, prim = pdense.dense_intersect_loop(r16, t_init, scene.dense_w,
                                              scene.dense_cb,
                                              scene.dense_npad,
                                              interpret=interpret,
                                              pick=scene.dense_pick or None,
                                              time=rtime)
    elif o.shape[0] <= (1 << 19):
        # the permutation rides the SORT NETWORK both ways: a variadic
        # sort carrying the 8 ray columns costs ~0.5ms at 2^18 on TPU
        # where the equivalent row gather costs ~2.6ms, and the unsort is
        # another ~0.2ms sort keyed on the original lane index vs ~2.1ms
        # for scatters.  TPU gathers/scatters are row-serial; sorts are
        # O(B log^2 B) well-shaped VPU passes — on this hardware the
        # extra FLOPs win by ~5x.  Lane index packed into the key's low
        # bits keeps the sort single-key, stable and invertible.
        B = o.shape[0]
        key = _coherence_key(scene, o, d, t_init)
        lane = jax.lax.broadcasted_iota(jnp.int32, (B,), 0)
        # the anyhit flag rides the KEY's bit 19; dead lanes are
        # promoted above it to bit 20 so they still sink BEHIND every
        # live (flagged or not) lane — one fewer sorted column, and
        # pure-shadow tiles park uniformly on first hit
        if anyhit_mask is not None:
            key = jnp.where(t_init > 0,
                            key | (anyhit_mask.astype(jnp.int32) << 19),
                            jnp.int32(1 << 20))
        # lane rides as a value column (lax.sort is stable)
        cols = [key, lane, o[:, 0], o[:, 1], o[:, 2],
                d[:, 0], d[:, 1], d[:, 2], t_init]
        if motion:
            cols.append(rtime)
        sorted_cols = jax.lax.sort(tuple(cols), num_keys=1)
        key_s, order, o0, o1, o2, d0, d1, d2, ts = sorted_cols[:9]
        rtime_s = sorted_cols[9] if motion else None
        fs = ((key_s >> 19) & 1).astype(jnp.float32) \
            if anyhit_mask is not None else jnp.zeros(B, jnp.float32)
        r16s = pdense.ray_vectors(jnp.stack([o0, o1, o2], -1),
                                  jnp.stack([d0, d1, d2], -1),
                                  scene.dense_center, anyhit=fs > 0.5)
        t_s, prim_s = pdense.dense_intersect_loop(
            r16s, ts, scene.dense_w, scene.dense_cb, scene.dense_npad,
            interpret=interpret,
            pick=scene.dense_pick or None, time=rtime_s)
        _, t, prim = jax.lax.sort((order, t_s, prim_s), num_keys=1)
    else:
        r16 = pdense.ray_vectors(o, d, scene.dense_center,
                                 anyhit=anyhit_mask)
        order = _coherence_order(scene, o, d, t_init)
        t_s, prim_s = pdense.dense_intersect_loop(
            r16[order], t_init[order], scene.dense_w, scene.dense_cb,
            scene.dense_npad, interpret=interpret,
            pick=scene.dense_pick or None,
            time=(rtime[order] if motion else None))
        t = jnp.zeros_like(t_s).at[order].set(t_s)
        prim = jnp.zeros_like(prim_s).at[order].set(prim_s)
    # kernel only reports triangle wins; keep the quadric prehit otherwise
    prim = jnp.where(prim >= 0, prim, prim_init)
    found = prim >= 0
    # the kernel's t is bf16x2-quantized (~1e-4 relative) and u,v are not
    # computed at all: make_hit re-derives the winner's exact t/u/v with
    # one fp32 MT solve from its single packed gather (v0,e1,e2 ride in
    # shade_all cols 21:24/0:6), so no extra [B]-row gather happens here —
    # TPU gathers are row-serial, and shadow lanes never need them
    zero = jnp.zeros_like(t)
    return t, prim, zero, zero, found


def _intersect_bvh(scene: SceneData, ray: geom.Ray, any_hit: bool = False):
    o, d = ray.o, ray.d
    B = o.shape[0]
    N = scene.n_nodes
    inv_d = jnp.where(jnp.abs(d) > 1e-20, 1.0 / d, jnp.sign(d) * 1e20 + 1e20)
    # direction-sign octant selects the near-to-far child ordering
    octant = ((d[:, 0] < 0).astype(jnp.int32)
              | ((d[:, 1] < 0).astype(jnp.int32) << 1)
              | ((d[:, 2] < 0).astype(jnp.int32) << 2))
    hit_links = scene.bvh_hit.reshape(-1)
    miss_links = scene.bvh_miss.reshape(-1)
    link_base = octant * N

    def cond(s):
        node = s[0]
        return jnp.any(node < N)

    def body(s):
        node, t_best, prim, u, v = s
        active = node < N
        nsafe = jnp.minimum(node, N - 1)
        row = scene.bvh_packed[nsafe]                        # [B,8]
        lo = row[:, 0:3]
        hi = row[:, 3:6]
        leaf_bits = _f32_bits_to_i32(row[:, 6])
        box_hit = active & geom.bounds_ray_intersect(lo, hi, o, inv_d, t_best)
        is_leaf = leaf_bits >= 0
        offs = leaf_bits >> 5
        cnt = leaf_bits & 31
        leaf_mask = box_hit & is_leaf
        hit_new, t_new, prim_new, u_new, v_new = _leaf_test(
            scene, o, d, jnp.maximum(offs, 0), cnt, t_best, leaf_mask,
            time=ray.time)
        t_best = jnp.where(hit_new, t_new, t_best)
        prim = jnp.where(hit_new, prim_new, prim)
        u = jnp.where(hit_new, u_new, u)
        v = jnp.where(hit_new, v_new, v)
        nxt = jnp.where(box_hit & ~is_leaf,
                        hit_links[link_base + nsafe],
                        miss_links[link_base + nsafe])
        if any_hit:
            nxt = jnp.where(prim >= 0, N, nxt)
        node = jnp.where(active, nxt, N)
        return node, t_best, prim, u, v

    # carry components derive from ray data so their sharding/varying type
    # matches under shard_map (replicated zeros would trip the vma check)
    zf = jnp.zeros_like(ray.tmax)
    node0 = zf.astype(jnp.int32)
    t_init = ray.tmax.astype(jnp.float32)
    prim_init = node0 - 1
    if scene.n_quadrics > 0:
        tq, qprim, qhit = all_quadrics_test(scene, o, d, t_init,
                                            time=ray.time)
        t_init = jnp.where(qhit, tq, t_init)
        prim_init = jnp.where(qhit, qprim, prim_init)
    state = (node0, t_init, prim_init, zf, zf)
    node, t, prim, u, v = jax.lax.while_loop(cond, body, state)
    return t, prim, u, v, prim >= 0


def _f32_bits_to_i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _intersect_kd(scene: SceneData, ray: geom.Ray, any_hit: bool = False):
    """Lockstep KD-RESTART traversal of the SAH kd-tree
    (accel/kdtree.py; reference build: kdtreeaccel.cpp).

    Instead of the reference's per-ray KdToDo stack (kdtreeaccel.cpp:415)
    each lane tracks its current segment (t_entry, cell t_exit): interior
    nodes descend toward the child containing the point at t_entry
    (shrinking the cell t_exit when the split plane is crossed inside the
    segment), leaves test their duplicated prims, then t_entry advances
    past the cell and the descent restarts from the root.  ~2x node
    visits vs a stack, but no per-lane stacks — the right trade on a
    lockstep vector machine.  Results match the BVH exactly.
    """
    o, d = ray.o, ray.d
    B = o.shape[0]
    inv_d = jnp.where(jnp.abs(d) > 1e-20, 1.0 / d, jnp.sign(d) * 1e20 + 1e20)
    t_init = ray.tmax.astype(jnp.float32)
    prim_init = jnp.full((B,), -1, jnp.int32)
    if scene.n_quadrics > 0:
        tq, qprim, qhit = all_quadrics_test(scene, o, d, t_init,
                                            time=ray.time)
        t_init = jnp.where(qhit, tq, t_init)
        prim_init = jnp.where(qhit, qprim, prim_init)
    # global segment vs root bounds
    blo = scene.kd_bounds[0][None, :]
    bhi = scene.kd_bounds[1][None, :]
    ta = (blo - o) * inv_d
    tb = (bhi - o) * inv_d
    t0g = jnp.maximum(jnp.max(jnp.minimum(ta, tb), -1), 0.0)
    t1g = jnp.min(jnp.maximum(ta, tb), -1)
    live = (t0g <= t1g * 1.0001 + 1e-5) & (ray.tmax > 0)
    M = scene.kd_prim_idx.shape[0]
    K = scene.kd_max_leaf
    N = scene.kd_packed.shape[0]

    def cond(s):
        return jnp.any(s[0] >= 0)

    def body(s):
        node, t_entry, t_cell, t_best, prim, u, v = s
        act = node >= 0
        row = scene.kd_packed[jnp.maximum(node, 0)]          # [B,4]
        split = row[:, 0]
        ri = _f32_bits_to_i32(row[:, 1:4])
        axis = ri[:, 0]
        is_leaf = axis == 3
        # ---- interior descent step ----
        o_ax = jnp.take_along_axis(o, jnp.minimum(axis, 2)[:, None],
                                   1)[:, 0]
        d_ax = jnp.take_along_axis(d, jnp.minimum(axis, 2)[:, None],
                                   1)[:, 0]
        inv_ax = jnp.take_along_axis(inv_d, jnp.minimum(axis, 2)[:, None],
                                     1)[:, 0]
        p_at = o_ax + t_entry * d_ax
        below_first = (p_at < split) | ((p_at == split) & (d_ax <= 0))
        near = jnp.where(below_first, node + 1, ri[:, 1])
        t_split = (split - o_ax) * inv_ax
        crosses = (t_split > t_entry) & (t_split < t_cell)
        t_cell_int = jnp.where(crosses, jnp.minimum(t_cell, t_split),
                               t_cell)
        # ---- leaf test (duplicated prim list indirection) ----
        offs = ri[:, 1]
        cnt = ri[:, 2]
        kk = jnp.arange(K, dtype=jnp.int32)[None, :]
        valid = (is_leaf & act)[:, None] & (kk < cnt[:, None])
        pid = scene.kd_prim_idx[jnp.clip(offs[:, None] + kk, 0, M - 1)]
        tp = scene.tri_packed[pid]
        v0k = tp[..., 0:3]
        e1k = tp[..., 3:6]
        e2k = tp[..., 6:9]
        if scene.has_animated_mesh:
            tmk = scene.tri_motion[pid]
            ut = jnp.clip(ray.time, 0.0, 1.0)[:, None, None]
            v0k = v0k + ut * tmk[..., 0:3]
            e1k = e1k + ut * tmk[..., 3:6]
            e2k = e2k + ut * tmk[..., 6:9]
        t_tri, b1, b2, hit_tri = ray_triangle(o, d, v0k, e1k, e2k, t_best)
        hit = valid & hit_tri
        t_masked = jnp.where(hit, t_tri, F32_MAX)
        kb = jnp.argmin(t_masked, axis=1)
        t_new = jnp.take_along_axis(t_masked, kb[:, None], 1)[:, 0]
        hit_best = jnp.take_along_axis(hit, kb[:, None], 1)[:, 0]
        upd = hit_best & (t_new < t_best)
        t_best = jnp.where(upd, t_new, t_best)
        prim = jnp.where(upd, jnp.take_along_axis(
            pid, kb[:, None], 1)[:, 0], prim)
        u = jnp.where(upd, jnp.take_along_axis(b1, kb[:, None], 1)[:, 0], u)
        v = jnp.where(upd, jnp.take_along_axis(b2, kb[:, None], 1)[:, 0], v)
        # ---- restart past the finished cell ----
        # advance by a few float ULPs (bit increment), not a relative
        # epsilon: a 1e-5*|t| step can overshoot cells thinner than
        # that along the ray and skip their prims (ADVICE r3).
        adv_bits = jax.lax.bitcast_convert_type(
            jnp.maximum(t_cell, 0.0).astype(jnp.float32), jnp.int32) + 4
        adv = jax.lax.bitcast_convert_type(adv_bits, jnp.float32)
        adv = jnp.where(t_cell <= 0.0, 1e-30, adv)
        limit = jnp.minimum(t_best, t1g)
        done = (adv >= limit) | ((prim >= 0) if any_hit
                                 else jnp.zeros_like(act))
        node = jnp.where(~act, node,
                         jnp.where(is_leaf,
                                   jnp.where(done, -1, 0),
                                   jnp.minimum(near, N - 1)))
        t_entry = jnp.where(act & is_leaf, adv, t_entry)
        t_cell = jnp.where(act & is_leaf, t1g, t_cell_int)
        return node, t_entry, t_cell, t_best, prim, u, v

    zf = jnp.zeros_like(t_init)
    node0 = jnp.where(live, 0, -1)
    state = (node0, jnp.where(live, t0g, 0.0), jnp.where(live, t1g, 0.0),
             t_init, prim_init, zf, zf)
    _, _, _, t, prim, u, v = jax.lax.while_loop(cond, body, state)
    return t, prim, u, v, prim >= 0


def nee_ignore_light(scene: SceneData, l):
    """Restrict a sampled-light exclusion to sphere-area lights.

    Mesh-area and delta lights have an exactly-known sample distance, so
    the caller's tmax = 0.999*dist shave already keeps the light's own
    geometry out of the shadow segment — the reference's SpawnRayTo
    1-ShadowEpsilon semantics (interaction.h) — and occluding faces of
    the light's own mesh DO occlude, as in the reference.  Only sphere
    lights (cone-sampled, distance approximate in fp32) keep the
    explicit id exclusion; those resolve via the quadric pre-test, so
    the dense kernel's triangle first-hit early-out stays safe.
    """
    if l is None or not getattr(scene, "has_sphere_lights", True):
        return None
    L = scene.light_quad.shape[0]
    lq = scene.light_quad[jnp.clip(l, 0, L - 1)]
    return jnp.where((l >= 0) & (lq >= 0), l, -1)


def _shadow_anyhit(scene: SceneData, ignore_light, B):
    """Early-out mask for shadow lanes.  Sphere-light exclusions resolve
    via the fp32 quadric pre-test (a first accepted TRIANGLE closer than
    the pre-test t is always a genuine blocker), so they keep the
    first-hit early-out; a MESH-light exclusion needs closest-hit — the
    first accepted triangle could be a same-light face, parking the lane
    before a real blocker in a later chunk is tested (light leak)."""
    if ignore_light is None:
        return jnp.ones(B, bool)
    if not getattr(scene, "has_mesh_lights", True):
        return jnp.ones(B, bool)
    L = scene.light_quad.shape[0]
    lq = scene.light_quad[jnp.clip(ignore_light, 0, L - 1)]
    return ~((ignore_light >= 0) & (lq < 0))


def intersect_tr_walk(scene: SceneData, org, wi, dist, cand, cur_med,
                      wavelength, time=None, ignore_light=None,
                      max_crossings=8, pixel_id=None, sample_idx=None,
                      dim_salt=0x7400):
    """Shadow-ray transmittance walk across medium interfaces.

    TPU redesign of Scene::IntersectTr (reference scene.cpp:57-81): the
    reference loops per ray — intersect; if the hit primitive has a
    material it blocks; a material-less interface accumulates the
    CURRENT medium's Tr over the sub-segment, switches to the crossed
    side's medium and continues.  Here the loop is a statically-unrolled
    wavefront walk of `max_crossings` whole-batch closest-hit dispatches;
    lanes that hit a real surface park as blocked, lanes whose segment
    ends drop out, so later steps run on nearly-empty (cheap, the dense
    queue culls dead tiles).  Homogeneous sub-segments accumulate
    closed-form optical depth; GRID sub-segments (lanes whose current
    medium is a bound GridDensityMedium) accumulate ratio-tracked Tr
    (grid.cpp:89+) when pixel_id/sample_idx are given — the composition
    the reference's IntersectTr does per segment.

    max_crossings bounds the statically-unrolled interface count: lanes
    still crossing after it stop accumulating (truncation, conservative
    toward brighter).  The default 8 covers three nested dielectrics
    exactly; a scene needing more passes max_crossings explicitly
    (tests/test_media_interface.py pins the truncation contract).

    Returns (blocked [B] bool, seg_sigt_sum [B,NS] f32, tr_ratio [B]):
    Tr = exp(-seg_sigt_sum) * tr_ratio[:, None].
    """
    from pbrt_tpu.core import spectrum as spec
    B = org.shape[0]
    NS = spec.N_SPECTRAL_SAMPLES
    P = scene.prim_type.shape[0]
    M = scene.mat_type.shape[0]
    n_med = scene.med_sigma_a.shape[0]
    sig_t_tab = scene.med_sigma_a + scene.med_sigma_s      # [K,NS]
    remaining = jnp.where(jnp.isfinite(dist), dist,
                          2 * scene.world_radius)
    med = cur_med
    act = cand
    blocked = jnp.zeros(B, bool)
    optical = jnp.zeros((B, NS))
    tr_ratio = jnp.ones(B)
    grids = bool(getattr(scene, "has_grid_media", False)) \
        and pixel_id is not None
    p = org
    for cross_i in range(max_crossings):
        ray = geom.Ray.make(p, wi, tmax=jnp.where(act, remaining, -1.0),
                            wavelength=wavelength, time=time)
        t, prim, _, _, found = intersect(scene, ray)
        seg = jnp.where(found, t, remaining)
        # current medium's optical depth over the sub-segment
        mk = jnp.clip(med, 0, n_med - 1)
        in_grid_med = (med >= 0) & scene.med_is_grid[mk] if grids \
            else jnp.zeros(B, bool)
        sig_t = jnp.where((med >= 0) & ~in_grid_med, 1.0, 0.0)[:, None] \
            * sig_t_tab[mk]
        optical = optical + jnp.where(
            act[:, None], sig_t * jnp.maximum(seg, 0.0)[:, None], 0.0)
        if grids:
            # ratio-tracked Tr of the lane's own grid over [p, p+seg*wi]
            from pbrt_tpu.media import media as _med_mod
            from pbrt_tpu.ops import fetch as _fetch
            w2m_b = _fetch.fetch_many(
                [scene.med_w2m.reshape(n_med, 16)],
                mk)[0].reshape(B, 4, 4)
            st_b = jnp.max(sig_t_tab[mk], -1)
            trg = _med_mod.ratio_tr_lanes(
                scene.med_density, scene.med_dims, w2m_b,
                scene.med_inv_maxd[mk], st_b, p, wi,
                jnp.maximum(seg, 0.0), mk, pixel_id, sample_idx,
                dim_salt + 64 * cross_i)
            tr_ratio = tr_ratio * jnp.where(act & in_grid_med, trg, 1.0)
        # classify the hit: material-less prims are pass-through medium
        # interfaces; the sampled light's own geometry passes too
        pid = jnp.clip(prim, 0, P - 1)
        sa = scene.shade_all[pid]
        si = jax.lax.bitcast_convert_type(sa[:, 24:32], jnp.int32)
        mat_idx = si[:, 2]
        mtype = jnp.where(mat_idx >= 0,
                          scene.mat_type[jnp.clip(mat_idx, 0, M - 1)],
                          MAT_NONE)
        is_iface = found & (mtype == MAT_NONE)
        if ignore_light is not None:
            is_ignored = found & (ignore_light >= 0) \
                & (si[:, 3] == ignore_light)
        else:
            is_ignored = jnp.zeros(B, bool)
        blocked = blocked | (act & found & ~is_iface & ~is_ignored)
        # medium switch at interfaces: crossing against the outward
        # geometric normal enters the prim's inside medium
        ng = jnp.cross(sa[:, 0:3], sa[:, 3:6])
        if scene.n_quadrics > 0:
            # quadric prims carry zeroed triangle rows — derive their
            # normal the way make_hit does (w2o fetch + gradient)
            from pbrt_tpu.ops import fetch
            qi = jnp.clip(si[:, 1], 0, scene.quad_params.shape[0] - 1)
            w2o, qparams = fetch.fetch_many(
                [scene.quad_w2o, scene.quad_params], qi)
            ph_w = p + jnp.where(found, t, 1.0)[:, None] * wi
            ph = jnp.einsum('bij,bj->bi', w2o[:, :3, :3], ph_w) \
                + w2o[:, :3, 3]
            n_obj = quadric_normal_obj(si[:, 0], qparams, ph)
            ng_quad = jnp.einsum('bji,bj->bi', w2o[:, :3, :3], n_obj)
            ng = jnp.where((si[:, 0] == PRIM_TRIANGLE)[:, None],
                           ng, ng_quad)
        ng = jnp.where((si[:, 5] != 0)[:, None], -ng, ng)
        entering = geom.dot(wi, ng) < 0
        pmio = jnp.stack([scene.prim_medium_in,
                          scene.prim_medium_out], 1)[pid]
        new_med = jnp.where(entering, pmio[:, 0], pmio[:, 1])
        med = jnp.where(act & is_iface, new_med, med)
        # advance past the crossing with a relative-eps offset
        adv = seg + 1e-4 * jnp.maximum(jnp.abs(seg), 1e-3)
        p = jnp.where(act[:, None], p + adv[:, None] * wi, p)
        remaining = remaining - adv
        act = act & found & (is_iface | is_ignored) & (remaining > 0)
    return blocked, optical, tr_ratio


def occluded(scene: SceneData, ray: geom.Ray, ignore_light=None):
    """Shadow-ray IntersectP (reference scene.h:59).

    ignore_light: optional [B] light index whose own geometry does not
    occlude (see nee_ignore_light; callers should pass its result so
    only sphere lights carry the exclusion)."""
    amask = _shadow_anyhit(scene, ignore_light, ray.o.shape[0])
    _, prim, _, _, found = intersect(scene, ray, anyhit_mask=amask)
    if ignore_light is not None and scene.quad_prim.shape[0] > 0:
        # same quadric one-hot as trace_pair (nee_ignore_light only
        # excludes sphere lights; avoids a [P]-table row-serial gather)
        qlight = scene.prim_light[scene.quad_prim]
        qmatch = prim[:, None] == scene.quad_prim[None, :]
        hit_light = jnp.sum(
            jnp.where(qmatch, qlight[None, :] + 1, 0), axis=1) - 1
        found = found & ~((ignore_light >= 0) & (hit_light == ignore_light))
    return found


def make_hit(scene: SceneData, ray: geom.Ray, t, prim, u, v, found,
             ray_diff=None, exact_p=False) -> Hit:
    """Gather full surface-interaction data for the winning primitives.

    All per-prim columns come from ONE packed 32-wide gather
    (shade_all: f32 columns + int columns bit-viewed as f32) —
    fine-grained gathers are serial on TPU, so the one-row layout is
    much faster than per-table lookups.

    ray_diff: optional (rxo, rxd, ryo, ryd) camera ray differentials
    (each [B,3]); when given, Hit.duv gets the screen-space uv
    gradients via the reference's plane-projection construction
    (camera.cpp:60-95 probe rays -> interaction.cpp:43-87
    ComputeDifferentials), computed for triangle hits (quadric hits
    carry zero — finest mip level, a noted deviation).
    """
    P = scene.prim_type.shape[0]
    pid = jnp.clip(prim, 0, P - 1)
    sa = scene.shade_all[pid]                      # [B,32]
    sf = sa[:, 0:24]
    si = jax.lax.bitcast_convert_type(sa[:, 24:32], jnp.int32)
    ptype = si[:, 0]
    is_tri = ptype == PRIM_TRIANGLE

    # missed lanes carry t=F32_MAX; clamp so masked-out geometry math stays
    # finite (inf*0 => NaN would poison reverse-mode grads via where)
    t = jnp.where(found, t, 1.0)
    e1 = sf[:, 0:3]
    e2 = sf[:, 3:6]
    dmotion = None
    if scene.has_animated_mesh:
        # hit data at the ray's time: shift v0/e1/e2 by the per-prim
        # two-keyframe motion (primitive.cpp:73-89)
        dmotion = scene.tri_motion[pid]
        u_t = jnp.clip(ray.time, 0.0, 1.0)[:, None]
        e1 = e1 + u_t * dmotion[:, 3:6]
        e2 = e2 + u_t * dmotion[:, 6:9]
    # exact t/u/v for triangle winners via one fp32 MT solve (the dense
    # kernel reports a bf16x2-quantized t and no barycentrics; recovering
    # them here rides the SAME packed gather — v0 in cols 21:24 — instead
    # of a second row-serial [B,12] gather per trace call)
    v0 = sf[:, 21:24]
    if dmotion is not None:
        v0 = v0 + u_t * dmotion[:, 0:3]
    pvec = jnp.cross(ray.d, e2)
    det = jnp.sum(e1 * pvec, -1)
    # safe-denominator form: where(c, 1/det, 0) computes 1/0 = inf in the
    # untaken branch and its backward turns a zero cotangent into NaN
    # (quadric lanes carry zeroed triangle rows, det == 0 exactly)
    ok_det = jnp.abs(det) > 1e-12
    inv_det = jnp.where(ok_det, 1.0 / jnp.where(ok_det, det, 1.0), 0.0)
    tvec = ray.o - v0
    b1 = jnp.sum(tvec * pvec, -1) * inv_det
    qvec = jnp.cross(tvec, e1)
    b2 = jnp.sum(ray.d * qvec, -1) * inv_det
    t_mt = jnp.sum(e2 * qvec, -1) * inv_det
    # the kernel t is bf16x2-quantized (truncated by up to ~1.2e-4 rel);
    # accept the exact MT solve only when it stays within that margin of
    # the kernel t (so it can't exceed ray.tmax) and its barycentrics are
    # a valid simplex point — otherwise keep the kernel t and clamp the
    # barycentrics so b0 = 1-u-v stays non-negative
    refine = (found & is_tri & (jnp.abs(det) > 1e-12) & (t_mt > 0)
              & (t_mt < t * 1.01)
              & (b1 >= 0) & (b2 >= 0) & (b1 + b2 <= 1.0 + 1e-4))
    b1c = jnp.clip(b1, 0.0, 1.0)
    b2c = jnp.clip(b2, 0.0, 1.0 - b1c)
    t = jnp.where(refine, t_mt, t)
    u = jnp.where(found & is_tri, jnp.where(refine, b1, b1c), u)
    v = jnp.where(found & is_tri, jnp.where(refine, b2, b2c), v)
    p = ray.at(t)
    if exact_p:
        # pbrt constructs the triangle hit point from the barycentrics
        # (pHit = b0*p0 + b1*p1 + b2*p2, triangle.cpp:329), which is
        # ~gamma(7)*|p| accurate where o + t*d carries the ray-scale
        # rounding; the matched-RNG parity integrator needs the same
        # construction so offset/occlusion decisions line up
        b0w = (1.0 - u - v)[:, None]
        p_bary = b0w * v0 + u[:, None] * (v0 + e1) + v[:, None] * (v0 + e2)
        p = jnp.where((found & is_tri)[:, None], p_bary, p)
    ng_tri = geom.normalize(jnp.cross(e1, e2))
    # triangle shading normal: barycentric interp; fall back to geometric
    b0 = (1.0 - u - v)[..., None]
    ns_tri = b0 * sf[:, 6:9] + u[..., None] * sf[:, 9:12] \
        + v[..., None] * sf[:, 12:15]
    has_ns = jnp.sum(ns_tri * ns_tri, -1) > 1e-12
    ns_tri = jnp.where(has_ns[..., None], geom.normalize(ns_tri), ng_tri)
    # keep shading normal on the same side as geometric
    ns_tri = jnp.where(geom.dot(ns_tri, ng_tri)[..., None] < 0, -ns_tri, ns_tri)
    # triangle uv from vertex uvs
    uv_tri = (b0 * sf[:, 15:17] + u[..., None] * sf[:, 17:19]
              + v[..., None] * sf[:, 19:21])

    if scene.n_quadrics > 0:
        # quadric normal (one-hot fetch: Q is small, gathers are serial)
        from pbrt_tpu.ops import fetch
        qi = jnp.clip(si[:, 1], 0, scene.quad_params.shape[0] - 1)
        if scene.has_animated_quads:
            from pbrt_tpu.core import transform as tfm
            at, aq, asq, qparams = fetch.fetch_many(
                [scene.quad_anim_t.reshape(-1, 6),
                 scene.quad_anim_q.reshape(-1, 8),
                 scene.quad_anim_s.reshape(-1, 18), scene.quad_params], qi)
            u = jnp.clip(ray.time, 0.0, 1.0)
            m34 = tfm.interp_matrix_j(at.reshape(-1, 2, 3),
                                      aq.reshape(-1, 2, 4),
                                      asq.reshape(-1, 2, 3, 3), u)
            w34 = tfm.affine_inverse_j(m34)
            A = w34[..., :3]
            ph = jnp.einsum('bij,bj->bi', A, p) + w34[..., 3]
            n_obj = quadric_normal_obj(ptype, qparams, ph)
            ng_quad = geom.normalize(jnp.einsum('bji,bj->bi', A, n_obj))
        else:
            w2o, qparams = fetch.fetch_many(
                [scene.quad_w2o, scene.quad_params], qi)
            ph = jnp.einsum('bij,bj->bi', w2o[:, :3, :3], p) \
                + w2o[:, :3, 3]
            n_obj = quadric_normal_obj(ptype, qparams, ph)
            ng_quad = geom.normalize(
                jnp.einsum('bji,bj->bi', w2o[:, :3, :3], n_obj))
        uq, vq = quadric_uv(ptype, qparams, ph)

        ng = jnp.where(is_tri[..., None], ng_tri, ng_quad)
        ns = jnp.where(is_tri[..., None], ns_tri, ng_quad)
        uv = jnp.where(is_tri[..., None], uv_tri, jnp.stack([uq, vq], -1))
    else:
        ng, ns, uv = ng_tri, ns_tri, uv_tri

    flip = si[:, 5] != 0
    ng = jnp.where(flip[..., None], -ng, ng)
    ns = jnp.where(flip[..., None], -ns, ns)

    # uv footprint density (see Hit.uv_density): triangles from the
    # uv-edge / world-edge area ratio; quadrics approximated from the
    # parameterization scale (full [0,1]^2 over ~2*pi*r of surface)
    uv_e1 = sf[:, 17:19] - sf[:, 15:17]
    uv_e2 = sf[:, 19:21] - sf[:, 15:17]
    uv_area = jnp.abs(uv_e1[:, 0] * uv_e2[:, 1] - uv_e1[:, 1] * uv_e2[:, 0])
    w_area = geom.length(jnp.cross(e1, e2))
    dens_tri = jnp.sqrt(uv_area / jnp.maximum(w_area, 1e-12))
    if scene.n_quadrics > 0:
        r_quad = jnp.maximum(jnp.abs(qparams[:, 0]), 1e-6)
        dens_quad = 1.0 / (2.0 * jnp.pi * r_quad)
        uv_density = jnp.where(is_tri, dens_tri, dens_quad)
    else:
        uv_density = dens_tri

    duv = None
    if ray_diff is not None:
        # dpdu/dpdv from the uv edge matrix (triangle.cpp:157-187)
        det_uv = uv_e1[:, 0] * uv_e2[:, 1] - uv_e1[:, 1] * uv_e2[:, 0]
        ok_uv = jnp.abs(det_uv) > 1e-12
        inv_uv = jnp.where(ok_uv, 1.0 / jnp.where(ok_uv, det_uv, 1.0), 0.0)
        dpdu = (uv_e2[:, 1:2] * e1 - uv_e1[:, 1:2] * e2) * inv_uv[:, None]
        dpdv = (-uv_e2[:, 0:1] * e1 + uv_e1[:, 0:1] * e2) * inv_uv[:, None]
        # auxiliary-ray plane intersections (interaction.cpp:52-66)
        rxo, rxd, ryo, ryd = ray_diff
        d_pl = geom.dot(ng, p)

        def plane_hit(ro, rd):
            denom = geom.dot(ng, rd)
            okp = jnp.abs(denom) > 1e-12
            tt = jnp.where(okp, (d_pl - geom.dot(ng, ro))
                           / jnp.where(okp, denom, 1.0), 0.0)
            return ro + tt[:, None] * rd, okp

        px, okx = plane_hit(rxo, rxd)
        py, oky = plane_hit(ryo, ryd)
        dpdx = px - p
        dpdy = py - p
        # least-squares 2x2 (dpdx/dpdy lie in the tangent plane, so the
        # normal-equation solve equals the reference's axis-picked exact
        # solve without per-lane dimension gathers)
        g11 = geom.dot(dpdu, dpdu)
        g12 = geom.dot(dpdu, dpdv)
        g22 = geom.dot(dpdv, dpdv)
        det_g = g11 * g22 - g12 * g12
        ok_g = jnp.abs(det_g) > 1e-20
        inv_g = jnp.where(ok_g, 1.0 / jnp.where(ok_g, det_g, 1.0), 0.0)

        def solve(dp):
            b1_ = geom.dot(dp, dpdu)
            b2_ = geom.dot(dp, dpdv)
            return ((g22 * b1_ - g12 * b2_) * inv_g,
                    (g11 * b2_ - g12 * b1_) * inv_g)

        dudx, dvdx = solve(dpdx)
        dudy, dvdy = solve(dpdy)
        good = (found & is_tri & ok_uv & ok_g & okx & oky)[:, None]
        duv = jnp.where(good, jnp.stack([dudx, dvdx, dudy, dvdy], -1), 0.0)
        duv = jnp.where(jnp.isfinite(duv), duv, 0.0)
        # shading-normal derivatives for specular differential
        # propagation (dndu/dndv from the same uv edge matrix;
        # triangle.cpp:157-187 structure applied to per-vertex normals)
        n0 = sf[:, 6:9]
        dn1 = sf[:, 9:12] - n0
        dn2 = sf[:, 12:15] - n0
        has_ns = jnp.sum(n0 * n0, -1) > 1e-12
        dndu = (uv_e2[:, 1:2] * dn1 - uv_e1[:, 1:2] * dn2) \
            * inv_uv[:, None]
        dndv = (-uv_e2[:, 0:1] * dn1 + uv_e1[:, 0:1] * dn2) \
            * inv_uv[:, None]
        gx = good & has_ns[:, None]
        dndx_v = jnp.where(gx, dndu * dudx[:, None] + dndv * dvdx[:, None],
                           0.0)
        dndy_v = jnp.where(gx, dndu * dudy[:, None] + dndv * dvdy[:, None],
                           0.0)
        dpdx_v = jnp.where(good, dpdx, 0.0)
        dpdy_v = jnp.where(good, dpdy, 0.0)
        fin = lambda a: jnp.where(jnp.isfinite(a), a, 0.0)
        extra = dict(dpdx=fin(dpdx_v), dpdy=fin(dpdy_v),
                     dndx=fin(dndx_v), dndy=fin(dndy_v))
    else:
        extra = {}
    return Hit(valid=found, t=t, p=p, ng=ng, ns=ns, uv=uv,
               wo=-geom.normalize(ray.d), prim=pid,
               material=jnp.where(found, si[:, 2], -1),
               light=jnp.where(found, si[:, 3], -1),
               instance=jnp.where(found, si[:, 4], -1),
               uv_density=uv_density, face=si[:, 6], duv=duv, **extra)


def intersect_full(scene: SceneData, ray: geom.Ray,
                   presorted: bool = False, ray_diff=None) -> Hit:
    t, prim, u, v, found = intersect(scene, ray, presorted=presorted)
    return make_hit(scene, ray, t, prim, u, v, found, ray_diff=ray_diff)


def trace_pair(scene: SceneData, nray: geom.Ray, sray, ignore_light=None,
               ray_diff=None):
    """Trace a bounce's closest-hit rays and NEE shadow rays as ONE batch.

    The wavefront integrator calls this once per bounce instead of
    intersect_full + occluded: the 2B-ray batch pays a single coherence
    sort, work-queue build and kernel launch, and the shared-origin rays
    (both halves originate at the same hit points) sort into the same
    coherent tiles.  Returns (Hit for nray, occluded [B] for sray).
    """
    if sray is None:
        return intersect_full(scene, nray, ray_diff=ray_diff), None
    B = nray.o.shape[0]
    sB = sray.o.shape[0]          # may be a multiple of B (strategy "all")
    both = jax.tree.map(lambda a, b: jnp.concatenate([a, b], 0), nray, sray)
    # shadow half runs with first-hit early-out in the dense kernel,
    # EXCEPT lanes that must ignore a light's own geometry: those need
    # closest-hit (the first accepted triangle could be the light itself,
    # parking the lane before a real blocker is tested)
    if ignore_light is None:
        sh_any = jnp.ones(sB, bool)
    else:
        sh_any = ignore_light < 0
    amask = jnp.concatenate([jnp.zeros(B, bool), sh_any])
    t, prim, u, v, found = intersect(scene, both, anyhit_mask=amask)
    hit = make_hit(scene, nray, t[:B], prim[:B], u[:B], v[:B], found[:B],
                   ray_diff=ray_diff)
    occ = found[B:]
    if ignore_light is not None and scene.quad_prim.shape[0] > 0:
        # nee_ignore_light only ever excludes SPHERE (quadric) lights,
        # so the winner can be the ignored light's geometry only when
        # prim is a quadric prim id — resolve its light via a small
        # [sB, nq] one-hot instead of a [P]-table row-serial gather
        # (profiled ~1ms per 131k-ray call on v5e)
        qlight = scene.prim_light[scene.quad_prim]          # [nq] tiny
        qmatch = prim[B:, None] == scene.quad_prim[None, :]
        hit_light = jnp.sum(
            jnp.where(qmatch, qlight[None, :] + 1, 0), axis=1) - 1
        occ = occ & ~((ignore_light >= 0) & (hit_light == ignore_light))
    return hit, occ


def spawn_ray(p, ng, direction, wavelength, time=None, tmax=None,
              eps_scale=1e-4):
    """Offset-origin ray spawn (reference: interaction.h SpawnRay).

    eps_scale: offset magnitude relative to |p| (default keeps a margin
    for the bf16 dense kernel's quantized t; the matched-RNG parity path
    uses 1e-5, closer to the reference's gamma-bound offsets)."""
    scale = jnp.maximum(jnp.max(jnp.abs(p), -1), 1.0)
    eps = (eps_scale * scale)[..., None]
    off = jnp.where(geom.dot(direction, ng)[..., None] >= 0, eps, -eps) * ng
    return geom.Ray.make(p + off, direction, tmax=tmax,
                         wavelength=wavelength, time=time)


def spawn_shadow_ray(p, ng, wi, dist, cand, wavelength, time=None,
                     eps_scale=1e-4, shave=0.999):
    """Shadow ray toward a light sample at distance `dist` along unit wi.

    Matches the reference's SpawnRayTo parametric semantics
    (interaction.h: origin offset by error bounds, tMax = 1-ShadowEpsilon
    of the OFFSET-to-target segment): the shave is applied to the
    distance measured from the offset origin, so a sample point close to
    the light can never reach the light's own surface no matter how the
    origin offset tilts the segment.  cand: [B] bool — dead lanes get
    tmax=-1 so they drop out of the intersect queue.
    """
    scale = jnp.maximum(jnp.max(jnp.abs(p), -1), 1.0)
    eps = (eps_scale * scale)[..., None]
    off = jnp.where(geom.dot(wi, ng)[..., None] >= 0, eps, -eps) * ng
    d_eff = dist - geom.dot(off, wi)
    return geom.Ray.make(p + off, wi,
                         tmax=jnp.where(cand, d_eff * shave, -1.0),
                         wavelength=wavelength, time=time)
