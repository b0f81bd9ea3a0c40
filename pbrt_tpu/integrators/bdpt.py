"""Bidirectional path tracing with the full (s,t)-strategy MIS family.

Reference: src/integrators/bdpt.{h,cpp} — GenerateCameraSubpath /
GenerateLightSubpath (:357-436), ConnectBDPT (:590-686) and MISWeight
(:230-306).  The reference walks per-pixel recursive subpaths with Vertex
objects in a MemoryArena; here both subpaths are generated as fixed-depth
*wavefront* loops over SoA batches (one [B]-shaped array per vertex field
per depth, statically unrolled), and every (s,t) connection strategy is a
batched visibility ray + closed-form MIS weight over the stored
forward/reverse area densities.  All control flow is static so the whole
estimator jits into one XLA program; the (s,t) double loop is a Python
loop over ~O(maxdepth^2) strategies, each a [B]-wide vector op batch.

Documented deviations (all unbiased):
- s=1 connects to the *generated* light-subpath vertex instead of
  resampling via Sample_Li (the reference resamples purely as a variance
  optimization, bdpt.cpp:636); densities use the position measure.
- light subpaths start from point and area lights (the emitter types
  `lighttracer.sample_le` supports); spot is treated as point, and
  distant/infinite/goniometric/projection lights participate through the
  s<=1 strategies with delta flags zeroing the impossible s>=2 terms,
  mirroring Vertex::IsDeltaLight.
- infinite-light radiance along escaped camera rays is added with weight
  1 (no other strategy can produce those paths here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import sampling
from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.core import transform as tfm
from pbrt_tpu.materials import bsdf
from pbrt_tpu.lights import lights as lmod
from pbrt_tpu.ops import intersect as isect
from pbrt_tpu.samplers.samplers import sample_dim
from pbrt_tpu.film import film as filmmod
from pbrt_tpu.scene import ir
from pbrt_tpu.integrators import lighttracer as lt

# sampler dimension bases (counter-based sampler: any disjoint layout works)
_CAM_BASE = 5       # matches path.py camera dims 0..4
_LIGHT_BASE = 120


def _remap0(x):
    """MISWeight's remap0 (bdpt.cpp:233): 0 densities become 1 so delta
    ratios cancel instead of poisoning the product."""
    return jnp.where(x != 0.0, x, 1.0)


def _unit_to(p_from, p_to):
    d = p_to - p_from
    dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1), 1e-12))
    return d / dist[:, None], dist


def _convert_density(pdf_sw, p_from, p_to, ng_to, to_is_surface):
    """Solid-angle -> area density (Vertex::ConvertDensity, bdpt.h:270)."""
    d = p_to - p_from
    dist2 = jnp.maximum(jnp.sum(d * d, -1), 1e-12)
    w = d / jnp.sqrt(dist2)[:, None]
    # to_is_surface: python bool or per-lane mask (mixed light batches)
    cos = jnp.where(to_is_surface, geom.absdot(ng_to, w), 1.0)
    return pdf_sw * cos / dist2


class _Vertex:
    """SoA vertex record for one subpath depth (all fields [B,...]).

    `beta`: throughput up to arrival at this vertex.  `pdf_fwd`/`pdf_rev`:
    area densities as in bdpt.h Vertex.  `delta`: the edge INTO this vertex
    was sampled from a specular lobe.  `is_surface`: static python bool —
    camera/delta-light endpoint records are not surfaces."""

    def __init__(self, p, ng, ns, wo, uv, mat, beta, pdf_fwd, delta, valid,
                 light=None, le=None, is_surface=True):
        self.p, self.ng, self.ns, self.wo, self.uv = p, ng, ns, wo, uv
        self.mat, self.beta = mat, beta
        self.pdf_fwd = pdf_fwd
        self.pdf_rev = jnp.zeros_like(pdf_fwd)
        self.delta, self.valid = delta, valid
        self.light = light
        self.le = le
        self.is_surface = is_surface

    def params(self, scene):
        return bsdf.gather_materials(scene, self.mat, uv=self.uv, p=self.p)

    def f_world(self, scene, wi_world):
        ss, ts = geom.coordinate_system(self.ns)
        wo_l = geom.world_to_frame(ss, ts, self.ns, self.wo)
        wi_l = geom.world_to_frame(ss, ts, self.ns, wi_world)
        return bsdf.eval_f(self.params(scene), wo_l, wi_l)

    def pdf_dir(self, scene, wo_world, wi_world):
        ss, ts = geom.coordinate_system(self.ns)
        wo_l = geom.world_to_frame(ss, ts, self.ns, wo_world)
        wi_l = geom.world_to_frame(ss, ts, self.ns, wi_world)
        return bsdf.pdf_f(self.params(scene), wo_l, wi_l)


# ---------------------------------------------------------------------------
# subpath generation (bdpt.cpp RandomWalk :357-420)
# ---------------------------------------------------------------------------

def _walk_subpath(scene, ray, beta, pdf_dir_sw, pixel_id, sample_idx, cfg,
                  n_verts, dim_base, alive0, prev_vertex):
    """Extend a subpath by up to n_verts surface vertices; fills pdf_rev of
    each vertex's predecessor as scatter directions are sampled."""
    B = ray.o.shape[0]
    verts = []
    alive = alive0
    pdf_fwd_sw = pdf_dir_sw if pdf_dir_sw is not None else jnp.ones(B)
    pv = prev_vertex
    for depth in range(n_verts):
        hit = isect.intersect_full(scene, ray)
        valid = alive & hit.valid
        ns = bsdf.bump_shading_normal(scene, hit.material, hit)
        pdf_fwd = _convert_density(pdf_fwd_sw, pv.p, hit.p, hit.ng, True)
        le = lmod.area_le(scene, hit.light, hit.ng, hit.wo)
        v = _Vertex(hit.p, hit.ng, ns, hit.wo, hit.uv, hit.material,
                    beta, pdf_fwd, jnp.zeros(B, bool), valid,
                    light=hit.light,
                    le=jnp.where(valid[:, None], le, 0.0))
        v.escaped = alive & ~hit.valid     # traced but missed (env Le)
        # Vertex::IsConnectible (bdpt.h:161): the vertex's OWN bsdf must
        # have non-specular lobes; distinct from v.delta (incoming edge),
        # which only zeroes MIS terms
        mt = scene.mat_type[jnp.clip(hit.material, 0,
                                     scene.mat_type.shape[0] - 1)]
        v.connectible = valid & (hit.material >= 0) \
            & (mt != ir.MAT_MIRROR) & (mt != ir.MAT_GLASS)
        verts.append(v)
        alive = valid
        if depth == n_verts - 1:
            break
        mat = v.params(scene)
        ss, ts = geom.coordinate_system(ns)
        wo_l = geom.world_to_frame(ss, ts, ns, hit.wo)
        u_lobe = sample_dim(cfg, pixel_id, sample_idx, dim_base + depth * 3)
        u1 = sample_dim(cfg, pixel_id, sample_idx, dim_base + depth * 3 + 1)
        u2 = sample_dim(cfg, pixel_id, sample_idx, dim_base + depth * 3 + 2)
        wi_l, f, pdf_s, is_spec, _, _ = bsdf.sample_f(mat, wo_l, u_lobe,
                                                      u1, u2)
        wi_w = geom.frame_to_world(ss, ts, ns, wi_l)
        ok = (pdf_s > 1e-12) & ~spec.is_black(f)
        cos_t = geom.absdot(wi_w, ns)
        beta = jnp.where(
            (alive & ok)[:, None],
            beta * f * (cos_t / jnp.maximum(pdf_s, 1e-12))[:, None], beta)
        # reverse density of the PREVIOUS vertex (bdpt.cpp:414-419)
        pdf_rev_sw = bsdf.pdf_f(mat, wi_l, wo_l)
        pv_rev = _convert_density(pdf_rev_sw, hit.p, pv.p, pv.ng,
                                  pv.is_surface)
        pv.pdf_rev = jnp.where(valid & ~is_spec, pv_rev, pv.pdf_rev)
        alive = alive & ok
        # Vertex.delta marks THIS vertex's bsdf as specular-sampled
        # (bdpt.cpp:408: `vertex.delta = true` on the scattering vertex)
        v.delta = is_spec & valid
        pdf_fwd_sw = jnp.where(is_spec, 0.0, pdf_s)
        pv = v
        nray = isect.spawn_ray(hit.p, hit.ng, wi_w, ray.wavelength)
        ray = nray.replace(tmax=jnp.where(alive, nray.tmax, -1.0))
    return verts


def generate_camera_subpath(scene, ray, pixel_id, sample_idx, cfg, n_verts,
                            camera, width, height):
    """Vertex 0 = camera (lens point); 1.. = surface hits.  The first
    edge's forward density is the camera's directional importance density
    Pdf_We (perspective.cpp:230+), which keeps the (s,t) MIS ratios
    reciprocal between the NEE-like and splat-like strategy pairs."""
    B = ray.o.shape[0]
    NS = spec.N_SPECTRAL_SAMPLES
    d0 = geom.normalize(ray.d)
    cam_v = _Vertex(ray.o, d0, d0, -d0, jnp.zeros((B, 2)),
                    jnp.full((B,), -1, jnp.int32), jnp.ones((B, NS)),
                    jnp.ones(B), jnp.zeros(B, bool), jnp.ones(B, bool),
                    is_surface=False)
    pdf_dir0 = _camera_pdf_dir(camera, width, height, d0)
    return [cam_v] + _walk_subpath(
        scene, ray, jnp.ones((B, NS)), pdf_dir0, pixel_id, sample_idx, cfg,
        n_verts - 1, _CAM_BASE, jnp.ones(B, bool), cam_v)


def generate_light_subpath(scene, pixel_id, sample_idx, cfg, n_verts):
    """Vertex 0 on a uniformly selected light (bdpt.cpp:427-436)."""
    B = pixel_id.shape[0]
    nl = max(scene.n_lights, 1)
    u_sel = sample_dim(cfg, pixel_id, sample_idx, _LIGHT_BASE)
    l = jnp.minimum((u_sel * nl).astype(jnp.int32), nl - 1)
    u1 = sample_dim(cfg, pixel_id, sample_idx, _LIGHT_BASE + 1)
    u2 = sample_dim(cfg, pixel_id, sample_idx, _LIGHT_BASE + 2)
    u3 = sample_dim(cfg, pixel_id, sample_idx, _LIGHT_BASE + 3)
    u4 = sample_dim(cfg, pixel_id, sample_idx, _LIGHT_BASE + 4)
    o, d, Le, pdf, n_l = lt.sample_le(scene, l, u1, u2, u3, u4)
    sel_pdf = 1.0 / nl
    from pbrt_tpu.ops import fetch
    lt_type_f, l_area_f, L_base = fetch.fetch_many(
        [scene.light_type, scene.light_area, scene.light_L], l)
    lt_type = jnp.round(lt_type_f).astype(jnp.int32)
    is_area = lt_type == ir.LIGHT_AREA
    pdf_pos = jnp.where(is_area,
                        1.0 / jnp.maximum(l_area_f, 1e-9), 1.0)
    pdf_dir = pdf / jnp.maximum(pdf_pos, 1e-12)
    # every finite-position emitter (sample_le folds spot/gonio/projection
    # directional factors into Le); distant/infinite stay s=0-only
    supported = is_area | (lt_type == ir.LIGHT_POINT) \
        | (lt_type == ir.LIGHT_SPOT) | (lt_type == ir.LIGHT_GONIO) \
        | (lt_type == ir.LIGHT_PROJECTION)
    alive = supported & (pdf > 1e-12) & (scene.n_lights > 0)
    # beta of the light vertex itself: L / (pdf_pos * selection); used by
    # the s=1 connection (position-measure NEE; directional factor applied
    # at connection time from the actual connection direction)
    beta0 = jnp.where(alive[:, None],
                      L_base / jnp.maximum(pdf_pos * sel_pdf,
                                           1e-12)[:, None], 0.0)
    lv = _Vertex(o, n_l, n_l, d, jnp.zeros((B, 2)),
                 jnp.full((B,), -1, jnp.int32), beta0,
                 pdf_pos * sel_pdf, jnp.zeros(B, bool), alive,
                 light=l, is_surface=is_area)   # per-lane mask
    lv.is_area_light = is_area
    cos0 = jnp.abs(geom.dot(n_l, d))
    beta = Le * jnp.where(
        alive, cos0 / jnp.maximum(pdf * sel_pdf, 1e-12), 0.0)[:, None]
    ray = isect.spawn_ray(o, n_l, d, jnp.full(B, 550.0))
    ray = ray.replace(tmax=jnp.where(alive, ray.tmax, -1.0))
    return [lv] + _walk_subpath(scene, ray, beta, pdf_dir, pixel_id,
                                sample_idx, cfg, n_verts - 1,
                                _LIGHT_BASE + 8, alive, lv)


# ---------------------------------------------------------------------------
# camera importance pdf (PerspectiveCamera::Pdf_We, perspective.cpp:230+)
# ---------------------------------------------------------------------------

def _camera_film_area(camera, width, height):
    r2c = camera.raster_to_camera
    corners = jnp.asarray([[0.0, 0.0, 0.0], [width, 0.0, 0.0],
                           [0.0, height, 0.0]])
    cc = tfm.xform_point(r2c, corners)
    cc = cc / cc[:, 2:3]
    return jnp.abs((cc[1, 0] - cc[0, 0]) * (cc[2, 1] - cc[0, 1]))


def _camera_pdf_dir(camera, width, height, w_world):
    w2c = jnp.linalg.inv(camera.cam_to_world)
    wc = tfm.xform_vector(w2c, w_world)
    cos_t = jnp.maximum(wc[:, 2] / jnp.maximum(geom.length(wc), 1e-9), 1e-6)
    A = _camera_film_area(camera, width, height)
    return 1.0 / (A * cos_t ** 3)


# ---------------------------------------------------------------------------
# light emission densities (used for MIS junction remaps)
# ---------------------------------------------------------------------------

def _light_emit_pdf_dir(scene, light_idx, n_l, w):
    """Directional emission density matching sample_le: cosine hemisphere
    for area lights, uniform sphere for delta emitters."""
    from pbrt_tpu.ops import fetch
    lt_type = jnp.round(fetch.fetch_rows(
        scene.light_type, light_idx)).astype(jnp.int32)
    is_area = lt_type == ir.LIGHT_AREA
    return jnp.where(is_area, geom.absdot(n_l, w) * sampling.INV_PI,
                     sampling.INV_4PI)


# ---------------------------------------------------------------------------
# MIS weight (bdpt.cpp MISWeight :230-306)
# ---------------------------------------------------------------------------

def _mis_weight(scene, cam_vs, light_vs, s, t, camera, width, height):
    """Balance-heuristic weight 1/(1+sum ri), with the junction vertices'
    reverse densities recomputed per-strategy (the reference's
    ScopedAssignment block, bdpt.cpp:250-291)."""
    B = cam_vs[0].p.shape[0]
    if s + t == 2:
        return jnp.ones(B)
    nl = max(scene.n_lights, 1)
    pt = cam_vs[t - 1]
    pt_minus = cam_vs[t - 2] if t > 1 else None
    qs = light_vs[s - 1] if s > 0 else None
    qs_minus = light_vs[s - 2] if s > 1 else None

    # pt.pdfRev
    if s > 0:
        w_qp, _ = _unit_to(qs.p, pt.p)
        if s == 1:
            pdf_dir = _light_emit_pdf_dir(scene, qs.light, qs.ns, w_qp)
            pt_rev = _convert_density(pdf_dir, qs.p, pt.p, pt.ng,
                                      pt.is_surface)
        else:
            wo_qs, _ = _unit_to(qs.p, qs_minus.p)
            pt_rev = _convert_density(qs.pdf_dir(scene, wo_qs, w_qp),
                                      qs.p, pt.p, pt.ng, pt.is_surface)
    else:
        # PdfLightOrigin: position density of the light the path hit
        from pbrt_tpu.ops import fetch
        lt_area = 1.0 / jnp.maximum(fetch.fetch_rows(
            scene.light_area, jnp.maximum(pt.light, 0)), 1e-9)
        pt_rev = jnp.where(pt.light >= 0, lt_area / nl, 0.0)

    # pt_minus.pdfRev
    ptm_rev = None
    if t > 1:
        w_pm, _ = _unit_to(pt.p, pt_minus.p)
        if s > 0:
            w_pq, _ = _unit_to(pt.p, qs.p)
            ptm_rev = _convert_density(pt.pdf_dir(scene, w_pq, w_pm),
                                       pt.p, pt_minus.p, pt_minus.ng,
                                       pt_minus.is_surface)
        else:
            pdf_dir = _light_emit_pdf_dir(scene, pt.light, pt.ng, w_pm)
            ptm_rev = _convert_density(pdf_dir, pt.p, pt_minus.p,
                                       pt_minus.ng, pt_minus.is_surface)

    # qs.pdfRev / qs_minus.pdfRev
    qs_rev = qsm_rev = None
    if s > 0:
        w_pq, _ = _unit_to(pt.p, qs.p)
        if t > 1:
            w_pm2, _ = _unit_to(pt.p, pt_minus.p)
            qs_rev = _convert_density(pt.pdf_dir(scene, w_pm2, w_pq),
                                      pt.p, qs.p, qs.ng, qs.is_surface)
        else:
            pdf_dir = _camera_pdf_dir(camera, width, height, w_pq)
            qs_rev = _convert_density(pdf_dir, pt.p, qs.p, qs.ng,
                                      qs.is_surface)
    if s > 1:
        w_qp2, _ = _unit_to(qs.p, pt.p)
        w_qm, _ = _unit_to(qs.p, qs_minus.p)
        qsm_rev = _convert_density(qs.pdf_dir(scene, w_qp2, w_qm),
                                   qs.p, qs_minus.p, qs_minus.ng,
                                   qs_minus.is_surface)

    sum_ri = jnp.zeros(B)
    zeros_b = jnp.zeros(B, bool)
    # camera side: i = t-1 .. 1 (bdpt.cpp:293-298)
    ri = jnp.ones(B)
    for i in range(t - 1, 0, -1):
        rev = pt_rev if i == t - 1 else (
            ptm_rev if i == t - 2 else cam_vs[i].pdf_rev)
        ri = ri * _remap0(rev) / _remap0(cam_vs[i].pdf_fwd)
        d_i = zeros_b if i >= t - 1 else cam_vs[i].delta
        d_im = zeros_b if i - 1 >= t - 1 else cam_vs[i - 1].delta
        sum_ri = sum_ri + jnp.where(~d_i & ~d_im, ri, 0.0)
    # light side: i = s-1 .. 0 (bdpt.cpp:300-306)
    ri = jnp.ones(B)
    for i in range(s - 1, -1, -1):
        rev = qs_rev if i == s - 1 else (
            qsm_rev if i == s - 2 else light_vs[i].pdf_rev)
        ri = ri * _remap0(rev) / _remap0(light_vs[i].pdf_fwd)
        d_i = zeros_b if i == s - 1 else light_vs[i].delta
        if i > 0:
            d_prev = (zeros_b if i - 1 == s - 1 else light_vs[i - 1].delta)
        else:
            from pbrt_tpu.ops import fetch as _fetch
            d_prev = jnp.round(_fetch.fetch_rows(
                scene.light_type,
                jnp.maximum(light_vs[0].light, 0))).astype(jnp.int32) \
                != ir.LIGHT_AREA
        sum_ri = sum_ri + jnp.where(~d_i & ~d_prev, ri, 0.0)
    return 1.0 / (1.0 + sum_ri)


# ---------------------------------------------------------------------------
# connection strategies (ConnectBDPT, bdpt.cpp:590-686)
# ---------------------------------------------------------------------------

def connect_strategies(scene, camera, width, height, cam_vs, light_vs,
                       cfg, max_path_verts, wavelength):
    """Evaluate every (s,t) strategy for the batch; returns
    (L [B,31] accumulating t>=2 strategies, [(pfilm, splat_L), ...] t=1)."""
    B = cam_vs[0].p.shape[0]
    NS = spec.N_SPECTRAL_SAMPLES
    L = jnp.zeros((B, NS))
    splats = []
    T = len(cam_vs)
    S = len(light_vs)
    lv0 = light_vs[0]
    lv0_area = getattr(lv0, "is_area_light", jnp.zeros(B, bool))

    for t in range(2, T + 1):
        pt = cam_vs[t - 1]

        # ---- s = 0: camera path lands on a light (bdpt.cpp:598-607) ------
        if t <= max_path_verts:
            w0 = _mis_weight(scene, cam_vs, light_vs, 0, t, camera,
                             width, height)
            on_light = pt.valid & (pt.light >= 0)
            L = L + jnp.where(on_light[:, None],
                              pt.beta * pt.le * w0[:, None], 0.0)

        # ---- s = 1: connect to the generated light vertex ----------------
        if scene.n_lights > 0 and t + 1 <= max_path_verts:
            w_pl, dist = _unit_to(pt.p, lv0.p)
            f_pt = pt.f_world(scene, w_pl) * geom.absdot(w_pl, pt.ns)[:, None]
            # emission toward pt: one-sided for area lights; spot/map
            # directional factors for delta emitters
            cos_l = geom.dot(lv0.ns, -w_pl)
            emit_ok = jnp.where(lv0_area, cos_l > 1e-6, True)
            emit_scale = lmod.delta_emit_scale(scene, lv0.light, -w_pl)
            g_l = (jnp.where(lv0_area, jnp.maximum(cos_l, 0.0), 1.0)
                   * emit_scale) / jnp.maximum(dist * dist, 1e-12)
            cand = pt.connectible & lv0.valid & emit_ok \
                & ~spec.is_black(f_pt)
            sray = isect.spawn_shadow_ray(pt.p, pt.ng, w_pl, dist, cand,
                                          wavelength)
            occ = isect.occluded(scene, sray,
                                  ignore_light=isect.nee_ignore_light(scene, lv0.light))
            w1 = _mis_weight(scene, cam_vs, light_vs, 1, t, camera,
                             width, height)
            contrib = pt.beta * f_pt * lv0.beta * g_l[:, None]
            L = L + jnp.where((cand & ~occ)[:, None],
                              contrib * w1[:, None], 0.0)

        # ---- s >= 2: inner connections (bdpt.cpp:661-680) ----------------
        for s in range(2, S + 1):
            if s + t > max_path_verts:
                continue
            qs = light_vs[s - 1]
            w_qp, dist = _unit_to(qs.p, pt.p)
            g = (geom.absdot(qs.ns, w_qp) * geom.absdot(pt.ns, w_qp)
                 / jnp.maximum(dist * dist, 1e-12))
            f_qs = qs.f_world(scene, w_qp)
            f_pt = pt.f_world(scene, -w_qp)
            cand = qs.connectible & pt.connectible \
                & ~spec.is_black(f_qs) & ~spec.is_black(f_pt)
            sray = isect.spawn_shadow_ray(qs.p, qs.ng, w_qp, dist, cand,
                                          wavelength)
            occ = isect.occluded(scene, sray)
            w = _mis_weight(scene, cam_vs, light_vs, s, t, camera,
                            width, height)
            contrib = qs.beta * f_qs * f_pt * pt.beta * g[:, None]
            L = L + jnp.where((cand & ~occ)[:, None],
                              contrib * w[:, None], 0.0)

    # ---- t = 1: light vertices connect to the camera (splats) ------------
    cam0 = cam_vs[0]
    for s in range(2, S + 1):
        if s + 1 > max_path_verts:
            continue
        qs = light_vs[s - 1]
        w_qc, dist = _unit_to(qs.p, cam0.p)
        pfilm, we, cam_ok = lt.camera_we_splat(camera, width, height,
                                               qs.p, -w_qc, dist)
        f_qs = qs.f_world(scene, w_qc) * geom.absdot(w_qc, qs.ns)[:, None]
        cand = qs.connectible & cam_ok & ~spec.is_black(f_qs)
        sray = isect.spawn_shadow_ray(qs.p, qs.ng, w_qc, dist, cand,
                                      wavelength)
        occ = isect.occluded(scene, sray)
        w = _mis_weight(scene, [cam0], light_vs, s, 1, camera,
                        width, height)
        contrib = qs.beta * f_qs * (we
                                    / jnp.maximum(dist * dist, 1e-9))[:, None]
        splat_L = jnp.where((cand & ~occ)[:, None], contrib * w[:, None],
                            0.0)
        splats.append((pfilm, splat_L))
    return L, splats


def _env_escape(scene, cam_vs, L):
    """Escaped camera rays pick up infinite-light radiance with weight 1
    (no other strategy produces these paths in this implementation)."""
    if not scene.has_infinite:
        return L
    for t in range(1, len(cam_vs)):
        v = cam_vs[t]
        env = lmod.env_le(scene, -v.wo)   # wo = -ray.d even on a miss
        L = L + jnp.where(v.escaped[:, None], v.beta * env, 0.0)
    return L


# ---------------------------------------------------------------------------
# render driver
# ---------------------------------------------------------------------------

def render_bdpt(scene, camera, film, cfg, spp, max_depth=5,
                generate_rays=None, progress=None,
                max_rays_per_pass=1 << 15):
    """Full BDPT render; returns (film, splat_scale).

    max_depth follows the reference: longest path has max_depth+2 vertices
    (camera + surface chain + light)."""
    from pbrt_tpu.integrators import path as pathint
    from pbrt_tpu.cameras import projective
    if generate_rays is None:
        generate_rays = projective.generate_rays
    H, W = film.height, film.width
    T = max_depth + 2
    S = max_depth + 1
    max_path_verts = max_depth + 2

    # scene/camera as jit arguments: the axon tunnel re-uploads
    # captured constants on every dispatch
    @jax.jit
    def one_pass(scene, camera, film, pixel_ids, sample_idx):
        ray, weight, pfilm, pid, sidx = pathint.camera_rays_for_pixels(
            camera, W, H, cfg, pixel_ids, sample_idx, generate_rays)
        cam_vs = generate_camera_subpath(scene, ray, pid, sidx, cfg, T,
                                         camera, W, H)
        light_vs = generate_light_subpath(scene, pid, sidx, cfg, S)
        L, splats = connect_strategies(scene, camera, W, H, cam_vs,
                                       light_vs, cfg, max_path_verts,
                                       ray.wavelength)
        L = _env_escape(scene, cam_vs, L)
        L = jnp.where(jnp.isfinite(L), L, 0.0)
        film = filmmod.add_samples(film, pfilm, jnp.maximum(L, 0.0), weight)
        for spf, sl in splats:
            sl = jnp.where(jnp.isfinite(sl), sl, 0.0)
            film = filmmod.add_splats(film, spf, sl)
        return film

    n_pix = H * W
    chunk = min(n_pix, max_rays_per_pass)
    n_chunks = (n_pix + chunk - 1) // chunk
    all_ids = np.empty(n_chunks * chunk, dtype=np.uint32)
    all_ids[:n_pix] = np.arange(n_pix, dtype=np.uint32)
    all_ids[n_pix:] = 0xFFFFFFFF
    done, total = 0, spp * n_chunks
    for sidx in range(spp):
        for c in range(n_chunks):
            ids = jnp.asarray(all_ids[c * chunk:(c + 1) * chunk])
            film = one_pass(scene, camera, film, ids, jnp.uint32(sidx))
            done += 1
            if progress:
                progress(done, total)
    # one light subpath per camera sample: splats normalize by 1/spp
    return film, 1.0 / spp
