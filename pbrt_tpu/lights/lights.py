"""Unified light table: sampling, pdf, emitted radiance.

Reference layer: src/core/light.{h,cpp} + src/lights/* (point, spot, distant,
diffuse area, infinite) and Shape::Sample/Pdf solid-angle sampling
(shapes/sphere.cpp:232+, shapes/triangle.cpp:470+).  All light types are
evaluated under lane masks from the tagged light table in SceneData.

TPU shape: per-lane `table[l]` gathers are replaced by ONE fused
broadcast / one-hot-matmul fetch (ops/fetch.py), and whole light
families are pruned at compile via the static `scene.light_kinds`
tuple — the wavefront otherwise evaluates every family on every lane
(texture-mapped gonio lookups, env CDF inversion, sphere cone math)
even for a scene with a single mesh area light.

NEE contract (used by the wavefront integrators):
  sample_li(scene, l, p, u1, u2) -> (wi, Li, pdf_solid_angle, dist, is_delta)
  pdf_li(scene, l, p, wi, ...)   -> solid-angle pdf of NEE having sampled wi
  area_le(scene, hit, wo)        -> emission of a hit emissive primitive
  env_le(scene, d)               -> infinite-light radiance for escaped rays
"""

from __future__ import annotations

import jax.numpy as jnp

from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import sampling
from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.ops import fetch
from pbrt_tpu.scene import ir

_ALL_KINDS = (ir.LIGHT_POINT, ir.LIGHT_SPOT, ir.LIGHT_DISTANT,
              ir.LIGHT_AREA, ir.LIGHT_INFINITE, ir.LIGHT_GONIO,
              ir.LIGHT_PROJECTION)
_MAPPED = {ir.LIGHT_GONIO, ir.LIGHT_PROJECTION}
_POINTISH = {ir.LIGHT_POINT, ir.LIGHT_SPOT} | _MAPPED


def _kinds(scene):
    k = getattr(scene, "light_kinds", None)
    return set(_ALL_KINDS) if k is None else set(k)


def _fetch(scene, l, names):
    """Fused per-lane fetch of the named light-table columns."""
    arrs = [getattr(scene, "light_" + n) for n in names]
    vals = fetch.fetch_many(arrs, l)
    out = dict(zip(names, vals))
    for n in ("type", "quad"):
        if n in out:
            out[n] = jnp.round(out[n]).astype(jnp.int32)
    if "two_sided" in out:
        out["two_sided"] = out["two_sided"] > 0.5
    return out


def _sphere_data(scene, l):
    """Per-lane sphere-light data: center (world), radius (world)."""
    r = _fetch(scene, l, ("sph_center", "sph_radius"))
    return r["sph_center"], r["sph_radius"]


def _sample_mesh_area(scene, rec, l, p, u1, u2):
    """Uniform-by-area sample on a mesh light (triangle.cpp:470+).

    Returns (wi, pdf, dist, cos_l): cos_l is the emission-side cosine
    used for the one-sided facing test."""
    T = scene.light_tri_idx.shape[1]
    cdf = rec["tri_cdf"]                              # [B,T+1]
    ti = jnp.clip(jnp.sum((cdf <= u1[..., None]).astype(jnp.int32), -1) - 1,
                  0, T - 1)
    # one fused row fetch of the picked triangle's geometry
    row = fetch.fetch_rows(scene.light_tri_packed, l * T + ti)   # [B,10]
    v0, e1, e2 = row[:, 0:3], row[:, 3:6], row[:, 6:9]
    flip = row[:, 9] > 0.5
    # sample point: remap u1 within the chosen cdf span, keep u2
    c0 = jnp.take_along_axis(cdf, ti[..., None], 1)[..., 0]
    c1 = jnp.take_along_axis(cdf, ti[..., None] + 1, 1)[..., 0]
    u1r = jnp.clip((u1 - c0) / jnp.maximum(c1 - c0, 1e-9), 0.0, 0.999999)
    bc = sampling.uniform_sample_triangle(u1r, u2)
    q = v0 + bc[..., 0:1] * e1 + bc[..., 1:2] * e2
    n_l = geom.normalize(jnp.cross(e1, e2))
    n_l = jnp.where(flip[..., None], -n_l, n_l)
    to_q = q - p
    dq2 = jnp.maximum(geom.length_sq(to_q), 1e-12)
    dq = jnp.sqrt(dq2)
    wi = to_q / dq[..., None]
    cos_l = geom.dot(n_l, -wi)
    area = jnp.maximum(rec["area"], 1e-12)
    pdf = dq2 / jnp.maximum(jnp.abs(cos_l) * area, 1e-9)
    return wi, pdf, dq, cos_l


def _sample_sphere_area(rec, p, u1, u2):
    """Cone sampling toward a sphere light (sphere.cpp:232+).

    Returns (wi, pdf, dist)."""
    center, radius = rec["sph_center"], rec["sph_radius"]
    to_c = center - p
    dc2 = jnp.maximum(geom.length_sq(to_c), 1e-12)
    dc = jnp.sqrt(dc2)
    inside = dc2 <= radius * radius * 1.0001
    sin2_max = jnp.clip(radius * radius / dc2, 0.0, 1.0)
    cos_max = jnp.sqrt(jnp.maximum(1e-14, 1.0 - sin2_max))
    wz = geom.normalize(to_c)
    wx, wy = geom.coordinate_system(wz)
    cs = (1.0 - u1) + u1 * cos_max
    sn = jnp.sqrt(jnp.maximum(1e-14, 1.0 - cs * cs))
    phi = 2 * jnp.pi * u2
    wi = geom.frame_to_world(
        wx, wy, wz, geom.spherical_direction(sn, cs, phi))
    pdf = sampling.uniform_cone_pdf(cos_max)
    # distance to sphere surface along wi (law of cosines)
    ds = dc * cs - jnp.sqrt(jnp.maximum(
        radius * radius - dc2 * sn * sn, 1e-14))
    # inside the sphere: fall back to uniform sphere point (rare)
    pdf = jnp.where(inside, 0.0, pdf)
    return wi, pdf, ds


def _mapped_scale(scene, rec, lt, w_l):
    """Goniometric / projection map factor for emission direction w_l
    (lights/goniometric.cpp, lights/projection.cpp)."""
    tex_id = rec["params"][..., 2].astype(jnp.int32)
    ldir = rec["dir"]
    lx, ly = geom.coordinate_system(ldir)
    d_loc = jnp.stack([geom.dot(w_l, lx), geom.dot(w_l, ly),
                       geom.dot(w_l, ldir)], -1)
    u_g = geom.spherical_phi(d_loc) * (0.5 / jnp.pi)
    v_g = geom.spherical_theta(d_loc) / jnp.pi
    cos_fov = rec["params"][..., 3]
    inside_p = d_loc[..., 2] > jnp.maximum(cos_fov, 1e-6)
    tan_half = jnp.sqrt(jnp.maximum(1.0 - cos_fov * cos_fov, 1e-9)) / \
        jnp.maximum(cos_fov, 1e-6)
    zsafe = jnp.maximum(d_loc[..., 2], 1e-6)
    u_p = 0.5 + 0.5 * (d_loc[..., 0] / zsafe) / jnp.maximum(tan_half, 1e-9)
    v_p = 0.5 + 0.5 * (d_loc[..., 1] / zsafe) / jnp.maximum(tan_half, 1e-9)
    is_gonio = lt == ir.LIGHT_GONIO
    uv_tex = jnp.where(is_gonio[..., None],
                       jnp.stack([u_g, v_g], -1),
                       jnp.stack([u_p, v_p], -1))
    from pbrt_tpu.textures.textures import eval_texture
    map_rgb = eval_texture(scene.tex_images, scene.tex_type,
                           scene.tex_params, scene.tex_c1, scene.tex_c2,
                           tex_id, uv_tex, w_l,
                           kinds=getattr(scene, "tex_kinds", None))
    map_scale = map_rgb.mean(-1)
    return jnp.where((lt == ir.LIGHT_PROJECTION) & ~inside_p,
                     0.0, map_scale)


def sample_li(scene: ir.SceneData, l, p, n, u1, u2):
    """Sample incident direction from light `l` [B] toward points p [B,3].

    Returns (wi [B,3], Li [B,31], pdf [B], dist [B], is_delta [B]).
    pdf is w.r.t. solid angle at p.  dist is the distance to the sampled
    light point (for shadow-ray tmax); inf for distant/infinite.

    Light families not present in the scene (static light_kinds) compile
    to nothing.
    """
    kinds = _kinds(scene)
    B = p.shape[0]
    NS = spec.N_SPECTRAL_SAMPLES
    INFD = jnp.float32(1e30)
    if not kinds:
        return (jnp.zeros((B, 3)).at[:, 2].set(1.0), jnp.zeros((B, NS)),
                jnp.zeros(B), jnp.full(B, INFD), jnp.zeros(B, bool))

    has_mesh = (ir.LIGHT_AREA in kinds
                and getattr(scene, "has_mesh_lights", True))
    has_sph = (ir.LIGHT_AREA in kinds
               and getattr(scene, "has_sphere_lights", True))
    pointish = kinds & _POINTISH
    multi = len(kinds) > 1

    T = scene.light_tri_idx.shape[1]
    names = ["L"]
    if multi:
        names.append("type")
    if pointish:
        names.append("pos")
    if kinds & ({ir.LIGHT_SPOT, ir.LIGHT_DISTANT} | _MAPPED):
        names.append("dir")
    if kinds & ({ir.LIGHT_SPOT} | _MAPPED):
        names.append("params")
    if has_mesh:
        names += ["two_sided", "area", "tri_cdf"]
    if has_sph:
        names += ["sph_center", "sph_radius"]
    if has_mesh and has_sph:
        names.append("quad")
    rec = _fetch(scene, l, names)
    L = rec["L"]
    lt = rec.get("type")

    # each present family appends (mask, wi, li, pdf, dist, is_delta);
    # the chain folds back-to-front so the first entry is the default
    cases = []

    if pointish:
        # --- point-based emitters (lights/point.cpp): Li = I / r^2 ---
        to_l = rec["pos"] - p
        d2 = jnp.maximum(geom.length_sq(to_l), 1e-12)
        dist_point = jnp.sqrt(d2)
        wi_point = to_l / dist_point[..., None]
        li_point = L / d2[..., None]
        one = jnp.ones(B)
        if ir.LIGHT_POINT in kinds:
            cases.append((None if lt is None else lt == ir.LIGHT_POINT,
                          wi_point, li_point, one, dist_point, True))
        if ir.LIGHT_SPOT in kinds:
            # --- spot (lights/spot.cpp): point falloff by cone ---
            cos_total = rec["params"][..., 0]
            cos_fall = rec["params"][..., 1]
            cos_t = geom.dot(-wi_point, rec["dir"])
            delta = jnp.clip((cos_t - cos_total) /
                             jnp.maximum(cos_fall - cos_total, 1e-6),
                             0.0, 1.0)
            falloff = jnp.where(cos_t < cos_total, 0.0,
                                jnp.where(cos_t > cos_fall, 1.0, delta ** 4))
            cases.append((None if lt is None else lt == ir.LIGHT_SPOT,
                          wi_point, li_point * falloff[..., None], one,
                          dist_point, True))
        if kinds & _MAPPED:
            # --- goniometric / projection: point emission * map ---
            lt_m = (jnp.full(B, next(iter(kinds & _MAPPED)), jnp.int32)
                    if lt is None else lt)
            scale = _mapped_scale(scene, rec, lt_m, -wi_point)
            mask = None if lt is None else ((lt == ir.LIGHT_GONIO) |
                                            (lt == ir.LIGHT_PROJECTION))
            cases.append((mask, wi_point, li_point * scale[..., None],
                          one, dist_point, True))

    if ir.LIGHT_DISTANT in kinds:
        # --- distant (lights/distant.cpp) ---
        wi_dist = jnp.broadcast_to(-rec["dir"], (B, 3))
        cases.append((None if lt is None else lt == ir.LIGHT_DISTANT,
                      wi_dist, L, jnp.ones(B), jnp.full(B, INFD), True))

    if has_mesh or has_sph:
        # --- area: tri mesh (uniform by area) or sphere (cone) ---
        if has_mesh:
            wi_m, pdf_m, dist_m, cos_l = _sample_mesh_area(
                scene, rec, l, p, u1, u2)
            front = rec["two_sided"] | (cos_l > 0)
            li_m = jnp.where(front[..., None], L, 0.0)
        if has_sph:
            wi_s, pdf_s, dist_s = _sample_sphere_area(rec, p, u1, u2)
        if has_mesh and has_sph:
            is_mesh = (rec["quad"] < 0)
            wi_a = jnp.where(is_mesh[..., None], wi_m, wi_s)
            li_a = jnp.where(is_mesh[..., None], li_m, L)
            pdf_a = jnp.where(is_mesh, pdf_m, pdf_s)
            dist_a = jnp.where(is_mesh, dist_m, dist_s)
        elif has_mesh:
            wi_a, li_a, pdf_a, dist_a = wi_m, li_m, pdf_m, dist_m
        else:
            wi_a, li_a, pdf_a, dist_a = wi_s, L, pdf_s, dist_s
        cases.append((None if lt is None else lt == ir.LIGHT_AREA,
                      wi_a, li_a, pdf_a, dist_a, False))

    if ir.LIGHT_INFINITE in kinds:
        # --- infinite (lights/infinite.cpp): env-map 2D-CDF importance
        # sampling when a map is present, uniform sphere for constant ---
        if scene.env_map.shape[0] > 1 or scene.env_map.shape[1] > 1:
            wi_inf, pdf_inf = sample_env_direction(scene, u1, u2)
        else:
            wi_inf = sampling.uniform_sample_sphere(u1, u2)
            pdf_inf = jnp.full_like(u1, sampling.INV_4PI)
        li_inf = _env_radiance(scene, wi_inf) * jnp.ones_like(L)
        cases.append((None if lt is None else lt == ir.LIGHT_INFINITE,
                      wi_inf, li_inf, pdf_inf, jnp.full(B, INFD), False))

    if not cases:          # AREA tagged but no mesh/sphere geometry bound
        return (jnp.zeros((B, 3)).at[:, 2].set(1.0), jnp.zeros((B, NS)),
                jnp.zeros(B), jnp.full(B, INFD), jnp.zeros(B, bool))

    # fold: first case is the base, later ones override under their mask
    m0, wi, li, pdf, dist, dl0 = cases[0]
    is_delta = jnp.full(B, dl0, bool)
    for mask, wi_k, li_k, pdf_k, dist_k, dl_k in cases[1:]:
        mc = mask[..., None]
        wi = jnp.where(mc, wi_k, wi)
        li = jnp.where(mc, li_k, li)
        pdf = jnp.where(mask, pdf_k, pdf)
        dist = jnp.where(mask, dist_k, dist)
        is_delta = jnp.where(mask, dl_k, is_delta)
    return wi, li, pdf, dist, is_delta


def pdf_li_area(scene: ir.SceneData, light_idx, prev_p, wi, hit_t, hit_ng):
    """Solid-angle pdf that NEE at prev_p would sample direction wi hitting
    an area light at distance hit_t with normal hit_ng (reference:
    Shape::Pdf(ref, wi), shape.cpp:136)."""
    kinds = _kinds(scene)
    has_mesh = (ir.LIGHT_AREA in kinds
                and getattr(scene, "has_mesh_lights", True))
    has_sph = (ir.LIGHT_AREA in kinds
               and getattr(scene, "has_sphere_lights", True))
    if not (has_mesh or has_sph):
        return jnp.zeros(hit_t.shape)
    l = jnp.clip(light_idx, 0, scene.light_L.shape[0] - 1)
    names = []
    if has_mesh:
        names.append("area")
    if has_sph:
        names += ["sph_center", "sph_radius"]
    if has_mesh and has_sph:
        names.append("quad")
    rec = _fetch(scene, l, names)
    if has_mesh:
        # mesh: dist^2 / (|cos| * area)
        cos_l = jnp.abs(geom.dot(hit_ng, -wi))
        area = jnp.maximum(rec["area"], 1e-12)
        pdf_mesh = hit_t * hit_t / jnp.maximum(cos_l * area, 1e-9)
    if has_sph:
        # sphere: cone pdf
        center, radius = rec["sph_center"], rec["sph_radius"]
        dc2 = jnp.maximum(geom.length_sq(center - prev_p), 1e-12)
        sin2_max = jnp.clip(radius * radius / dc2, 0.0, 1.0)
        cos_max = jnp.sqrt(jnp.maximum(1e-14, 1.0 - sin2_max))
        pdf_sph = sampling.uniform_cone_pdf(cos_max)
    if has_mesh and has_sph:
        return jnp.where(rec["quad"] < 0, pdf_mesh, pdf_sph)
    return pdf_mesh if has_mesh else pdf_sph


def sample_env_direction(scene: ir.SceneData, u1, u2):
    """Importance-sample the env map via its 2D CDF tables
    (InfiniteAreaLight::Sample_Li, infinite.cpp:109+)."""
    He, We = scene.env_map.shape[:2]
    # marginal over rows (theta)
    iv = jnp.clip(jnp.searchsorted(scene.env_marg_cdf, u2, side="right") - 1,
                  0, He - 1)
    m0 = scene.env_marg_cdf[iv]
    m1 = scene.env_marg_cdf[iv + 1]
    dv = jnp.where(m1 > m0, (u2 - m0) / jnp.maximum(m1 - m0, 1e-12), 0.0)
    v = (iv.astype(u2.dtype) + dv) / He
    marg_int = jnp.maximum(jnp.mean(scene.env_cond_int), 1e-12)
    pdf_v = scene.env_cond_int[iv] / marg_int
    # conditional over columns (phi)
    row_cdf = scene.env_cond_cdf[iv]                       # [B, We+1]
    iu = jnp.clip(jnp.sum((row_cdf <= u1[:, None]).astype(jnp.int32), -1) - 1,
                  0, We - 1)
    c0 = jnp.take_along_axis(row_cdf, iu[:, None], 1)[:, 0]
    c1 = jnp.take_along_axis(row_cdf, iu[:, None] + 1, 1)[:, 0]
    du = jnp.where(c1 > c0, (u1 - c0) / jnp.maximum(c1 - c0, 1e-12), 0.0)
    u = (iu.astype(u1.dtype) + du) / We
    lum_row = scene.env_map[iv] @ jnp.asarray(spec.CIE_Y, jnp.float32)
    theta_w = (iv.astype(u1.dtype) + 0.5) / He * jnp.pi
    f_uv = jnp.take_along_axis(lum_row, iu[:, None], 1)[:, 0] * \
        jnp.sin(theta_w) + 1e-12
    pdf_u = f_uv / jnp.maximum(scene.env_cond_int[iv], 1e-12)
    # map (u,v) -> direction (light space -> world)
    phi = u * 2 * jnp.pi
    theta = v * jnp.pi
    sin_t = jnp.sin(theta)
    dl = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi),
                    jnp.cos(theta)], -1)
    wi = dl @ scene.env_to_world[:3, :3].T
    pdf = (pdf_u * pdf_v) / jnp.maximum(
        2 * jnp.pi * jnp.pi * sin_t, 1e-9)
    return geom.normalize(wi), jnp.where(sin_t > 1e-6, pdf, 0.0)


def pdf_li_infinite(scene: ir.SceneData, wi=None):
    """Solid-angle pdf of the infinite-light sampler for direction wi
    (InfiniteAreaLight::Pdf_Li, infinite.cpp:136+)."""
    if scene.env_map.shape[0] <= 1 and scene.env_map.shape[1] <= 1:
        return sampling.INV_4PI
    if wi is None:
        return sampling.INV_4PI
    He, We = scene.env_map.shape[:2]
    dl = wi @ scene.env_to_light[:3, :3].T
    theta = geom.spherical_theta(dl)
    phi = geom.spherical_phi(dl)
    iu = jnp.clip((phi * (0.5 / jnp.pi) * We).astype(jnp.int32), 0, We - 1)
    iv = jnp.clip((theta / jnp.pi * He).astype(jnp.int32), 0, He - 1)
    lum = scene.env_map[iv, iu] @ jnp.asarray(spec.CIE_Y, jnp.float32)
    sin_t = jnp.sin(theta)
    f_uv = lum * sin_t + 1e-12
    marg_int = jnp.maximum(jnp.mean(scene.env_cond_int), 1e-12)
    pdf_v = scene.env_cond_int[iv] / marg_int
    pdf_u = f_uv / jnp.maximum(scene.env_cond_int[iv], 1e-12)
    return jnp.where(sin_t > 1e-6,
                     pdf_u * pdf_v / (2 * jnp.pi * jnp.pi * sin_t), 0.0)


def area_le(scene: ir.SceneData, light_idx, ng, wo):
    """Emitted radiance of an area light prim toward wo (diffuse.h:55-76)."""
    kinds = _kinds(scene)
    if ir.LIGHT_AREA not in kinds:
        return jnp.zeros(ng.shape[:-1] + (spec.N_SPECTRAL_SAMPLES,))
    l = jnp.clip(light_idx, 0, scene.light_L.shape[0] - 1)
    multi = len(kinds) > 1
    rec = _fetch(scene, l, ["L", "two_sided"] + (["type"] if multi else []))
    facing = rec["two_sided"] | (geom.dot(ng, wo) > 0)
    has = light_idx >= 0
    if multi:
        has = has & (rec["type"] == ir.LIGHT_AREA)
    return jnp.where((has & facing)[..., None], rec["L"], 0.0)


def delta_emit_scale(scene: ir.SceneData, l, w):
    """Direction-dependent emission scale for delta emitters: spot cone
    falloff (spot.cpp:60-76) and goniometric/projection map modulation;
    1 for point/area lights.  `w` is the world emission direction."""
    kinds = _kinds(scene)
    B = w.shape[0]
    if not kinds & ({ir.LIGHT_SPOT} | _MAPPED):
        return jnp.ones(B)
    rec = _fetch(scene, l, ["type", "dir", "params"])
    lt = rec["type"]
    scale = jnp.ones(B)
    if ir.LIGHT_SPOT in kinds:
        cos_total = rec["params"][..., 0]
        cos_fall = rec["params"][..., 1]
        cos_t = geom.dot(w, rec["dir"])
        d = jnp.clip((cos_t - cos_total) /
                     jnp.maximum(cos_fall - cos_total, 1e-6), 0.0, 1.0)
        falloff = jnp.where(cos_t < cos_total, 0.0,
                            jnp.where(cos_t > cos_fall, 1.0, d ** 4))
        scale = jnp.where(lt == ir.LIGHT_SPOT, falloff, scale)
    if kinds & _MAPPED:
        map_scale = _mapped_scale(scene, rec, lt, w)
        scale = jnp.where((lt == ir.LIGHT_GONIO) |
                          (lt == ir.LIGHT_PROJECTION), map_scale, scale)
    return scale


def _env_radiance(scene: ir.SceneData, d):
    """Env-map lookup in light space (equirect); works for 1x1 constant."""
    dl = d @ scene.env_to_light[:3, :3].T
    He, We = scene.env_map.shape[:2]
    phi = geom.spherical_phi(dl)
    theta = geom.spherical_theta(dl)
    x = jnp.clip((phi * (0.5 / jnp.pi) * We).astype(jnp.int32), 0, We - 1)
    y = jnp.clip((theta / jnp.pi * He).astype(jnp.int32), 0, He - 1)
    return scene.env_map[y, x]


def env_le(scene: ir.SceneData, d):
    """Radiance from infinite lights for escaped rays (infinite.h Le)."""
    if not scene.has_infinite:
        return jnp.zeros(d.shape[:-1] + (spec.N_SPECTRAL_SAMPLES,))
    return _env_radiance(scene, d)
