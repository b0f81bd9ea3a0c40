"""Unified light table: sampling, pdf, emitted radiance.

Reference layer: src/core/light.{h,cpp} + src/lights/* (point, spot, distant,
diffuse area, infinite) and Shape::Sample/Pdf solid-angle sampling
(shapes/sphere.cpp:232+, shapes/triangle.cpp:470+).  All light types are
evaluated under lane masks from the tagged light table in SceneData.

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
from pbrt_tpu.scene import ir


def _sphere_data(scene, l):
    """Per-lane sphere-light data: center (world), radius (world)."""
    qi = jnp.clip(scene.light_quad[l], 0, scene.quad_params.shape[0] - 1)
    o2w = scene.quad_o2w[qi]
    center = o2w[..., :3, 3]
    # uniform-scale assumption for sphere lights (builder computed area so)
    s = jnp.linalg.norm(o2w[..., :3, 0], axis=-1)
    radius = scene.quad_params[qi][..., 0] * s
    return center, radius


def sample_li(scene: ir.SceneData, l, p, n, u1, u2):
    """Sample incident direction from light `l` [B] toward points p [B,3].

    Returns (wi [B,3], Li [B,31], pdf [B], dist [B], is_delta [B]).
    pdf is w.r.t. solid angle at p.  dist is the distance to the sampled
    light point (for shadow-ray tmax); inf for distant/infinite.
    """
    lt = scene.light_type[l]
    L = scene.light_L[l]
    lpos = scene.light_pos[l]

    # --- point (lights/point.cpp): Li = I / r^2 ---
    to_l = lpos - p
    d2 = jnp.maximum(geom.length_sq(to_l), 1e-12)
    dist_point = jnp.sqrt(d2)
    wi_point = to_l / dist_point[..., None]
    li_point = L / d2[..., None]

    # --- spot (lights/spot.cpp): point falloff by cone ---
    cos_total = scene.light_params[l][..., 0]
    cos_fall = scene.light_params[l][..., 1]
    ldir = scene.light_dir[l]
    cos_t = geom.dot(-wi_point, ldir)
    delta = jnp.clip((cos_t - cos_total) /
                     jnp.maximum(cos_fall - cos_total, 1e-6), 0.0, 1.0)
    falloff = jnp.where(cos_t < cos_total, 0.0,
                        jnp.where(cos_t > cos_fall, 1.0, delta ** 4))
    li_spot = li_point * falloff[..., None]

    # --- goniometric / projection (lights/goniometric.cpp,
    # lights/projection.cpp): point emission modulated by a map ---
    tex_id = scene.light_params[l][..., 2].astype(jnp.int32)
    w_l = -wi_point              # emission direction in world
    # light frame: z along light_dir
    lz = ldir
    lx, ly = geom.coordinate_system(lz)
    d_loc = jnp.stack([geom.dot(w_l, lx), geom.dot(w_l, ly),
                       geom.dot(w_l, lz)], -1)
    # goniometric: equirect lookup of the emission direction
    u_g = geom.spherical_phi(d_loc) * (0.5 / jnp.pi)
    v_g = geom.spherical_theta(d_loc) / jnp.pi
    # projection: perspective mapping within the cone (params[3]=cos fov)
    cos_fov = scene.light_params[l][..., 3]
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
                           tex_id, uv_tex, p)
    map_scale = map_rgb.mean(-1)
    map_scale = jnp.where((lt == ir.LIGHT_PROJECTION) & ~inside_p,
                          0.0, map_scale)
    li_mapped = li_point * map_scale[..., None]

    # --- distant (lights/distant.cpp) ---
    wi_dist = -ldir
    li_dist = L

    # --- area: sphere (cone sampling, sphere.cpp:232+) or tri mesh ---
    center, radius = _sphere_data(scene, l)
    to_c = center - p
    dc2 = jnp.maximum(geom.length_sq(to_c), 1e-12)
    dc = jnp.sqrt(dc2)
    inside = dc2 <= radius * radius * 1.0001
    # cone toward sphere
    sin2_max = jnp.clip(radius * radius / dc2, 0.0, 1.0)
    cos_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_max))
    wz = geom.normalize(to_c)
    wx, wy = geom.coordinate_system(wz)
    cs = (1.0 - u1) + u1 * cos_max
    sn = jnp.sqrt(jnp.maximum(0.0, 1.0 - cs * cs))
    phi = 2 * jnp.pi * u2
    wi_sph = geom.frame_to_world(
        wx, wy, wz, geom.spherical_direction(sn, cs, phi))
    pdf_sph = sampling.uniform_cone_pdf(cos_max)
    # distance to sphere surface along wi (law of cosines)
    ds = dc * cs - jnp.sqrt(jnp.maximum(
        radius * radius - dc2 * sn * sn, 0.0))
    # inside the sphere: fall back to uniform sphere point (rare)
    pdf_sph = jnp.where(inside, 0.0, pdf_sph)

    # --- area: triangle mesh (uniform-by-area over light tris) ---
    T = scene.light_tri_idx.shape[1]
    cdf = scene.light_tri_cdf[l]                      # [B,T+1]
    # pick triangle by u1 (reuse: stratification sacrificed for 2D economy)
    ti = jnp.clip(jnp.sum((cdf <= u1[..., None]).astype(jnp.int32), -1) - 1,
                  0, T - 1)
    tri = jnp.take_along_axis(scene.light_tri_idx[l], ti[..., None], 1)[..., 0]
    tri = jnp.clip(tri, 0, scene.tri_v0.shape[0] - 1)
    # sample point: remap u1 within the chosen cdf span, keep u2
    c0 = jnp.take_along_axis(cdf, ti[..., None], 1)[..., 0]
    c1 = jnp.take_along_axis(cdf, ti[..., None] + 1, 1)[..., 0]
    u1r = jnp.clip((u1 - c0) / jnp.maximum(c1 - c0, 1e-9), 0.0, 0.999999)
    bc = sampling.uniform_sample_triangle(u1r, u2)
    v0 = scene.tri_v0[tri]
    q = v0 + bc[..., 0:1] * scene.tri_e1[tri] + bc[..., 1:2] * scene.tri_e2[tri]
    n_l = geom.normalize(jnp.cross(scene.tri_e1[tri], scene.tri_e2[tri]))
    n_l = jnp.where(scene.prim_flip_normal[tri][..., None], -n_l, n_l)
    to_q = q - p
    dq2 = jnp.maximum(geom.length_sq(to_q), 1e-12)
    dq = jnp.sqrt(dq2)
    wi_tri = to_q / dq[..., None]
    cos_l = geom.dot(n_l, -wi_tri)
    area = jnp.maximum(scene.light_area[l], 1e-12)
    pdf_tri = dq2 / jnp.maximum(jnp.abs(cos_l) * area, 1e-9)

    is_mesh = scene.light_quad[l] < 0
    wi_area = jnp.where(is_mesh[..., None], wi_tri, wi_sph)
    pdf_area = jnp.where(is_mesh, pdf_tri, pdf_sph)
    dist_area = jnp.where(is_mesh, dq, ds)
    two = scene.light_two_sided[l]
    front_mesh = two | (cos_l > 0)
    li_area = jnp.where(is_mesh[..., None],
                        jnp.where(front_mesh[..., None], L, 0.0), L)

    # --- infinite (lights/infinite.cpp): env-map 2D-CDF importance
    # sampling when a map is present, uniform sphere for constant env ---
    if scene.env_map.shape[0] > 1 or scene.env_map.shape[1] > 1:
        wi_inf, pdf_inf = sample_env_direction(scene, u1, u2)
    else:
        wi_inf = sampling.uniform_sample_sphere(u1, u2)
        pdf_inf = jnp.full_like(u1, sampling.INV_4PI)
    li_inf = _env_radiance(scene, wi_inf) * jnp.ones_like(L)

    INFD = jnp.float32(1e30)
    # select by type
    def sel(vp, vs, vd, va, vi, extra_dim=False):
        def w(m, x, y):
            return jnp.where(m[..., None] if extra_dim else m, x, y)
        out = w(lt == ir.LIGHT_POINT, vp, vi)
        out = w(lt == ir.LIGHT_SPOT, vs, out)
        out = w(lt == ir.LIGHT_DISTANT, vd, out)
        out = w(lt == ir.LIGHT_AREA, va, out)
        return out

    wi = sel(wi_point, wi_point, wi_dist, wi_area, wi_inf, True)
    li = sel(li_point, li_spot, li_dist, li_area, li_inf, True)
    is_mapped = (lt == ir.LIGHT_GONIO) | (lt == ir.LIGHT_PROJECTION)
    wi = jnp.where(is_mapped[..., None], wi_point, wi)
    li = jnp.where(is_mapped[..., None], li_mapped, li)
    pdf = sel(jnp.ones_like(u1), jnp.ones_like(u1), jnp.ones_like(u1),
              pdf_area, pdf_inf)
    pdf = jnp.where(is_mapped, 1.0, pdf)
    dist = sel(dist_point, dist_point, INFD, dist_area, INFD)
    dist = jnp.where(is_mapped, dist_point, dist)
    is_delta = (lt == ir.LIGHT_POINT) | (lt == ir.LIGHT_SPOT) | \
        (lt == ir.LIGHT_DISTANT) | is_mapped
    return wi, li, pdf, dist, is_delta


def pdf_li_area(scene: ir.SceneData, light_idx, prev_p, wi, hit_t, hit_ng):
    """Solid-angle pdf that NEE at prev_p would sample direction wi hitting
    an area light at distance hit_t with normal hit_ng (reference:
    Shape::Pdf(ref, wi), shape.cpp:136)."""
    l = jnp.clip(light_idx, 0, scene.light_L.shape[0] - 1)
    is_mesh = scene.light_quad[l] < 0
    # mesh: dist^2 / (|cos| * area)
    cos_l = jnp.abs(geom.dot(hit_ng, -wi))
    area = jnp.maximum(scene.light_area[l], 1e-12)
    pdf_mesh = hit_t * hit_t / jnp.maximum(cos_l * area, 1e-9)
    # sphere: cone pdf
    center, radius = _sphere_data(scene, l)
    dc2 = jnp.maximum(geom.length_sq(center - prev_p), 1e-12)
    sin2_max = jnp.clip(radius * radius / dc2, 0.0, 1.0)
    cos_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_max))
    pdf_sph = sampling.uniform_cone_pdf(cos_max)
    return jnp.where(is_mesh, pdf_mesh, pdf_sph)


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
    l = jnp.clip(light_idx, 0, scene.light_L.shape[0] - 1)
    L = scene.light_L[l]
    two = scene.light_two_sided[l]
    facing = two | (geom.dot(ng, wo) > 0)
    has = (light_idx >= 0) & (scene.light_type[l] == ir.LIGHT_AREA)
    return jnp.where((has & facing)[..., None], L, 0.0)


def delta_emit_scale(scene: ir.SceneData, l, w):
    """Direction-dependent emission scale for delta emitters: spot cone
    falloff (spot.cpp:60-76) and goniometric/projection map modulation;
    1 for point/area lights.  `w` is the world emission direction."""
    lt = scene.light_type[l]
    ldir = scene.light_dir[l]
    cos_total = scene.light_params[l][..., 0]
    cos_fall = scene.light_params[l][..., 1]
    cos_t = geom.dot(w, ldir)
    d = jnp.clip((cos_t - cos_total) /
                 jnp.maximum(cos_fall - cos_total, 1e-6), 0.0, 1.0)
    falloff = jnp.where(cos_t < cos_total, 0.0,
                        jnp.where(cos_t > cos_fall, 1.0, d ** 4))
    # map factor for goniometric / projection lights
    tex_id = scene.light_params[l][..., 2].astype(jnp.int32)
    lx, ly = geom.coordinate_system(ldir)
    d_loc = jnp.stack([geom.dot(w, lx), geom.dot(w, ly),
                       geom.dot(w, ldir)], -1)
    u_g = geom.spherical_phi(d_loc) * (0.5 / jnp.pi)
    v_g = geom.spherical_theta(d_loc) / jnp.pi
    cos_fov = scene.light_params[l][..., 3]
    inside_p = d_loc[..., 2] > jnp.maximum(cos_fov, 1e-6)
    tan_half = jnp.sqrt(jnp.maximum(1.0 - cos_fov * cos_fov, 1e-9)) / \
        jnp.maximum(cos_fov, 1e-6)
    zsafe = jnp.maximum(d_loc[..., 2], 1e-6)
    u_p = 0.5 + 0.5 * (d_loc[..., 0] / zsafe) / jnp.maximum(tan_half, 1e-9)
    v_p = 0.5 + 0.5 * (d_loc[..., 1] / zsafe) / jnp.maximum(tan_half, 1e-9)
    is_gonio = lt == ir.LIGHT_GONIO
    uv_tex = jnp.where(is_gonio[..., None], jnp.stack([u_g, v_g], -1),
                       jnp.stack([u_p, v_p], -1))
    from pbrt_tpu.textures.textures import eval_texture
    map_rgb = eval_texture(scene.tex_images, scene.tex_type,
                           scene.tex_params, scene.tex_c1, scene.tex_c2,
                           tex_id, uv_tex, w)
    map_scale = map_rgb.mean(-1)
    map_scale = jnp.where((lt == ir.LIGHT_PROJECTION) & ~inside_p,
                          0.0, map_scale)
    scale = jnp.ones_like(cos_t)
    scale = jnp.where(lt == ir.LIGHT_SPOT, falloff, scale)
    scale = jnp.where((lt == ir.LIGHT_GONIO) | (lt == ir.LIGHT_PROJECTION),
                      map_scale, scale)
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
