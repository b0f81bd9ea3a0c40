"""Light (particle) tracing: the adjoint transport direction.

Foundations for the bidirectional family (reference: src/integrators/
bdpt.cpp light-subpath generation :427-436 + ConnectBDPT t=1 strategies
splatting via Film::AddSplat, film.cpp:154).  Photons start on lights
(Sample_Le, light.h:60), scatter through the scene as a wavefront, and at
every vertex connect to the camera: importance We * throughput splatted to
the image (PerspectiveCamera::We/Sample_Wi, perspective.cpp:180+).

As a standalone integrator this renders caustics-like transport that
forward path tracing finds slowly; integrators/bdpt.py builds the full
(s,t)-MIS family on top of the same sample_le/camera_we_splat machinery.
"""

from __future__ import annotations

import jax.numpy as jnp

from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import sampling
from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.core import transform as tfm
from pbrt_tpu.materials import bsdf
from pbrt_tpu.lights import lights as lmod
from pbrt_tpu.ops import intersect as isect
from pbrt_tpu.samplers.samplers import sample_dim
from pbrt_tpu.scene import ir
from pbrt_tpu.film import film as filmmod


def sample_le(scene: ir.SceneData, l, u1, u2, u3, u4):
    """Sample an emitted ray from light l [B] (Light::Sample_Le).

    Returns (ray_o, ray_d, Le [B,31], pdf_pos*pdf_dir [B], n_light [B,3]).
    Supports point, spot (cosine-cone), distant-lite, sphere + mesh area.
    Like sample_li, per-light columns come from one fused fetch and
    absent light families compile to nothing (scene.light_kinds).
    """
    kinds = lmod._kinds(scene)
    B = u1.shape[0]
    has_mesh = (ir.LIGHT_AREA in kinds
                and getattr(scene, "has_mesh_lights", True))
    has_sph = (ir.LIGHT_AREA in kinds
               and getattr(scene, "has_sphere_lights", True))
    has_area = has_mesh or has_sph
    has_other = bool(kinds - {ir.LIGHT_AREA})
    names = ["L"]
    if has_other:
        names.append("pos")
    if has_area:
        names.append("area")
    if has_mesh:
        names.append("tri_cdf")
    if has_sph:
        names += ["sph_center", "sph_radius"]
    if has_mesh and has_sph:
        names.append("quad")
    if has_area and has_other:
        names.append("type")
    rec = lmod._fetch(scene, l, names)
    L = rec["L"]

    if has_other:
        # point-family: uniform sphere direction (point.cpp Sample_Le)
        d_pt = sampling.uniform_sample_sphere(u1, u2)
        pdf_pt = jnp.full(B, sampling.INV_4PI)

    if has_area:
        inv_area = 1.0 / jnp.maximum(rec["area"], 1e-9)
        if has_sph:
            # area sphere: uniform point on sphere, cosine direction
            n_sph = sampling.uniform_sample_sphere(u1, u2)
            p_sph = rec["sph_center"] + rec["sph_radius"][:, None] * n_sph
        if has_mesh:
            # mesh area light: pick triangle by area CDF
            T = scene.light_tri_idx.shape[1]
            cdf = rec["tri_cdf"]
            ti = jnp.clip(
                jnp.sum((cdf <= u1[:, None]).astype(jnp.int32), -1) - 1,
                0, T - 1)
            from pbrt_tpu.ops import fetch
            row = fetch.fetch_rows(scene.light_tri_packed, l * T + ti)
            c0 = jnp.take_along_axis(cdf, ti[:, None], 1)[:, 0]
            c1 = jnp.take_along_axis(cdf, ti[:, None] + 1, 1)[:, 0]
            u1r = jnp.clip((u1 - c0) / jnp.maximum(c1 - c0, 1e-9),
                           0.0, 0.999999)
            bc = sampling.uniform_sample_triangle(u1r, u2)
            p_tri = (row[:, 0:3] + bc[:, 0:1] * row[:, 3:6]
                     + bc[:, 1:2] * row[:, 6:9])
            n_tri = geom.normalize(jnp.cross(row[:, 3:6], row[:, 6:9]))
            n_tri = jnp.where((row[:, 9] > 0.5)[:, None], -n_tri, n_tri)
        if has_mesh and has_sph:
            is_mesh = (rec["quad"] < 0)[:, None]
            p_area = jnp.where(is_mesh, p_tri, p_sph)
            n_area = jnp.where(is_mesh, n_tri, n_sph)
        elif has_mesh:
            p_area, n_area = p_tri, n_tri
        else:
            p_area, n_area = p_sph, n_sph
        # cosine-weighted emission direction about the light normal
        t1, t2 = geom.coordinate_system(n_area)
        d_loc = sampling.cosine_sample_hemisphere(u3, u4)
        d_area = geom.frame_to_world(t1, t2, n_area, d_loc)
        pdf_dir_area = jnp.maximum(d_loc[:, 2], 1e-9) * sampling.INV_PI
        pdf_area = inv_area * pdf_dir_area

    if has_area and has_other:
        is_area = rec["type"] == ir.LIGHT_AREA
        o = jnp.where(is_area[:, None], p_area, rec["pos"])
        d = jnp.where(is_area[:, None], d_area, d_pt)
        pdf = jnp.where(is_area, pdf_area, pdf_pt)
        n_l = jnp.where(is_area[:, None], n_area, d)
    elif has_area:
        o, d, pdf, n_l = p_area, d_area, pdf_area, n_area
    elif has_other:
        o, d, pdf = rec["pos"], d_pt, pdf_pt
        n_l = d
    else:
        o = jnp.zeros((B, 3))
        d = jnp.zeros((B, 3)).at[:, 2].set(1.0)
        pdf = jnp.zeros(B)
        n_l = d
    # spot cone falloff / gonio-projection map factors fold into Le so
    # uniform-sphere sampling of delta emitters stays unbiased
    L = L * lmod.delta_emit_scale(scene, l, d)[:, None]
    return o, d, L, pdf, n_l


def camera_we_splat(camera, width, height, p, wi_to_cam, dist):
    """Evaluate perspective importance for a world point: returns
    (pfilm [B,2], we [B], valid) — PerspectiveCamera::We/Sample_Wi
    (perspective.cpp:180-250): We = 1 / (A * cos^4 theta) with A the
    film-plane area at z=1."""
    w2c = jnp.linalg.inv(camera.cam_to_world)
    pc = tfm.xform_point(w2c, p)
    valid = pc[:, 2] > 1e-4
    # camera_to_raster is projective: xform_point performs the w-divide
    pras = tfm.xform_point(camera.camera_to_raster, pc)
    inb = ((pras[:, 0] >= 0) & (pras[:, 0] < width)
           & (pras[:, 1] >= 0) & (pras[:, 1] < height))
    # film-plane area at z=1 from the raster->camera corners
    r2c = camera.raster_to_camera
    corners = jnp.asarray([[0.0, 0.0, 0.0], [width, 0.0, 0.0],
                           [0.0, height, 0.0]])
    cc = tfm.xform_point(r2c, corners)
    cc = cc / cc[:, 2:3]
    A = jnp.abs((cc[1, 0] - cc[0, 0]) * (cc[2, 1] - cc[0, 1]))
    # cos of the angle to the camera axis, in camera space
    cos_t = jnp.maximum(pc[:, 2] / jnp.maximum(geom.length(pc), 1e-9), 1e-4)
    we = 1.0 / (A * cos_t ** 4)
    return pras[:, :2], we, valid & inb


def make_trace_lighttracer(camera, width, height, n_lights):
    """Returns a film-updating pass function for path.render-style driving:
    this integrator writes splats, so it plugs in at the render level."""

    def light_pass(scene, film, pixel_id, sample_idx, cfg, max_depth=5):
        B = pixel_id.shape[0]
        NS = spec.N_SPECTRAL_SAMPLES
        nl = max(scene.n_lights, 1)
        u_sel = sample_dim(cfg, pixel_id, sample_idx, 0)
        l = jnp.minimum((u_sel * nl).astype(jnp.int32), nl - 1)
        u1 = sample_dim(cfg, pixel_id, sample_idx, 1)
        u2 = sample_dim(cfg, pixel_id, sample_idx, 2)
        u3 = sample_dim(cfg, pixel_id, sample_idx, 3)
        u4 = sample_dim(cfg, pixel_id, sample_idx, 4)
        o, d, Le, pdf, n_l = sample_le(scene, l, u1, u2, u3, u4)
        cos0 = jnp.abs(geom.dot(n_l, d))
        beta = Le * (nl * cos0 / jnp.maximum(pdf, 1e-12))[:, None]
        ray = isect.spawn_ray(o, n_l, d, jnp.full(B, 550.0))
        alive = pdf > 1e-12

        for bounce in range(max_depth):
            hit = isect.intersect_full(scene, ray)
            alive = alive & hit.valid
            mat = bsdf.gather_materials(scene, hit.material, uv=hit.uv,
                                        p=hit.p)
            ss, ts = bsdf.shading_frame(scene, hit)
            wo_l = geom.world_to_frame(ss, ts, hit.ns, hit.wo)

            # connect vertex to camera
            cam_p = camera.cam_to_world[:3, 3]
            to_cam = cam_p[None, :] - hit.p
            dist = geom.length(to_cam)
            wi_c = to_cam / jnp.maximum(dist, 1e-9)[:, None]
            pfilm, we, cam_ok = camera_we_splat(camera, width, height,
                                               hit.p, -wi_c, dist)
            wi_c_l = geom.world_to_frame(ss, ts, hit.ns, wi_c)
            f = bsdf.eval_f(mat, wo_l, wi_c_l) * \
                geom.absdot(wi_c, hit.ns)[:, None]
            cand = alive & cam_ok & ~spec.is_black(f)
            sray = isect.spawn_ray(hit.p, hit.ng, wi_c, ray.wavelength,
                                   tmax=jnp.where(cand, dist * 0.999, -1.0))
            occ = isect.occluded(scene, sray)
            contrib = beta * f * (we / jnp.maximum(dist * dist, 1e-9))[:, None]
            splat_L = jnp.where((cand & ~occ)[:, None], contrib, 0.0)
            film = filmmod.add_splats(film, pfilm, splat_L)

            # continue the photon
            base = 8 + bounce * 4
            u_lobe = sample_dim(cfg, pixel_id, sample_idx, base)
            ub1 = sample_dim(cfg, pixel_id, sample_idx, base + 1)
            ub2 = sample_dim(cfg, pixel_id, sample_idx, base + 2)
            wi_l, f_s, pdf_s, is_spec, _, _ = bsdf.sample_f(
                mat, wo_l, u_lobe, ub1, ub2)
            wi_w = geom.frame_to_world(ss, ts, hit.ns, wi_l)
            ok = (pdf_s > 1e-12) & ~spec.is_black(f_s)
            beta = jnp.where(
                (alive & ok)[:, None],
                beta * f_s * (geom.absdot(wi_w, hit.ns)
                              / jnp.maximum(pdf_s, 1e-12))[:, None], beta)
            alive = alive & ok
            nray = isect.spawn_ray(hit.p, hit.ng, wi_w, ray.wavelength)
            ray = nray.replace(tmax=jnp.where(alive, nray.tmax, -1.0))
        return film

    return light_pass


def render_lighttracer(scene, camera, film, cfg, spp, max_depth=5,
                       photons_per_pass=None, progress=None):
    """Render by particle tracing alone; splat_scale normalizes by the
    total photon count per pixel area (BDPT lightImage semantics,
    bdpt.cpp Render)."""
    import jax
    import numpy as np
    H, W = film.height, film.width
    B = photons_per_pass or (H * W)
    light_pass = make_trace_lighttracer(camera, W, H, scene.n_lights)

    # scene as a jit argument (see path.render: tunnel constant cost)
    @jax.jit
    def one(scene, film, sample_idx):
        pid = jnp.arange(B, dtype=jnp.uint32)
        return light_pass(scene, film, pid,
                          jnp.broadcast_to(sample_idx, (B,)), cfg,
                          max_depth)

    for s in range(spp):
        film = one(scene, film, jnp.uint32(s))
        if progress:
            progress(s + 1, spp)
    # splat scale: 1/(photons) * (pixels) so radiance units match the
    # forward estimator
    return film, float(W * H) / float(B * spp)
