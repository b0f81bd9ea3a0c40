"""Stochastic progressive photon mapping (reference: src/integrators/
sppm.cpp).

The reference builds a spatial hash grid over per-pixel visible points and
walks photons through it with atomic Phi accumulation (sppm.cpp:87-107).
Pointer-chasing hash grids are hostile to the TPU, so the gather is
reformulated densely: each photon chunk is tested against ALL visible
points at once and the flux deposit becomes a masked matrix product

    tau_add = (mask [V,Pc]) @ (beta_photons [Pc,31])

which runs on the MXU — O(V x P) pairwise work traded for zero divergence
and exact-radius kernels (no hash collisions, no cell quantization).

Per-pixel state follows the reference exactly: radius shrink
r' = r sqrt((N + a M)/(N + M)), flux rescale tau' = (tau + dtau) r'^2/r^2
(Knaus-Zwicker alpha = 2/3), direct lighting + emission accumulated in the
camera pass, photons deposit only after their first bounce.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import sampling
from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.materials import bsdf
from pbrt_tpu.lights import lights as lmod
from pbrt_tpu.ops import intersect as isect
from pbrt_tpu.samplers.samplers import sample_dim
from pbrt_tpu.integrators import path as pathmod
from pbrt_tpu.integrators.lighttracer import sample_le
from pbrt_tpu.scene import ir

ALPHA = 2.0 / 3.0


def _camera_pass(scene, camera, W, H, cfg, it, max_depth, generate_rays):
    """Trace camera paths to their first diffuse vertex; NEE for direct.

    Returns (Ld [V,31], vp_p [V,3], vp_f [V,31] = beta*kd/pi, vp_valid).
    """
    V = W * H
    pixel_id = jnp.arange(V, dtype=jnp.uint32)
    sidx = jnp.full(V, it, jnp.uint32)
    ray, weight, pfilm, pid, sidx = pathmod.camera_rays_for_pixels(
        camera, W, H, cfg, pixel_id, it, generate_rays)
    NS = spec.N_SPECTRAL_SAMPLES
    Ld = jnp.zeros((V, NS))
    beta = jnp.ones((V, NS)) * weight[:, None]
    alive = weight > 0
    specular = jnp.ones(V, bool)
    vp_p = jnp.zeros((V, 3))
    vp_f = jnp.zeros((V, NS))
    vp_found = jnp.zeros(V, bool)
    n_lights = max(scene.n_lights, 1)

    for bounce in range(max_depth + 1):
        hit = isect.intersect_full(scene, ray)
        le = lmod.area_le(scene, hit.light, hit.ng, hit.wo)
        Ld = Ld + jnp.where((alive & specular & hit.valid)[:, None],
                            beta * le, 0.0)
        if scene.has_infinite:
            env = lmod.env_le(scene, geom.normalize(ray.d))
            Ld = Ld + jnp.where((alive & specular & ~hit.valid)[:, None],
                                beta * env, 0.0)
        alive = alive & hit.valid
        if bounce == max_depth:
            break
        mat = bsdf.gather_materials(scene, hit.material, uv=hit.uv, p=hit.p)
        ss, ts = bsdf.shading_frame(scene, hit)
        wo_l = geom.world_to_frame(ss, ts, hit.ns, hit.wo)

        is_diffuse = (mat.type == ir.MAT_MATTE) | \
            (mat.type == ir.MAT_PLASTIC) | (mat.type == ir.MAT_UBER) | \
            (mat.type == ir.MAT_SUBSTRATE) | (mat.type == ir.MAT_RETRO)
        # record the first diffuse vertex as this pixel's visible point
        record = alive & is_diffuse & ~vp_found
        vp_p = jnp.where(record[:, None], hit.p, vp_p)
        vp_f = jnp.where(record[:, None],
                         beta * mat.kd * sampling.INV_PI, vp_f)
        vp_found = vp_found | record

        # NEE direct lighting at every vertex before the VP terminates it
        if scene.n_lights > 0:
            u_sel = sample_dim(cfg, pid, sidx, pathmod._bdim(bounce, 0))
            u1 = sample_dim(cfg, pid, sidx, pathmod._bdim(bounce, 1))
            u2 = sample_dim(cfg, pid, sidx, pathmod._bdim(bounce, 2))
            l = jnp.minimum((u_sel * n_lights).astype(jnp.int32),
                            n_lights - 1)
            wi, li, pdf_l, dist, delta_l = lmod.sample_li(
                scene, l, hit.p, hit.ns, u1, u2)
            wi_l = geom.world_to_frame(ss, ts, hit.ns, wi)
            f = bsdf.eval_f(mat, wo_l, wi_l) * \
                geom.absdot(wi, hit.ns)[:, None]
            cand = alive & (pdf_l > 1e-12) & ~spec.is_black(li) \
                & ~spec.is_black(f)
            sray = isect.spawn_shadow_ray(hit.p, hit.ng, wi, dist, cand,
                                          ray.wavelength, time=ray.time)
            occ = isect.occluded(scene, sray,
                                  ignore_light=isect.nee_ignore_light(scene, l))
            Ld = Ld + jnp.where(
                (cand & ~occ)[:, None],
                beta * f * li / jnp.maximum(pdf_l, 1e-12)[:, None]
                * n_lights, 0.0)

        # continue only through specular lobes (the VP absorbs diffuse)
        u_lobe = sample_dim(cfg, pid, sidx, pathmod._bdim(bounce, 3))
        ub1 = sample_dim(cfg, pid, sidx, pathmod._bdim(bounce, 4))
        ub2 = sample_dim(cfg, pid, sidx, pathmod._bdim(bounce, 5))
        wi_l, f_s, pdf_s, is_spec, _, _ = bsdf.sample_f(
            mat, wo_l, u_lobe, ub1, ub2)
        wi_w = geom.frame_to_world(ss, ts, hit.ns, wi_l)
        cont = alive & is_spec & ~vp_found & (pdf_s > 1e-12)
        beta = jnp.where(cont[:, None],
                         beta * f_s * (geom.absdot(wi_w, hit.ns)
                                       / jnp.maximum(pdf_s, 1e-12))[:, None],
                         beta)
        alive = cont
        specular = jnp.ones(V, bool)
        nray = isect.spawn_ray(hit.p, hit.ng, wi_w, ray.wavelength)
        ray = nray.replace(tmax=jnp.where(alive, nray.tmax, -1.0))
    return Ld, vp_p, vp_f, vp_found, pfilm


def _photon_pass(scene, cfg, it, n_photons, max_depth, vp_p, vp_f,
                 vp_valid, radius, photon_chunk=1024):
    """Emit photons and deposit flux on visible points (dense pairwise).

    Returns (tau_add [V,31], M [V] photon counts)."""
    NS = spec.N_SPECTRAL_SAMPLES
    V = vp_p.shape[0]
    pid = jnp.arange(n_photons, dtype=jnp.uint32) + jnp.uint32(0x50000000)
    sidx = jnp.full(n_photons, it, jnp.uint32)
    nl = max(scene.n_lights, 1)
    u_sel = sample_dim(cfg, pid, sidx, 0)
    l = jnp.minimum((u_sel * nl).astype(jnp.int32), nl - 1)
    o, d, Le, pdf, n_l = sample_le(
        scene, l,
        sample_dim(cfg, pid, sidx, 1), sample_dim(cfg, pid, sidx, 2),
        sample_dim(cfg, pid, sidx, 3), sample_dim(cfg, pid, sidx, 4))
    cos0 = jnp.abs(geom.dot(n_l, d))
    beta = Le * (nl * cos0 / jnp.maximum(pdf, 1e-12))[:, None]
    ray = isect.spawn_ray(o, n_l, d, jnp.full(n_photons, 550.0))
    alive = pdf > 1e-12

    tau_add = jnp.zeros((V, NS))
    M = jnp.zeros(V)
    r2 = radius * radius

    for bounce in range(max_depth):
        hit = isect.intersect_full(scene, ray)
        alive = alive & hit.valid
        # deposit only after the first bounce (direct light is NEE'd in
        # the camera pass; sppm.cpp photon loop depth>0)
        if bounce > 0:
            dep_beta = jnp.where(alive[:, None], beta, 0.0)
            for c0 in range(0, n_photons, photon_chunk):
                pc = slice(c0, c0 + photon_chunk)
                d2 = jnp.sum(
                    (vp_p[:, None, :] - hit.p[None, pc, :]) ** 2, -1)
                mask = (d2 <= r2[:, None]) & vp_valid[:, None] & \
                    alive[None, pc]
                w = mask.astype(jnp.float32)              # [V,Pc]
                tau_add = tau_add + w @ dep_beta[pc]       # MXU matmul
                M = M + w.sum(-1)
        if bounce == max_depth - 1:
            break
        mat = bsdf.gather_materials(scene, hit.material, uv=hit.uv,
                                    p=hit.p)
        ss, ts = bsdf.shading_frame(scene, hit)
        wo_l = geom.world_to_frame(ss, ts, hit.ns, hit.wo)
        base = 8 + bounce * 4
        wi_l, f_s, pdf_s, _, _, _ = bsdf.sample_f(
            mat, wo_l,
            sample_dim(cfg, pid, sidx, base),
            sample_dim(cfg, pid, sidx, base + 1),
            sample_dim(cfg, pid, sidx, base + 2))
        wi_w = geom.frame_to_world(ss, ts, hit.ns, wi_l)
        ok = (pdf_s > 1e-12) & ~spec.is_black(f_s)
        beta = jnp.where((alive & ok)[:, None],
                         beta * f_s * (geom.absdot(wi_w, hit.ns)
                                       / jnp.maximum(pdf_s, 1e-12))[:, None],
                         beta)
        # photon RR keyed on throughput (sppm.cpp:370)
        u_rr = sample_dim(cfg, pid, sidx, base + 3)
        q = jnp.clip(1.0 - jnp.max(beta, -1), 0.0, 0.95)
        kill = u_rr < q
        beta = beta / jnp.maximum(1.0 - q, 0.05)[:, None]
        alive = alive & ok & ~kill
        nray = isect.spawn_ray(hit.p, hit.ng, wi_w, ray.wavelength)
        ray = nray.replace(tmax=jnp.where(alive, nray.tmax, -1.0))
    return tau_add, M


def render_sppm(scene, camera, W, H, cfg, n_iterations=8,
                photons_per_iter=None, initial_radius=None, max_depth=5,
                generate_rays=None, progress=None):
    """Full SPPM render; returns [H,W,31] radiance."""
    from pbrt_tpu.cameras import projective
    if generate_rays is None:
        generate_rays = projective.generate_rays
    V = W * H
    if photons_per_iter is None:
        photons_per_iter = V
    if initial_radius is None:
        initial_radius = float(scene.world_radius) * 0.01
    NS = spec.N_SPECTRAL_SAMPLES

    radius = jnp.full(V, initial_radius)
    N = jnp.zeros(V)
    tau = jnp.zeros((V, NS))
    Ld_sum = jnp.zeros((V, NS))

    # scene as a jit argument (see path.render: tunnel constant cost)
    @jax.jit
    def one_iter(scene, state, it):
        radius, N, tau, Ld_sum = state
        Ld, vp_p, vp_f, vp_valid, pfilm = _camera_pass(
            scene, camera, W, H, cfg, it, max_depth, generate_rays)
        Ld_sum = Ld_sum + Ld
        tau_add, Mcount = _photon_pass(
            scene, cfg, it, photons_per_iter, max_depth, vp_p, vp_f,
            vp_valid, radius)
        # per-pixel radius/flux update (sppm.cpp:470-489)
        has = Mcount > 0
        N_new = N + ALPHA * Mcount
        r_new = radius * jnp.sqrt(jnp.where(
            has, N_new / jnp.maximum(N + Mcount, 1e-9), 1.0))
        ratio = jnp.where(has, (r_new / jnp.maximum(radius, 1e-12)) ** 2,
                          1.0)
        tau = (tau + vp_f * tau_add) * ratio[:, None]
        return (jnp.where(has, r_new, radius), jnp.where(has, N_new, N),
                tau, Ld_sum)

    state = (radius, N, tau, Ld_sum)
    for it in range(n_iterations):
        state = one_iter(scene, state, jnp.uint32(it))
        if progress:
            progress(it + 1, n_iterations)
    radius, N, tau, Ld_sum = state
    n_emitted = n_iterations * photons_per_iter
    L = Ld_sum / n_iterations + tau / (
        n_emitted * jnp.pi * jnp.maximum(radius, 1e-12)[:, None] ** 2)
    return L.reshape(H, W, NS)
