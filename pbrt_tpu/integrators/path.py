"""Wavefront path-tracing integrator (reference: src/integrators/path.cpp).

The reference's recursive `Li` over a per-ray call stack becomes a
fixed-depth *wavefront* loop over an SoA path-state batch: every bounce is
one round of {closest-hit, NEE shadow ray, BSDF sample} over all lanes with
dead lanes masked.  Depth is a statically unrolled Python loop so every
sampler dimension is static and the whole program is reverse-mode
differentiable (the reference has no differentiability at all).

MIS structure: the reference evaluates both NEE and BSDF-sampling
estimators inside EstimateDirect (integrator.cpp:108-216), intersecting the
scene twice per bounce.  Here the BSDF-sampling estimator is folded into the
*next* path vertex (`hit emissive -> weight by power heuristic against the
previous vertex's light pdf`), the standard GPU-wavefront formulation — the
same pair of MIS'd strategies with one closest-hit + one shadow ray per
bounce.

Russian roulette matches path.cpp:185-191 (starts after bounce 3, keyed on
beta * etaScale against rrThreshold).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import sampling
from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.materials import bsdf
from pbrt_tpu.lights import lights
from pbrt_tpu.ops import intersect as isect
from pbrt_tpu.samplers.samplers import SamplerConfig, sample_dim
from pbrt_tpu.film import film as filmmod
from pbrt_tpu.scene import ir

# sampler dimension layout (counter-based; stable across shardings)
DIM_PIXEL_X = 0
DIM_PIXEL_Y = 1
DIM_LENS_U = 2
DIM_LENS_V = 3
DIM_TIME = 4
DIMS_PER_BOUNCE = 9
DIM_BOUNCE_BASE = 5


def _bdim(bounce, k):
    return DIM_BOUNCE_BASE + bounce * DIMS_PER_BOUNCE + k


# BSSRDF probe-relocation dimensions live in their own block above the
# regular per-bounce dims (supports max_depth < 64 at 8 dims/bounce
# within the 1024-dim Sobol' table)
DIM_SSS_BASE = DIM_BOUNCE_BASE + 64 * DIMS_PER_BOUNCE
DIMS_PER_SSS = 8
# UniformSampleAllLights (integrator.cpp:54): per-bounce 2-dim pairs for
# every light beyond the first live in their own block
DIM_ALL_BASE = DIM_SSS_BASE + 64 * DIMS_PER_SSS
# chained probe passes: the reference walks the FULL intersection chain
# along the probe segment (bssrdf.cpp:255-270); each pass here extends
# the chain by one closest hit, reservoir-sampling among same-material
# hits, so N passes cover chains of length <= N exactly and longer
# chains are truncated.  4 covers a two-sided slab pierced twice (the
# reference's worst common case); raise via env for pathological
# geometry.  Cost is per-pass closest-hit dispatches, only in scenes
# with subsurface materials (statically gated by scene.has_sss).
import os as _os
SSS_PROBE_PASSES = int(_os.environ.get("PBRT_TPU_SSS_PASSES", "4"))


def _sdim_sss(bounce, k):
    return DIM_SSS_BASE + bounce * DIMS_PER_SSS + k


def _sss_event(scene, hit, mat, beta, alive, ss, ts, pixel_id, sample_idx,
               cfg, sdim, bounce, wavelength, n_rays, count_rays):
    """BSSRDF interface event + probe-ray relocation (reference
    SeparableBSSRDF::Sample_S / Sample_Sp / Pdf_Sp, bssrdf.cpp:214-309;
    path.cpp:155-180).

    At a subsurface hit: with probability Fr(cos wo) the lane becomes a
    perfect specular interface reflection; otherwise it transmits into
    the medium and relocates to an exit point pi found by a probe ray
    through a radius sampled from the diffusion profile.  Relocated
    lanes get beta *= Sp(po,pi) / Pdf_Sp and switch to the Sw exit lobe
    (MAT_SSW) so the bounce's NEE + direction sampling run at pi; the
    (1-Fr) transmission factor cancels against the branch selection
    probability exactly as in FresnelSpecular.

    Returns (hit, mat, beta, alive, n_rays)."""
    from pbrt_tpu.materials import bssrdf as bssrdfmod
    t = mat.type
    is_ss = alive & ((t == ir.MAT_SUBSURFACE) | (t == ir.MAT_KDSUBSURFACE))
    NS = spec.N_SPECTRAL_SAMPLES
    u0 = sdim(cfg, pixel_id, sample_idx, _sdim_sss(bounce, 0))
    # interface Fresnel: smooth lanes use the macro normal
    # (FresnelSpecular, subsurface.cpp:64-66); ROUGH lanes
    # (uroughness>0) evaluate it at a visible-GGX-sampled half vector
    # (the TrowbridgeReitz interface of subsurface.cpp:68-87)
    rough_if = is_ss & ((mat.rough_u > 0) | (mat.rough_v > 0))
    cos_wo = geom.dot(hit.wo, hit.ns)
    if True:
        u_h1 = sdim(cfg, pixel_id, sample_idx, _sdim_sss(bounce, 6))
        u_h2 = sdim(cfg, pixel_id, sample_idx, _sdim_sss(bounce, 7))
        wo_l0 = geom.world_to_frame(ss, ts, hit.ns, hit.wo)
        wh_l = bsdf.ggx_sample_wh(wo_l0, u_h1, u_h2,
                                  jnp.maximum(mat.rough_u, 1e-3),
                                  jnp.maximum(mat.rough_v, 1e-3))
        cos_h = jnp.sum(wo_l0 * wh_l, -1)
    cos_if = jnp.where(rough_if, cos_h, cos_wo)
    fr = bsdf.fresnel_dielectric(cos_if, 1.0, mat.eta)
    refl = is_ss & (u0 < fr)
    trans = is_ss & ~refl
    # reflected lanes: smooth -> perfect mirror (the FresnelSpecular
    # reflection half); rough -> reflection-only rough-glass lobe
    # (MicrofacetReflection w/ dielectric Fresnel, subsurface.cpp:76-83)
    # so this bounce's NEE + sampling see the rough highlight.  Rough
    # TRANSMISSION keeps the probe relocation with the FresnelSpecular
    # style (1-fr) cancellation — the visible-NDF D*G/pdf residual is
    # ~1, a documented small-bias deviation at high roughness.
    mat = mat.replace(
        type=jnp.where(refl, jnp.where(rough_if, ir.MAT_ROUGHGLASS,
                                       ir.MAT_MIRROR), mat.type),
        kr=jnp.where(refl[:, None], 1.0, mat.kr),
        kt=jnp.where((refl & rough_if)[:, None], 0.0, mat.kt))

    # ---- probe setup (Sample_Sp): projection frame, channel, radius --
    u_ax = sdim(cfg, pixel_id, sample_idx, _sdim_sss(bounce, 1))
    u_ch = sdim(cfg, pixel_id, sample_idx, _sdim_sss(bounce, 2))
    u_r = sdim(cfg, pixel_id, sample_idx, _sdim_sss(bounce, 3))
    u_phi = sdim(cfg, pixel_id, sample_idx, _sdim_sss(bounce, 4))
    u_pick = sdim(cfg, pixel_id, sample_idx, _sdim_sss(bounce, 5))
    pick_ns = (u_ax < 0.5)[:, None]
    pick_ss = ((u_ax >= 0.5) & (u_ax < 0.75))[:, None]
    vx = jnp.where(pick_ns, ss, jnp.where(pick_ss, ts, hit.ns))
    vy = jnp.where(pick_ns, ts, jnp.where(pick_ss, hit.ns, ss))
    vz = jnp.where(pick_ns, hit.ns, jnp.where(pick_ss, ss, ts))
    ch = jnp.clip((u_ch * NS).astype(jnp.int32), 0, NS - 1)
    sigt_ch = jnp.take_along_axis(mat.sss_sigma_t, ch[:, None], 1)[:, 0]
    rho_ch = jnp.take_along_axis(mat.sss_rho, ch[:, None], 1)[:, 0]
    tid = jnp.clip(mat.sss_tid, 0, scene.bssrdf_profile.shape[0] - 1)
    r_opt = bssrdfmod.sr_sample_device(
        scene.bssrdf_cdf, scene.bssrdf_radius, scene.bssrdf_rho,
        tid, rho_ch, u_r)
    r_max_opt = bssrdfmod.sr_sample_device(
        scene.bssrdf_cdf, scene.bssrdf_radius, scene.bssrdf_rho,
        tid, rho_ch, jnp.full_like(u_r, 0.999))
    inv_sigt = 1.0 / jnp.maximum(sigt_ch, 1e-9)
    r_w = r_opt * inv_sigt
    r_max = r_max_opt * inv_sigt
    ok_r = trans & (sigt_ch > 1e-9) & (r_w < r_max)
    half_l = jnp.sqrt(jnp.maximum(r_max * r_max - r_w * r_w, 0.0))
    phi = 2.0 * jnp.pi * u_phi
    pstart = (hit.p + r_w[:, None] * (jnp.cos(phi)[:, None] * vx
                                      + jnp.sin(phi)[:, None] * vy)
              + half_l[:, None] * vz)
    pdir = -vz

    # ---- chained probe: reservoir-pick among same-material hits ------
    P = scene.prim_type.shape[0]
    eps = 1e-4 * jnp.maximum(jnp.max(jnp.abs(pstart), -1), 1.0)
    cur_o = pstart
    remaining = jnp.where(ok_r, 2.0 * half_l, -1.0)
    dist0 = jnp.zeros_like(remaining)
    nfound = jnp.zeros_like(ch)
    picked = (jnp.zeros_like(dist0), jnp.zeros_like(ch),
              jnp.zeros_like(dist0), jnp.zeros_like(dist0))
    for k in range(SSS_PROBE_PASSES):
        pray = geom.Ray.make(cur_o, pdir, tmax=remaining,
                             wavelength=wavelength)
        if count_rays:
            n_rays = n_rays.at[0].add(
                jnp.sum((remaining > 0).astype(jnp.float32)))
        tt, prim, uu, vv, found = isect.intersect(scene, pray)
        pm = scene.prim_material[jnp.clip(prim, 0, P - 1)]
        match = found & (pm == hit.material)
        nfound = nfound + match.astype(jnp.int32)
        # golden-ratio shift decorrelates the per-pass reservoir draw
        u_k = jnp.mod(u_pick + 0.61803398875 * k, 1.0)
        accept = match & (u_k * nfound.astype(jnp.float32) < 1.0)
        picked = (jnp.where(accept, dist0 + tt, picked[0]),
                  jnp.where(accept, prim, picked[1]),
                  jnp.where(accept, uu, picked[2]),
                  jnp.where(accept, vv, picked[3]))
        if k + 1 < SSS_PROBE_PASSES:
            # tt from the dense path is the bf16x2-quantized kernel t
            # (truncated downward by up to ~1.2e-4 relative): scale the
            # march epsilon with t so the next pass can't re-hit the
            # same triangle when the quantization deficit exceeds the
            # absolute eps
            step = tt * (1.0 + 2e-4) + eps
            dist0 = dist0 + jnp.where(found, step, 0.0)
            cur_o = cur_o + jnp.where(found, step, 0.0)[:, None] * pdir
            remaining = jnp.where(found, remaining - step, -1.0)

    found_any = trans & (nfound > 0)
    probe_ray = geom.Ray.make(pstart, pdir, tmax=jnp.maximum(remaining, 0.0),
                              wavelength=wavelength)
    pih = isect.make_hit(scene, probe_ray, picked[0], picked[1],
                         picked[2], picked[3], found_any)

    # ---- Sp and its pdf at pi (TabulatedBSSRDF::Sr + Pdf_Sp) ---------
    d_vec = pih.p - hit.p
    d_w = geom.length(d_vec)
    sig2 = mat.sss_sigma_t * mat.sss_sigma_t                    # [B,31]
    sp = bssrdfmod.sr_eval_device(
        scene.bssrdf_profile, scene.bssrdf_rho, scene.bssrdf_radius,
        tid[:, None], mat.sss_rho, d_w[:, None] * mat.sss_sigma_t) * sig2
    dl = jnp.stack([geom.dot(ss, d_vec), geom.dot(ts, d_vec),
                    geom.dot(hit.ns, d_vec)], -1)               # [B,3]
    nl = jnp.stack([geom.dot(ss, pih.ng), geom.dot(ts, pih.ng),
                    geom.dot(hit.ns, pih.ng)], -1)
    r_proj = jnp.sqrt(jnp.maximum(jnp.stack(
        [dl[:, 1] ** 2 + dl[:, 2] ** 2,
         dl[:, 2] ** 2 + dl[:, 0] ** 2,
         dl[:, 0] ** 2 + dl[:, 1] ** 2], -1), 1e-20))           # [B,3]
    # MIS over 3 projection axes x NS channels (bssrdf.cpp:283-309)
    pdf_terms = bssrdfmod.sr_pdf_device(
        scene.bssrdf_profile, scene.bssrdf_cdf, scene.bssrdf_rho,
        scene.bssrdf_radius, tid[:, None, None], mat.sss_rho[:, None, :],
        r_proj[:, :, None] * mat.sss_sigma_t[:, None, :]) \
        * sig2[:, None, :]                                      # [B,3,31]
    axis_prob = jnp.asarray([0.25, 0.25, 0.5])
    pdf_sp = jnp.sum(pdf_terms * jnp.abs(nl)[:, :, None]
                     * axis_prob[None, :, None], axis=(1, 2)) / NS
    pdf_sp = pdf_sp / jnp.maximum(nfound.astype(jnp.float32), 1.0)

    ok = found_any & (pdf_sp > 1e-12)
    beta = jnp.where(ok[:, None],
                     beta * sp / jnp.maximum(pdf_sp, 1e-12)[:, None], beta)
    alive = alive & ~(trans & ~ok)
    okc = ok[:, None]
    hit = hit.replace(p=jnp.where(okc, pih.p, hit.p),
                      ng=jnp.where(okc, pih.ng, hit.ng),
                      ns=jnp.where(okc, pih.ns, hit.ns),
                      uv=jnp.where(okc, pih.uv, hit.uv),
                      prim=jnp.where(ok, pih.prim, hit.prim),
                      instance=jnp.where(ok, pih.instance, hit.instance),
                      # the Sw exit lobe is wo-independent; pointing wo
                      # along ns keeps the shading frame well-formed
                      wo=jnp.where(okc, pih.ns, hit.wo))
    mat = mat.replace(type=jnp.where(ok, ir.MAT_SSW, mat.type))
    return hit, mat, beta, alive, n_rays


def trace_paths(scene: ir.SceneData, ray: geom.Ray, pixel_id, sample_idx,
                cfg: SamplerConfig, max_depth=5, rr_threshold=1.0,
                wavelength_mask=None, light_strategy="uniform",
                uniforms=None, count_rays=False, tex_spread=0.0,
                ray_diff=None):
    """Estimate radiance for a batch of camera rays; returns L [B,31].

    wavelength_mask: optional [B,31] 0/1 mask restricting transport to a
    band subset (used by the spectralpath CA integrator).
    uniforms: optional [B,D] explicit random vector — dims are read from
    it instead of the counter-based sampler (the primary-sample-space
    hook used by MLT, reference mlt.h MLTSampler:53-105).
    count_rays: also return the number of rays actually traced (live
    closest-hit lanes + candidate shadow lanes — dead lanes drop out of
    the sparse intersect queue, so they are NOT counted as work), the
    accounting bench.py reports against the reference's ray stats.
    """
    if uniforms is not None:
        def sdim(cfg_, pid_, sidx_, dim):
            return uniforms[:, dim % uniforms.shape[1]]
    else:
        sdim = sample_dim
    B = ray.o.shape[0]
    NS = spec.N_SPECTRAL_SAMPLES
    L = jnp.zeros((B, NS))
    beta = jnp.ones((B, NS))
    if wavelength_mask is not None:
        beta = beta * wavelength_mask
    alive = jnp.ones(B, bool)
    specular = jnp.ones(B, bool)       # bounce 0 counts Le un-MIS'd
    prev_pdf = jnp.ones(B)
    prev_p = ray.o
    eta_scale = jnp.ones(B)
    n_lights = max(scene.n_lights, 1)
    from pbrt_tpu.lights import distrib

    # measured work counters [closest, shadow, camera, path vertices]
    # (the reference's STAT_COUNTER family, stats.cpp; count_rays="full"
    # returns the vector, True the closest+shadow total for bench.py)
    n_rays = jnp.zeros((4,), jnp.float32)
    if count_rays:
        n_cam = jnp.sum((ray.tmax > 0).astype(jnp.float32))
        n_rays = n_rays.at[0].add(n_cam).at[2].add(n_cam)
    # camera-ray closest hit; every later bounce traces its closest-hit
    # and NEE shadow rays through ONE combined batch (_trace_pair) so the
    # sparse kernel pays one sort + one queue + one launch per bounce
    hit = isect.intersect_full(scene, ray, presorted=True,
                               ray_diff=ray_diff)
    rd = ray_diff          # propagated through specular bounces below
    for bounce in range(max_depth + 1):
        dnorm = geom.normalize(ray.d)

        # ---- emitted radiance at the hit (path.cpp:98-107 + folded MIS) --
        le = lights.area_le(scene, hit.light, hit.ng, hit.wo)
        if bounce == 0:
            w_hit = jnp.ones(B)
        else:
            sel_pdf_hit = distrib.selection_pdf(scene, light_strategy,
                                                prev_p, hit.light)
            pdf_light = lights.pdf_li_area(
                scene, hit.light, prev_p, dnorm, hit.t, hit.ng) * sel_pdf_hit
            w_hit = jnp.where(specular, 1.0, sampling.power_heuristic(
                1.0, prev_pdf, 1.0, pdf_light))
        L = L + jnp.where((alive & hit.valid)[:, None],
                          beta * le * w_hit[:, None], 0.0)

        # ---- escaped rays: infinite lights (path.cpp:100-103) ------------
        if scene.has_infinite:
            env = lights.env_le(scene, dnorm)
            if bounce == 0:
                w_env = jnp.ones(B)
            else:
                sel_env = distrib.selection_pdf(
                    scene, light_strategy, prev_p,
                    jnp.full_like(hit.light, scene.inf_light_idx))
                pdf_env = lights.pdf_li_infinite(scene, dnorm) * sel_env
                w_env = jnp.where(specular, 1.0, sampling.power_heuristic(
                    1.0, prev_pdf, 1.0, pdf_env))
            L = L + jnp.where((alive & ~hit.valid)[:, None],
                              beta * env * w_env[:, None], 0.0)

        alive = alive & hit.valid
        if count_rays:
            n_rays = n_rays.at[3].add(jnp.sum(alive.astype(jnp.float32)))
        if bounce == max_depth:
            break

        # ---- shading frame (with bump perturbation when bound) -----------
        u_mix = sdim(cfg, pixel_id, sample_idx, _bdim(bounce, 7))
        # mip-level footprint: camera pixel cone widened to a diffuse
        # cone after the first bounce (stand-in for ray differentials;
        # texture.cpp ComputeDifferentials / cone tracing heuristic).
        # tex_spread == 0 (static) keeps the finest level, no extra cost
        uv_w = None
        if tex_spread > 0.0 and hit.uv_density is not None \
                and scene.tex_type.shape[0] > 1:
            spread_b = tex_spread if bounce == 0 else max(tex_spread, 0.2)
            uv_w = hit.uv_density * hit.t * spread_b
        # first-hit ray differentials (when carried) select EWA
        # anisotropic filtering; later bounces keep the cone heuristic
        mat = bsdf.gather_materials(scene, hit.material, uv=hit.uv, p=hit.p,
                                    u_mix=u_mix, uv_width=uv_w,
                                    face=hit.face, duv=hit.duv)
        hit = hit.replace(ns=bsdf.bump_shading_normal(scene, hit.material,
                                                      hit))
        ss, ts = geom.coordinate_system(hit.ns)
        if getattr(scene, "has_hair", False):
            ss, ts = bsdf.hair_shading_frame(scene, hit, ss, ts)
        # ---- BSSRDF probe relocation (bssrdf.cpp Sample_S) ---------------
        # statically skipped unless the scene has subsurface materials;
        # relocated lanes continue this bounce's NEE + sampling at pi
        if getattr(scene, "has_sss", False):
            hit, mat, beta, alive, n_rays = _sss_event(
                scene, hit, mat, beta, alive, ss, ts, pixel_id,
                sample_idx, cfg, sdim, bounce, ray.wavelength,
                n_rays, count_rays)
            ss, ts = geom.coordinate_system(hit.ns)
            if getattr(scene, "has_hair", False):
                ss, ts = bsdf.hair_shading_frame(scene, hit, ss, ts)
        wo_l = geom.world_to_frame(ss, ts, hit.ns, hit.wo)

        # ---- NEE: one light, MIS power heuristic (integrator.cpp:85-216) -
        # the shadow ray is built (and its unoccluded contribution
        # precomputed) here, but traced together with the next bounce's
        # closest-hit ray in the combined batch below
        if scene.n_lights > 0 and light_strategy == "all":
            # UniformSampleAllLights (integrator.cpp:54): one sample from
            # EVERY light per bounce; the shadow batches concatenate into
            # the bounce's combined trace
            n_l = scene.light_L.shape[0]
            srays, contribs, cands = [], [], []
            l = None
            for li_ix in range(n_l):
                base = DIM_ALL_BASE + bounce * 2 * n_l + 2 * li_ix
                u1 = sdim(cfg, pixel_id, sample_idx, base)
                u2 = sdim(cfg, pixel_id, sample_idx, base + 1)
                lv = jnp.full(B, li_ix, jnp.int32)
                wi, li, pdf_l, dist, delta_l = lights.sample_li(
                    scene, lv, hit.p, hit.ns, u1, u2)
                wi_l = geom.world_to_frame(ss, ts, hit.ns, wi)
                f = bsdf.eval_f(mat, wo_l, wi_l) * \
                    geom.absdot(wi, hit.ns)[:, None]
                ci = alive & (pdf_l > 1e-12) & ~spec.is_black(li) \
                    & ~spec.is_black(f)
                srays.append(isect.spawn_shadow_ray(
                    hit.p, hit.ng, wi, dist, ci, ray.wavelength,
                    time=ray.time))
                pdf_b = bsdf.pdf_f(mat, wo_l, wi_l)
                w_l = jnp.where(delta_l, 1.0, sampling.power_heuristic(
                    1.0, pdf_l, 1.0, pdf_b))
                contribs.append(beta * f * li
                                * (w_l / jnp.maximum(pdf_l, 1e-12))[:, None])
                cands.append(ci)
                if count_rays:
                    n_rays = n_rays.at[1].add(
                        jnp.sum(ci.astype(jnp.float32)))
            sray = jax.tree.map(lambda *a: jnp.concatenate(a, 0), *srays)
            cand = jnp.stack(cands)          # [n_l, B]
            contrib = jnp.stack(contribs)    # [n_l, B, 31]
        elif scene.n_lights > 0:
            u_sel = sdim(cfg, pixel_id, sample_idx, _bdim(bounce, 0))
            u1 = sdim(cfg, pixel_id, sample_idx, _bdim(bounce, 1))
            u2 = sdim(cfg, pixel_id, sample_idx, _bdim(bounce, 2))
            l, sel_pdf = distrib.select_light(scene, light_strategy,
                                              hit.p, u_sel)
            wi, li, pdf_l, dist, delta_l = lights.sample_li(
                scene, l, hit.p, hit.ns, u1, u2)
            wi_l = geom.world_to_frame(ss, ts, hit.ns, wi)
            f = bsdf.eval_f(mat, wo_l, wi_l) * \
                geom.absdot(wi, hit.ns)[:, None]
            cand = alive & (pdf_l > 1e-12) & ~spec.is_black(li) \
                & ~spec.is_black(f)
            # shadow ray; dead lanes get tmax<=0 so traversal skips them
            sray = isect.spawn_shadow_ray(hit.p, hit.ng, wi, dist, cand,
                                          ray.wavelength, time=ray.time)
            if count_rays:
                n_rays = n_rays.at[1].add(jnp.sum(cand.astype(jnp.float32)))
            pdf_b = bsdf.pdf_f(mat, wo_l, wi_l)
            w_l = jnp.where(delta_l, 1.0,
                            sampling.power_heuristic(1.0, pdf_l, 1.0, pdf_b))
            contrib = beta * f * li * (
                w_l / jnp.maximum(pdf_l * sel_pdf, 1e-12))[:, None]
        else:
            sray = l = cand = contrib = None

        # ---- BSDF sampling (path.cpp:141-148) ----------------------------
        u_lobe = sdim(cfg, pixel_id, sample_idx, _bdim(bounce, 3))
        ub1 = sdim(cfg, pixel_id, sample_idx, _bdim(bounce, 4))
        ub2 = sdim(cfg, pixel_id, sample_idx, _bdim(bounce, 5))
        ub3 = (sdim(cfg, pixel_id, sample_idx, _bdim(bounce, 8))
               if getattr(scene, "has_hair", False) else None)
        wi_l, f, pdf, is_spec, transmitted, eta_fac = bsdf.sample_f(
            mat, wo_l, u_lobe, ub1, ub2, u3=ub3)
        wi_w = geom.frame_to_world(ss, ts, hit.ns, wi_l)
        cos_t = geom.absdot(wi_w, hit.ns)
        ok = (pdf > 1e-12) & ~spec.is_black(f)
        beta_new = beta * f * (cos_t / jnp.maximum(pdf, 1e-12))[:, None]
        alive = alive & ok
        beta = jnp.where(alive[:, None], beta_new, beta)
        eta_scale = eta_scale * jnp.where(alive, eta_fac, 1.0)
        specular = is_spec
        prev_pdf = pdf
        prev_p = hit.p
        # ---- specular ray-differential propagation (VERDICT r4 item
        # 7; reference SpecularReflect/Transmit, integrator.cpp:
        # 344-429): specular lanes carry rx/ry through the bounce with
        # the dndx machinery; non-specular lanes zero their
        # differentials, so later texture lookups fall back per-lane to
        # the ray-cone heuristic (textures.py EWA fallback).
        if rd is not None:
            rxo, rxd, ryo, ryd = rd
            ns_ = hit.ns
            dwodx = -rxd - hit.wo
            dwody = -ryd - hit.wo
            dDNdx = geom.dot(dwodx, ns_) + geom.dot(hit.wo, hit.dndx)
            dDNdy = geom.dot(dwody, ns_) + geom.dot(hit.wo, hit.dndy)
            won = geom.dot(hit.wo, ns_)
            refl_rxd = wi_w - dwodx + 2.0 * (
                won[:, None] * hit.dndx + dDNdx[:, None] * ns_)
            refl_ryd = wi_w - dwody + 2.0 * (
                won[:, None] * hit.dndy + dDNdy[:, None] * ns_)
            eta_r = jnp.where(won < 0,
                              1.0 / jnp.maximum(mat.eta, 1e-6), mat.eta)
            w_ = -hit.wo
            wdn = geom.dot(w_, ns_)
            widn = geom.dot(wi_w, ns_)
            safe_widn = jnp.where(jnp.abs(widn) > 1e-6, widn, 1e-6)
            mu_ = eta_r * wdn - widn
            dmudx = (eta_r - (eta_r * eta_r * wdn) / safe_widn) * dDNdx
            dmudy = (eta_r - (eta_r * eta_r * wdn) / safe_widn) * dDNdy
            tran_rxd = wi_w + eta_r[:, None] * dwodx - (
                mu_[:, None] * hit.dndx + dmudx[:, None] * ns_)
            tran_ryd = wi_w + eta_r[:, None] * dwody - (
                mu_[:, None] * hit.dndy + dmudy[:, None] * ns_)
            tcol = transmitted[:, None]
            new_rxd = jnp.where(tcol, tran_rxd, refl_rxd)
            new_ryd = jnp.where(tcol, tran_ryd, refl_ryd)
            keep = (alive & is_spec & hit.valid)[:, None]
            fin = lambda a: jnp.where(jnp.isfinite(a), a, 0.0)
            rd = (jnp.where(keep, fin(hit.p + hit.dpdx), hit.p),
                  jnp.where(keep, fin(new_rxd), 0.0),
                  jnp.where(keep, fin(hit.p + hit.dpdy), hit.p),
                  jnp.where(keep, fin(new_ryd), 0.0))
        nray = isect.spawn_ray(hit.p, hit.ng, wi_w, ray.wavelength,
                               time=ray.time)
        # dead lanes: zero-length rays so traversal exits immediately
        ray = nray.replace(tmax=jnp.where(alive, nray.tmax, -1.0))

        # ---- Russian roulette (path.cpp:185-191) -------------------------
        if bounce > 3:
            rr_max = jnp.max(beta, -1) * eta_scale
            u_rr = sdim(cfg, pixel_id, sample_idx, _bdim(bounce, 6))
            # q clamped to <=0.99 and used for BOTH the kill test and the
            # reweight (consistent => unbiased); the clamp keeps 1/(1-q)
            # finite so reverse-mode grads don't hit the 0*inf where-trap
            q = jnp.clip(1.0 - jax.lax.stop_gradient(rr_max), 0.05, 0.99)
            apply_rr = rr_max < rr_threshold
            kill = apply_rr & (u_rr < q)
            alive = alive & ~kill
            scale = jnp.where(apply_rr & alive, 1.0 / (1.0 - q), 1.0)
            beta = beta * scale[:, None]
            ray = ray.replace(tmax=jnp.where(alive, ray.tmax, -1.0))

        # ---- combined trace: next closest-hit + this bounce's shadow -----
        if count_rays:
            n_rays = n_rays.at[0].add(
                jnp.sum((ray.tmax > 0).astype(jnp.float32)))
        if light_strategy == "all" and scene.n_lights > 0:
            hit, occ = isect.trace_pair(scene, ray, sray, ray_diff=rd)
            n_l = scene.light_L.shape[0]
            occ = occ.reshape(n_l, B)
            L = L + jnp.sum(jnp.where((cand & ~occ)[..., None],
                                      contrib, 0.0), axis=0)
        else:
            hit, occ = isect.trace_pair(scene, ray, sray,
                                        ignore_light=isect.nee_ignore_light(
                                            scene, l),
                                        ray_diff=rd)
            if scene.n_lights > 0:
                L = L + jnp.where((cand & ~occ)[:, None], contrib, 0.0)

    # NaN/Inf scrub (reference: integrator.cpp:295-316)
    L = jnp.where(jnp.isfinite(L), L, 0.0)
    L = jnp.maximum(L, 0.0)
    if count_rays == "full":
        return L, n_rays
    if count_rays:
        return L, n_rays[0] + n_rays[1]
    return L


# ---------------------------------------------------------------------------
# render driver (reference: SamplerIntegrator::Render, integrator.cpp:228)
# ---------------------------------------------------------------------------

def camera_pixel_spread(camera):
    """Angular size of one pixel at the image center (radians-ish), used
    as the texture-footprint cone spread.  0 for cameras without a
    raster_to_camera matrix (lens stacks -> finest mip level)."""
    rtc = getattr(camera, "raster_to_camera", None)
    if rtc is None:
        return 0.0
    rtc = np.asarray(rtc)

    def proj(x, y):
        p = rtc @ np.array([x, y, 0.0, 1.0])
        return p[:3] / p[3] if abs(p[3]) > 1e-12 else p[:3]

    p0, p1 = proj(0.0, 0.0), proj(1.0, 0.0)
    return float(np.linalg.norm(p1 - p0)
                 / max(np.linalg.norm(p0), 1e-6))


def camera_rays_for_pixels(camera, W, H, cfg, pixel_id, sample_idx,
                           generate_rays):
    """Build camera rays for a chunk of pixel ids at one sample index."""
    sidx = jnp.broadcast_to(jnp.asarray(sample_idx, jnp.uint32),
                            pixel_id.shape)
    valid = pixel_id < jnp.uint32(W * H)
    pid = jnp.where(valid, pixel_id, 0)
    ix = (pid % W).astype(jnp.float32)
    iy = (pid // W).astype(jnp.float32)
    jx = sample_dim(cfg, pid, sidx, DIM_PIXEL_X)
    jy = sample_dim(cfg, pid, sidx, DIM_PIXEL_Y)
    pfilm = jnp.stack([ix + jx, iy + jy], -1)
    ulens = jnp.stack(
        [sample_dim(cfg, pid, sidx, DIM_LENS_U),
         sample_dim(cfg, pid, sidx, DIM_LENS_V)], -1)
    utime = sample_dim(cfg, pid, sidx, DIM_TIME)
    ray, weight = generate_rays(camera, pfilm, ulens, utime,
                                width=W, height=H)
    weight = jnp.where(valid, weight, 0.0)
    # padded lanes: zero-length rays exit traversal immediately
    ray = ray.replace(tmax=jnp.where(valid, ray.tmax, -1.0))
    return ray, weight, pfilm, pid, sidx


def camera_ray_differentials(camera, W, H, cfg, pid, sidx,
                             generate_rays, spp):
    """Probe-ray camera differentials (reference camera.cpp:60-95 +
    the 1/sqrt(spp) ScaleDifferentials of integrator.cpp:286).

    Regenerates the camera ray at the SAME film sample shifted by one
    pixel in x and in y (same lens/time samples), then pulls the probe
    toward the base ray by 1/sqrt(spp).  Returns (rxo, rxd, ryo, ryd).
    """
    valid = pid < jnp.uint32(W * H)
    pid0 = jnp.where(valid, pid, 0)
    ix = (pid0 % W).astype(jnp.float32)
    iy = (pid0 // W).astype(jnp.float32)
    jx = sample_dim(cfg, pid0, sidx, DIM_PIXEL_X)
    jy = sample_dim(cfg, pid0, sidx, DIM_PIXEL_Y)
    ulens = jnp.stack(
        [sample_dim(cfg, pid0, sidx, DIM_LENS_U),
         sample_dim(cfg, pid0, sidx, DIM_LENS_V)], -1)
    utime = sample_dim(cfg, pid0, sidx, DIM_TIME)
    base = jnp.stack([ix + jx, iy + jy], -1)
    ray0, _ = generate_rays(camera, base, ulens, utime, width=W, height=H)
    rx, _ = generate_rays(camera, base + jnp.array([1.0, 0.0]),
                          ulens, utime, width=W, height=H)
    ry, _ = generate_rays(camera, base + jnp.array([0.0, 1.0]),
                          ulens, utime, width=W, height=H)
    s = 1.0 / jnp.sqrt(jnp.maximum(float(spp), 1.0))

    def lerp(a, b):
        return a + (b - a) * s

    return (lerp(ray0.o, rx.o), lerp(ray0.d, rx.d),
            lerp(ray0.o, ry.o), lerp(ray0.d, ry.d))


def render(scene, camera, film, cfg: SamplerConfig, spp, max_depth=5,
           generate_rays=None, trace_fn=None, progress=None,
           max_rays_per_pass=1 << 18, trace_kwargs=None,
           crop_window=None, max_sample_luminance=None,
           checkpoint_path=None, checkpoint_every=60.0, stats=None):
    """Full render: loops over (sample, pixel-tile) passes, jitting one
    fixed-shape pass (the analog of the reference's 16x16-tile ParallelFor2D,
    integrator.cpp:235-241 — tiles here are flat pixel-id chunks).

    Returns the accumulated Film.
    stats: optional utils.stats.Stats — records MEASURED work counters
    (closest-hit rays actually traced, shadow-ray candidates, path
    vertices shaded: the reference's STAT_COUNTER family, stats.cpp)
    when the trace function supports count_rays.
    """
    from pbrt_tpu.cameras import projective
    if generate_rays is None:
        generate_rays = projective.generate_rays
    if trace_fn is None:
        trace_fn = trace_paths
    trace_kwargs = dict(trace_kwargs or {})
    # per-pixel cone spread for mip-level selection (projective cameras
    # only; lens cameras fall back to the finest level)
    import inspect
    if ("tex_spread" in inspect.signature(trace_fn).parameters
            and "tex_spread" not in trace_kwargs):
        trace_kwargs["tex_spread"] = camera_pixel_spread(camera)
    # first-hit ray differentials -> EWA (projective cameras with image
    # textures bound); lens cameras keep the cone heuristic
    use_ray_diff = (
        "ray_diff" in inspect.signature(trace_fn).parameters
        and getattr(camera, "raster_to_camera", None) is not None
        and getattr(scene, "tex_images", None) is not None
        and scene.tex_type.shape[0] > 1)
    measure = (stats is not None
               and "count_rays" in inspect.signature(trace_fn).parameters)
    if measure:
        trace_kwargs["count_rays"] = "full"

    H, W = film.height, film.width
    if crop_window is not None and tuple(crop_window) != (0.0, 1.0, 0.0, 1.0):
        # render only pixels inside the crop (reference croppedPixelBounds,
        # film.cpp:58-66); the film keeps full resolution
        x0, x1, y0, y1 = crop_window
        xs = np.arange(int(np.ceil(x0 * W)), int(np.ceil(x1 * W)))
        ys = np.arange(int(np.ceil(y0 * H)), int(np.ceil(y1 * H)))
        gx, gy = np.meshgrid(xs, ys)
        pix_list = (gy * W + gx).reshape(-1).astype(np.uint32)
    else:
        pix_list = np.arange(H * W, dtype=np.uint32)
    n_pix = len(pix_list)
    chunk = min(n_pix, max_rays_per_pass)
    n_chunks = (n_pix + chunk - 1) // chunk

    # scene and camera ride as ARGUMENTS, not jit-captured constants:
    # the axon tunnel re-uploads captured constants on every dispatch
    # (measured ~5.4ms per 4.7MB per call) and ships them inside the
    # remote-compile payload; arguments are persistent device buffers
    @jax.jit
    def one_pass(scene, camera, film, pixel_ids, sample_idx,
                 aligned_base=None):
        ray, weight, pfilm, pid, sidx = camera_rays_for_pixels(
            camera, W, H, cfg, pixel_ids, sample_idx, generate_rays)
        tkw = dict(trace_kwargs)
        if use_ray_diff:
            tkw["ray_diff"] = camera_ray_differentials(
                camera, W, H, cfg, pid, sidx, generate_rays, spp)
        out = trace_fn(scene, ray, pid, sidx, cfg, max_depth=max_depth,
                       **tkw)
        L, nvec = out if measure else (out, jnp.zeros(4))
        if max_sample_luminance is not None:
            # clamp overly bright samples (reference maxSampleLuminance,
            # film.h:123-163) — scales the spectrum to the luminance cap
            from pbrt_tpu.core import spectrum as _spec
            y = _spec.luminance(L)
            scale = jnp.where(y > max_sample_luminance,
                              max_sample_luminance / jnp.maximum(y, 1e-9),
                              1.0)
            L = L * scale[:, None]
        return filmmod.add_samples(film, pfilm, L, weight,
                                   aligned_base=aligned_base), nvec

    all_ids = np.empty(n_chunks * chunk, dtype=np.uint32)
    all_ids[:n_pix] = pix_list
    all_ids[n_pix:] = 0xFFFFFFFF
    id_chunks = [jnp.asarray(all_ids[i * chunk:(i + 1) * chunk])
                 for i in range(n_chunks)]
    # chunks that are a full contiguous pixel range splat via the
    # dynamic-slice fast path (see film.add_samples aligned_base)
    contiguous = bool(np.all(pix_list == np.arange(n_pix,
                                                   dtype=np.uint32)))
    chunk_base = [jnp.uint32(i * chunk)
                  if contiguous and (i + 1) * chunk <= n_pix else None
                  for i in range(n_chunks)]
    start_spp = 0
    if checkpoint_path is not None:
        # resume is bit-identical to an uninterrupted render: samplers
        # are pure fns of (pixel, sample, dim), so replaying from
        # sample `start_spp` continues exactly the same stream
        from pbrt_tpu.film import checkpoint as ckpt
        import time as _time
        fp = ckpt.render_fingerprint(scene, cfg, spp, max_depth, W, H)
        film, start_spp = ckpt.load(checkpoint_path, film, fp)
        start_spp = min(start_spp, spp)
        last_save = _time.monotonic()
    done = start_spp * n_chunks
    total = spp * n_chunks
    nvec_acc = None
    for s in range(start_spp, spp):
        for ids, base in zip(id_chunks, chunk_base):
            film, nvec = one_pass(scene, camera, film, ids, jnp.uint32(s),
                                  aligned_base=base)
            if measure:
                nvec_acc = nvec if nvec_acc is None else nvec_acc + nvec
            done += 1
            if progress is not None:
                progress(done, total)
        if checkpoint_path is not None:
            now = _time.monotonic()
            if now - last_save >= checkpoint_every or s == spp - 1:
                jax.block_until_ready(film.weighted)
                ckpt.save(checkpoint_path, film, s + 1, fp)
                last_save = now
    if measure and nvec_acc is not None:
        nv = np.asarray(nvec_acc)
        stats.add("Integrator/Camera rays traced", nv[2])
        stats.add("Intersections/Regular ray intersection tests", nv[0])
        stats.add("Intersections/Shadow ray intersection tests", nv[1])
        stats.add("Integrator/Path vertices shaded", nv[3])
        stats.ratios["Integrator/Path length"] = (nv[3], max(nv[2], 1.0))
    return film
