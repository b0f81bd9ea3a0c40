"""Volumetric path integrator (reference: src/integrators/volpath.cpp).

Same wavefront skeleton as integrators/path.py with per-segment medium
sampling: each bounce samples a free-flight distance; lanes that scatter
in the medium do Henyey-Greenstein NEE + phase-function direction
sampling, lanes that reach surfaces do the standard BSDF path — both
evaluated under masks and merged (volpath.cpp:55-190).  Shadow rays are
attenuated by transmittance (VisibilityTester::Tr, light.cpp:63) — closed
form for homogeneous media, ratio tracking for grids.

v1 scope: one global scene medium (fog / smoke volume with its own grid
bounds) — per-primitive MediumInterface nesting is a later round.
"""

from __future__ import annotations

import jax.numpy as jnp

from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import sampling
from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.materials import bsdf
from pbrt_tpu.lights import lights
from pbrt_tpu.media import media as med_mod
from pbrt_tpu.ops import intersect as isect
from pbrt_tpu.samplers.samplers import sample_dim
from pbrt_tpu.integrators.path import _bdim, _sss_event


def make_trace_volpath_medium(medium: med_mod.MediumData):
    """trace_fn closure over a MediumData pytree."""

    def trace(scene, ray, pixel_id, sample_idx, cfg, max_depth=5,
              rr_threshold=1.0, **kw):
        B = ray.o.shape[0]
        NS = spec.N_SPECTRAL_SAMPLES
        L = jnp.zeros((B, NS))
        beta = jnp.ones((B, NS))
        alive = jnp.ones(B, bool)
        specular = jnp.ones(B, bool)
        prev_pdf = jnp.ones(B)
        prev_p = ray.o
        n_lights = max(scene.n_lights, 1)
        # per-primitive MediumInterface: each lane tracks its current
        # medium index (homogeneous table in SceneData); the global
        # medium path handles the single fog/grid volume case
        per_prim = getattr(scene, "has_prim_media", False)
        if per_prim:
            cur_med = jnp.full(B, scene.camera_medium, jnp.int32)
            n_med = scene.med_sigma_a.shape[0]

        for bounce in range(max_depth + 1):
            hit = isect.intersect_full(scene, ray)
            dnorm = geom.normalize(ray.d)
            t_seg = jnp.where(hit.valid, hit.t,
                              jnp.minimum(ray.tmax, 2 * scene.world_radius))
            t_seg = jnp.maximum(t_seg, 0.0)

            # ---- medium free flight over the segment ----
            salt = 0x9000 + bounce * 256
            if per_prim:
                from pbrt_tpu.ops import fetch
                mk = jnp.clip(cur_med, 0, n_med - 1)
                in_any = (cur_med >= 0)[:, None]
                sa_k, ss_k, g_k = fetch.fetch_many(
                    [scene.med_sigma_a, scene.med_sigma_s, scene.med_g], mk)
                lane_sa = jnp.where(in_any, sa_k, 0.0)
                lane_ss = jnp.where(in_any, ss_k, 0.0)
                g_eff = jnp.where(cur_med >= 0, g_k, 0.0)
                is_grid_lane = (cur_med >= 0) & scene.med_is_grid[mk]
                t_m, in_medium, w_med = med_mod.sample_distance_lanes(
                    lane_sa, lane_ss,
                    jnp.where(is_grid_lane, 0.0, t_seg)
                    if getattr(scene, "has_grid_media", False) else t_seg,
                    pixel_id, sample_idx, salt)
                if getattr(scene, "has_grid_media", False):
                    # bound grid media: per-lane delta tracking
                    # (grid.cpp:62-88) against the lane's own grid
                    w2m_b = fetch.fetch_many(
                        [scene.med_w2m.reshape(n_med, 16)],
                        mk)[0].reshape(B, 4, 4)
                    st_b = jnp.max(lane_sa + lane_ss, -1)
                    t_g, hit_g = med_mod.sample_distance_grid_lanes(
                        scene.med_density, scene.med_dims, w2m_b,
                        scene.med_inv_maxd[mk], st_b, ray.o, dnorm,
                        t_seg, mk, pixel_id, sample_idx, salt + 8)
                    # delta-tracking weight: sigma_s/sigma_t at an
                    # event, 1 at escape (grid.cpp:82-88)
                    w_g = jnp.where(
                        hit_g[:, None],
                        lane_ss / jnp.maximum(st_b, 1e-9)[:, None],
                        jnp.ones((B, 1)))
                    t_m = jnp.where(is_grid_lane, t_g, t_m)
                    in_medium = jnp.where(is_grid_lane, hit_g, in_medium)
                    w_med = jnp.where(is_grid_lane[:, None], w_g, w_med)
            else:
                g_eff = medium.g
                t_m, in_medium, w_med = med_mod.sample_distance(
                    medium, ray.o, dnorm, t_seg, pixel_id, sample_idx,
                    salt)
            in_medium = in_medium & alive
            beta = beta * jnp.where(alive[:, None], w_med, 1.0)

            # ---- emitted radiance only if the segment reached the surface
            le = lights.area_le(scene, hit.light, hit.ng, hit.wo)
            if bounce == 0:
                w_hit = jnp.ones(B)
            else:
                pdf_light = lights.pdf_li_area(
                    scene, hit.light, prev_p, dnorm, hit.t, hit.ng) / n_lights
                w_hit = jnp.where(specular, 1.0, sampling.power_heuristic(
                    1.0, prev_pdf, 1.0, pdf_light))
            L = L + jnp.where((alive & ~in_medium & hit.valid)[:, None],
                              beta * le * w_hit[:, None], 0.0)
            if scene.has_infinite:
                env = lights.env_le(scene, dnorm)
                if bounce == 0:
                    w_env = jnp.ones(B)
                else:
                    w_env = jnp.where(specular, 1.0, sampling.power_heuristic(
                        1.0, prev_pdf, 1.0,
                        lights.pdf_li_infinite(scene, dnorm) / n_lights))
                L = L + jnp.where((alive & ~in_medium & ~hit.valid)[:, None],
                                  beta * env * w_env[:, None], 0.0)

            alive = alive & (hit.valid | in_medium)
            if bounce == max_depth:
                break

            p_med = ray.o + t_m[:, None] * dnorm
            p_vert = jnp.where(in_medium[:, None], p_med, hit.p)

            # ---- NEE from the vertex (phase fn or BSDF) ----
            mat = bsdf.gather_materials(scene, hit.material, uv=hit.uv, p=hit.p)
            ss, ts = bsdf.shading_frame(scene, hit)
            # BSSRDF probe relocation for surface lanes (path.py
            # _sss_event; volpath.cpp handles subsurface identically)
            if getattr(scene, "has_sss", False):
                hit, mat, beta, alive_s, _ = _sss_event(
                    scene, hit, mat, beta, alive & ~in_medium & hit.valid,
                    ss, ts, pixel_id, sample_idx, cfg, sample_dim, bounce,
                    ray.wavelength, jnp.zeros((), jnp.float32), False)
                alive = jnp.where(in_medium, alive, alive_s)
                ss, ts = bsdf.shading_frame(scene, hit)
                p_vert = jnp.where(in_medium[:, None], p_med, hit.p)
            wo_l = geom.world_to_frame(ss, ts, hit.ns, hit.wo)
            if scene.n_lights > 0:
                u_sel = sample_dim(cfg, pixel_id, sample_idx,
                                   _bdim(bounce, 0))
                u1 = sample_dim(cfg, pixel_id, sample_idx, _bdim(bounce, 1))
                u2 = sample_dim(cfg, pixel_id, sample_idx, _bdim(bounce, 2))
                l = jnp.minimum((u_sel * n_lights).astype(jnp.int32),
                                n_lights - 1)
                wi, li, pdf_l, dist, delta_l = lights.sample_li(
                    scene, l, p_vert, hit.ns, u1, u2)
                # surface throughput
                wi_l = geom.world_to_frame(ss, ts, hit.ns, wi)
                f_surf = bsdf.eval_f(mat, wo_l, wi_l) * \
                    geom.absdot(wi, hit.ns)[:, None]
                pdf_b_surf = bsdf.pdf_f(mat, wo_l, wi_l)
                # medium throughput: phase function value (pdf == value)
                cos_wi = geom.dot(-dnorm, wi)
                ph = med_mod.hg_p(g_eff, cos_wi)
                f = jnp.where(in_medium[:, None],
                              jnp.broadcast_to(ph[:, None], (B, NS)), f_surf)
                pdf_b = jnp.where(in_medium, ph, pdf_b_surf)
                cand = alive & (pdf_l > 1e-12) & ~spec.is_black(li) \
                    & ~spec.is_black(f)
                sp_org = jnp.where(in_medium[:, None], p_med, hit.p)
                sp_n = jnp.where(in_medium[:, None], wi, hit.ng)
                if per_prim:
                    # walk medium interfaces along the shadow segment
                    # (Scene::IntersectTr, scene.cpp:57-81): per-
                    # sub-segment Tr of the medium actually occupying
                    # it, switching at material-less boundary prims
                    scale = jnp.maximum(jnp.max(jnp.abs(sp_org), -1), 1.0)
                    eps = (1e-4 * scale)[:, None]
                    off = jnp.where(geom.dot(wi, sp_n)[:, None] >= 0,
                                    eps, -eps) * sp_n
                    blocked, optical, tr_ratio = isect.intersect_tr_walk(
                        scene, sp_org + off, wi,
                        (dist - geom.dot(off, wi)) * 0.999, cand,
                        cur_med, ray.wavelength, time=ray.time,
                        ignore_light=isect.nee_ignore_light(scene, l),
                        pixel_id=pixel_id, sample_idx=sample_idx,
                        dim_salt=salt + 64)
                    occ = blocked
                    tr = jnp.exp(-optical) * tr_ratio[:, None]
                else:
                    sray = isect.spawn_shadow_ray(
                        sp_org, sp_n, wi, dist, cand, ray.wavelength,
                        time=ray.time)
                    occ = isect.occluded(
                        scene, sray,
                        ignore_light=isect.nee_ignore_light(scene, l))
                    sh_dist = jnp.where(jnp.isfinite(dist), dist,
                                        2 * scene.world_radius)
                    tr = med_mod.transmittance(
                        medium, sp_org, wi, sh_dist,
                        pixel_id, sample_idx, salt + 128)
                w_l = jnp.where(delta_l, 1.0, sampling.power_heuristic(
                    1.0, pdf_l, 1.0, pdf_b))
                contrib = beta * f * li * tr * \
                    (w_l / jnp.maximum(pdf_l, 1e-12) * n_lights)[:, None]
                L = L + jnp.where((cand & ~occ)[:, None], contrib, 0.0)

            # ---- continuation direction ----
            u_lobe = sample_dim(cfg, pixel_id, sample_idx, _bdim(bounce, 3))
            ub1 = sample_dim(cfg, pixel_id, sample_idx, _bdim(bounce, 4))
            ub2 = sample_dim(cfg, pixel_id, sample_idx, _bdim(bounce, 5))
            # surface BSDF sample
            wi_l, f_s, pdf_s, is_spec, transmitted, eta_fac = bsdf.sample_f(
                mat, wo_l, u_lobe, ub1, ub2)
            wi_surf = geom.frame_to_world(ss, ts, hit.ns, wi_l)
            cos_t = geom.absdot(wi_surf, hit.ns)
            ok_s = (pdf_s > 1e-12) & ~spec.is_black(f_s)
            beta_s = f_s * (cos_t / jnp.maximum(pdf_s, 1e-12))[:, None]
            # medium phase sample around the propagation direction
            # (wo = -dnorm at a medium vertex; pdf == value => beta *= 1)
            wi_med, ph_pdf = med_mod.hg_sample(g_eff, -dnorm, ub1, ub2)
            wi_new = jnp.where(in_medium[:, None], wi_med, wi_surf)
            ok = jnp.where(in_medium, True, ok_s)
            beta_mul = jnp.where(in_medium[:, None], 1.0, beta_s)
            alive = alive & ok
            beta = jnp.where(alive[:, None], beta * beta_mul, beta)
            specular = jnp.where(in_medium, False, is_spec)
            prev_pdf = jnp.where(in_medium, ph_pdf, pdf_s)
            prev_p = p_vert
            org_n = jnp.where(in_medium[:, None], wi_new, hit.ng)
            nray = isect.spawn_ray(p_vert, org_n, wi_new, ray.wavelength,
                                   time=ray.time)
            ray = nray.replace(tmax=jnp.where(alive, nray.tmax, -1.0))
            if per_prim:
                # crossing a transmissive surface switches the lane's
                # medium to the primitive's inside/outside binding
                pm = jnp.clip(hit.prim, 0,
                              scene.prim_medium_in.shape[0] - 1)
                entering = geom.dot(wi_new, hit.ng) < 0
                # one fused [B,2] gather instead of two serial [B] ones
                pmio = jnp.stack([scene.prim_medium_in,
                                  scene.prim_medium_out], 1)[pm]
                new_med = jnp.where(entering, pmio[:, 0], pmio[:, 1])
                crossed = alive & ~in_medium & hit.valid & transmitted
                cur_med = jnp.where(crossed, new_med, cur_med)

            # ---- RR on beta (volpath.cpp:208) ----
            if bounce > 3:
                import jax
                rr_max = jnp.max(beta, -1)
                u_rr = sample_dim(cfg, pixel_id, sample_idx,
                                  _bdim(bounce, 6))
                q = jnp.clip(1.0 - jax.lax.stop_gradient(rr_max), 0.05, 0.99)
                apply_rr = rr_max < rr_threshold
                kill = apply_rr & (u_rr < q)
                alive = alive & ~kill
                scale = jnp.where(apply_rr & alive, 1.0 / (1.0 - q), 1.0)
                beta = beta * scale[:, None]
                ray = ray.replace(tmax=jnp.where(alive, ray.tmax, -1.0))

        L = jnp.where(jnp.isfinite(L), L, 0.0)
        return jnp.maximum(L, 0.0)

    return trace


def make_trace_volpath(job):
    """Build the scene medium from the parsed job's MakeNamedMedium data
    (reference dispatch: api.cpp:699-745)."""
    medium = build_medium_from_job(job)
    return make_trace_volpath_medium(medium)


def build_medium_from_job(job):
    import numpy as np
    from pbrt_tpu.core.transform import Transform
    skip = set(getattr(job, "prim_media_names", ()))
    for name, m in job.media.items():
        if name in skip:
            continue            # handled per-lane via MediumInterface
        ps = m["params"]
        # named measured presets give the defaults, explicit sigma_a /
        # sigma_s override them (api.cpp MakeMedium:699-745)
        default_a, default_s = 1.0, 1.0
        preset = ps.find_one_string("preset", "")
        if preset:
            from pbrt_tpu.media.presets import (
                get_medium_scattering_properties)
            got = get_medium_scattering_properties(preset)
            if got is not None:
                default_a, default_s = got
        sig_a = ps.find_one_spectrum("sigma_a", default_a)
        sig_s = ps.find_one_spectrum("sigma_s", default_s)
        scale = ps.find_one_float("scale", 1.0)
        g = ps.find_one_float("g", 0.0)
        if m["type"] in ("heterogeneous", "grid"):
            nx = ps.find_one_int("nx", 1)
            ny = ps.find_one_int("ny", 1)
            nz = ps.find_one_int("nz", 1)
            dvals = ps.find_floats("density")
            dens = (np.asarray(dvals).reshape(nz, ny, nx)
                    if dvals is not None else np.ones((1, 1, 1)))
            p0 = ps.find_one_point("p0", [0, 0, 0])
            p1 = ps.find_one_point("p1", [1, 1, 1])
            m2w = np.eye(4)
            m2w[:3, 3] = p0
            for i in range(3):
                m2w[i, i] = p1[i] - p0[i]
            return med_mod.make_grid(sig_a * scale, sig_s * scale, g,
                                     dens, m2w)
        return med_mod.make_homogeneous(sig_a * scale, sig_s * scale, g)
    return med_mod.no_medium()
