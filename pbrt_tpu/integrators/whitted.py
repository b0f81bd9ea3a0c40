"""Whitted integrator (reference: src/integrators/whitted.cpp):
direct lighting + recursion only along specular reflection/transmission."""

from __future__ import annotations

import jax.numpy as jnp

from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.materials import bsdf
from pbrt_tpu.lights import lights
from pbrt_tpu.ops import intersect as isect
from pbrt_tpu.samplers.samplers import sample_dim
from pbrt_tpu.integrators.path import _bdim


def make_trace_whitted():
    def trace(scene, ray, pixel_id, sample_idx, cfg, max_depth=5, **kw):
        B = ray.o.shape[0]
        NS = spec.N_SPECTRAL_SAMPLES
        L = jnp.zeros((B, NS))
        beta = jnp.ones((B, NS))
        alive = jnp.ones(B, bool)
        n_lights = max(scene.n_lights, 1)
        for bounce in range(max_depth + 1):
            hit = isect.intersect_full(scene, ray)
            le = lights.area_le(scene, hit.light, hit.ng, hit.wo)
            L = L + jnp.where((alive & hit.valid)[:, None], beta * le, 0.0)
            if scene.has_infinite:
                env = lights.env_le(scene, geom.normalize(ray.d))
                L = L + jnp.where((alive & ~hit.valid)[:, None],
                                  beta * env, 0.0)
            alive = alive & hit.valid
            if bounce == max_depth:
                break
            mat = bsdf.gather_materials(scene, hit.material, uv=hit.uv, p=hit.p)
            ss, ts = bsdf.shading_frame(scene, hit)
            wo_l = geom.world_to_frame(ss, ts, hit.ns, hit.wo)
            if scene.n_lights > 0:
                u_sel = sample_dim(cfg, pixel_id, sample_idx, _bdim(bounce, 0))
                u1 = sample_dim(cfg, pixel_id, sample_idx, _bdim(bounce, 1))
                u2 = sample_dim(cfg, pixel_id, sample_idx, _bdim(bounce, 2))
                l = jnp.minimum((u_sel * n_lights).astype(jnp.int32),
                                n_lights - 1)
                wi, li, pdf_l, dist, _ = lights.sample_li(
                    scene, l, hit.p, hit.ns, u1, u2)
                wi_l = geom.world_to_frame(ss, ts, hit.ns, wi)
                f = bsdf.eval_f(mat, wo_l, wi_l) * \
                    geom.absdot(wi, hit.ns)[:, None]
                cand = alive & (pdf_l > 1e-12) & ~spec.is_black(li) \
                    & ~spec.is_black(f)
                sray = isect.spawn_shadow_ray(hit.p, hit.ng, wi, dist,
                                              cand, ray.wavelength, time=ray.time)
                occ = isect.occluded(scene, sray,
                                      ignore_light=isect.nee_ignore_light(scene, l))
                L = L + jnp.where(
                    (cand & ~occ)[:, None],
                    beta * f * li / pdf_l[:, None] * n_lights, 0.0)
            # specular continuation only (whitted.cpp:80-92)
            u_lobe = sample_dim(cfg, pixel_id, sample_idx, _bdim(bounce, 3))
            ub1 = sample_dim(cfg, pixel_id, sample_idx, _bdim(bounce, 4))
            ub2 = sample_dim(cfg, pixel_id, sample_idx, _bdim(bounce, 5))
            wi_l, f, pdf, is_spec, _, _ = bsdf.sample_f(
                mat, wo_l, u_lobe, ub1, ub2)
            wi_w = geom.frame_to_world(ss, ts, hit.ns, wi_l)
            alive = alive & is_spec & (pdf > 1e-12) & ~spec.is_black(f)
            beta = jnp.where(
                alive[:, None],
                beta * f * (geom.absdot(wi_w, hit.ns)
                            / jnp.maximum(pdf, 1e-12))[:, None], beta)
            nray = isect.spawn_ray(hit.p, hit.ng, wi_w, ray.wavelength)
            ray = nray.replace(tmax=jnp.where(alive, nray.tmax, -1.0))
        L = jnp.where(jnp.isfinite(L), L, 0.0)
        return jnp.maximum(L, 0.0)
    return trace
