"""Ambient-occlusion integrator (reference: src/integrators/ao.cpp)."""

from __future__ import annotations

import jax.numpy as jnp

from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import sampling
from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.ops import intersect as isect
from pbrt_tpu.samplers.samplers import sample_dim
from pbrt_tpu.integrators.path import _bdim


def make_trace_ao(cos_sample=True, n_samples=1):
    def trace(scene, ray, pixel_id, sample_idx, cfg, max_depth=0, **kw):
        hit = isect.intersect_full(scene, ray)
        B = ray.o.shape[0]
        occ_sum = jnp.zeros(B)
        ss, ts = geom.coordinate_system(hit.ns)
        # orient frame toward wo like the reference (ao.cpp:68)
        n = jnp.where(geom.dot(hit.ns, hit.wo)[:, None] < 0, -hit.ns, hit.ns)
        for k in range(n_samples):
            u1 = sample_dim(cfg, pixel_id, sample_idx, _bdim(k, 1))
            u2 = sample_dim(cfg, pixel_id, sample_idx, _bdim(k, 2))
            if cos_sample:
                w_local = sampling.cosine_sample_hemisphere(u1, u2)
                pdf = sampling.cosine_hemisphere_pdf(w_local[..., 2])
            else:
                w_local = sampling.uniform_sample_hemisphere(u1, u2)
                pdf = jnp.full(B, 1.0 / (2 * jnp.pi))
            w = geom.frame_to_world(ss, ts, n, w_local)
            sray = isect.spawn_ray(
                hit.p, hit.ng, w, ray.wavelength,
                tmax=jnp.where(hit.valid, scene.world_radius * 2.0, -1.0))
            free = ~isect.occluded(scene, sray)
            cos_t = jnp.maximum(geom.dot(w, n), 0.0)
            occ_sum = occ_sum + jnp.where(
                hit.valid & free & (pdf > 0), cos_t / jnp.maximum(
                    pdf * jnp.pi, 1e-9), 0.0)
        v = occ_sum / n_samples
        return jnp.broadcast_to(v[:, None], (B, spec.N_SPECTRAL_SAMPLES))
    return trace
