"""Metadata integrator (fork feature: src/integrators/metadata.{h,cpp}).

Renders first-hit scene metadata instead of radiance: depth (camera-space
distance), materialId, meshId (instanceId), or world coordinates, encoded
into the spectral channels exactly like the reference (metadata.cpp:54-128
stores the value in a constant spectrum; coordinates use 3 channels).
Ray weight is forced to 1 (reference IgnoreRayWeight, integrator.cpp:320).
"""

from __future__ import annotations

import jax.numpy as jnp

from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.ops import intersect as isect


def make_trace_metadata(strategy="depth"):
    def trace(scene, ray, pixel_id, sample_idx, cfg, max_depth=0, **kw):
        hit = isect.intersect_full(scene, ray)
        B = ray.o.shape[0]
        NS = spec.N_SPECTRAL_SAMPLES
        if strategy == "depth":
            v = jnp.where(hit.valid, hit.t, 0.0)
            out = jnp.broadcast_to(v[:, None], (B, NS))
        elif strategy in ("material", "materialId"):
            v = jnp.where(hit.valid, hit.material + 1, 0).astype(jnp.float32)
            out = jnp.broadcast_to(v[:, None], (B, NS))
        elif strategy in ("mesh", "meshId", "instance"):
            v = jnp.where(hit.valid, hit.instance, 0).astype(jnp.float32)
            out = jnp.broadcast_to(v[:, None], (B, NS))
        elif strategy in ("coordinates", "world"):
            out = jnp.zeros((B, NS))
            p = jnp.where(hit.valid[:, None], hit.p, 0.0)
            out = out.at[:, 0].set(p[:, 0]).at[:, 1].set(p[:, 1]) \
                     .at[:, 2].set(p[:, 2])
        else:
            raise ValueError(f"unknown metadata strategy {strategy}")
        return out
    return trace
