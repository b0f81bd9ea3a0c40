"""Benchmark driver: prints ONE JSON line with rays/s on the flagship scene.

Metric (BASELINE.json): rays/s/chip forward on a killeroo-class scene at
64 spp; baseline target 2e9 rays/s/chip.  "Rays" counts every traced ray:
camera rays + bounce rays + NEE shadow rays, the same accounting as the
reference's "Integrator/Camera rays traced" stats family.

Runs on whatever backend JAX selects (the driver runs it on the TPU chip).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from pbrt_tpu.models import flagship
    from pbrt_tpu.integrators import path as pathmod
    from pbrt_tpu.samplers.samplers import SamplerConfig
    from pbrt_tpu.cameras import projective

    W = H = 256
    SPP = 32
    MAX_DEPTH = 5
    scene, cam_ctor = flagship.cornell(tessellate=True)
    camera = cam_ctor(W, H)
    cfg = SamplerConfig(kind="sobol", seed=0, spp=SPP)

    B = W * H  # rays per pass (one sample for every pixel)

    @jax.jit
    def one_pass(sample_idx):
        pixel_ids = jnp.arange(B, dtype=jnp.uint32)
        ray, weight, pfilm, pid, sidx = pathmod.camera_rays_for_pixels(
            camera, W, H, cfg, pixel_ids, sample_idx,
            projective.generate_rays)
        L = pathmod.trace_paths(scene, ray, pid, sidx, cfg,
                                max_depth=MAX_DEPTH)
        return jnp.sum(L * weight[:, None])

    # warmup / compile
    one_pass(jnp.uint32(0)).block_until_ready()

    t0 = time.time()
    acc = 0.0
    for s in range(SPP):
        acc += float(one_pass(jnp.uint32(s)))
    dt = time.time() - t0

    # ray accounting: the depth loop traces (max_depth+1) closest-hit rays
    # and max_depth shadow rays per camera sample (RR-terminated lanes still
    # occupy the lockstep batch, so this is the honest count of work the
    # machine executed).  Inputs vary per pass — the axon tunnel caches
    # identical executions, which would fake the timing otherwise.
    rays_per_sample = (MAX_DEPTH + 1) + MAX_DEPTH
    total_rays = B * SPP * rays_per_sample
    rays_per_s = total_rays / dt

    baseline = 2e9
    print(json.dumps({
        "metric": "rays_per_second_per_chip_fwd",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / baseline, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
