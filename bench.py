"""Benchmark driver: prints ONE JSON line with rays/s on the benchmark scenes.

Headline metric (BASELINE.json): rays/s/chip forward on the reference's
own killeroo-simple scene (two killeroo instances, ~66k triangles,
sphere area light, plastic+matte, 700x700); baseline target 2e9
rays/s/chip.  The cornell bench (tessellated flagship twin of
scenes/cornell_bench.pbrt) rides along as a secondary number comparable
with rounds 1+.

"Rays" counts rays the machine actually traced: live closest-hit lanes
+ candidate NEE shadow lanes per bounce (RR-terminated / escaped lanes
drop out of the sparse intersect queue and are NOT counted — the same
accounting as the reference's "Integrator/Camera rays traced" + shadow
ray stats).

Each timed dispatch uses a distinct (pixel-chunk, sample) range so the
axon tunnel's identical-execution cache cannot fake the timing; all
dispatches are issued async and synced once, measuring pipelined chip
throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time


def bench_scene(scene, camera, W, H, cfg, max_depth, n_passes, B,
                pathmod, projective, jnp, jax):
    @jax.jit
    def one_pass(scene, camera, pixel0, sample_idx):
        pixel_ids = pixel0 + jnp.arange(B, dtype=jnp.uint32)
        ray, weight, pfilm, pid, sidx = pathmod.camera_rays_for_pixels(
            camera, W, H, cfg, pixel_ids, sample_idx,
            projective.generate_rays)
        L, n_rays = pathmod.trace_paths(scene, ray, pid, sidx, cfg,
                                        max_depth=max_depth,
                                        count_rays=True)
        return jnp.sum(L * weight[:, None]), n_rays

    scene = jax.device_put(scene)
    camera = jax.device_put(camera)
    n_chunks = max((W * H) // B, 1)
    # warmup / compile on a sample index the timed loop never uses
    jax.block_until_ready(one_pass(scene, camera, jnp.uint32(0),
                                   jnp.uint32(1 << 20)))
    args = [(jnp.uint32((k % n_chunks) * B), jnp.uint32(k))
            for k in range(n_passes)]
    t0 = time.time()
    results = [one_pass(scene, camera, p0, s) for p0, s in args]
    jax.block_until_ready(results)
    dt = time.time() - t0
    total_rays = sum(float(n) for _, n in results)
    return total_rays / dt


def main():
    import jax
    import jax.numpy as jnp
    from pbrt_tpu.models import flagship
    from pbrt_tpu.integrators import path as pathmod
    from pbrt_tpu.samplers.samplers import SamplerConfig
    from pbrt_tpu.cameras import projective

    out = {}

    # --- cornell bench (secondary; comparable with round-1 numbers) ---
    W = H = 256
    scene, cam_ctor = flagship.cornell(tessellate=True)
    camera = cam_ctor(W, H)
    cfg = SamplerConfig(kind="sobol", seed=0, spp=32)
    cornell_rps = bench_scene(scene, camera, W, H, cfg, 5, 24, W * H,
                              pathmod, projective, jnp, jax)
    out["cornell_rays_per_s"] = round(cornell_rps, 1)

    # --- killeroo-simple (headline; BASELINE.json config #1 scene) ----
    killeroo_rps = None
    if os.path.exists(flagship.KILLEROO_SCENE):
        job, kcam_ctor = flagship.killeroo()
        kscene = job.scene
        KW = KH = 700
        kcam = kcam_ctor(KW, KH)
        kcfg = SamplerConfig(kind="sobol", seed=0, spp=8)
        kdepth = int(job.integrator_params.get("maxdepth", 5))
        killeroo_rps = bench_scene(kscene, kcam, KW, KH, kcfg, kdepth,
                                   16, 1 << 17, pathmod, projective,
                                   jnp, jax)
        out["killeroo_rays_per_s"] = round(killeroo_rps, 1)

    headline = killeroo_rps if killeroo_rps is not None else cornell_rps
    baseline = 2e9
    out.update({
        "metric": "rays_per_second_per_chip_fwd",
        "value": round(headline, 1),
        "unit": "rays/s",
        "vs_baseline": round(headline / baseline, 4),
    })
    print(json.dumps(out))
    return 0


def _watchdog(seconds=1500):
    """Fail fast instead of hanging forever if the device tunnel is
    unreachable (a dead first-dispatch blocks indefinitely otherwise)."""
    import threading

    def bail():
        print("bench: no device response within watchdog window",
              file=sys.stderr, flush=True)
        os._exit(2)

    t = threading.Timer(seconds, bail)
    t.daemon = True
    t.start()
    return t


if __name__ == "__main__":
    _wd = _watchdog()
    sys.exit(main())
