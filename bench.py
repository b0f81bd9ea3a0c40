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

Exit codes (VERDICT r4 item 1c — make infra-dead distinguishable from
kernel-hang):
  0 = bench ran, JSON line printed
  2 = device responded to the health probe but the bench run hung or
      crashed twice — a real kernel/code problem
  3 = device/tunnel unresponsive (health probe failed twice) — infra,
      not code; the JSON line is absent by design

Structure: running ``python bench.py`` starts an ORCHESTRATOR that
(1) health-probes the device with a trivial dispatch in a subprocess
under a 60s watchdog, retrying once, and (2) runs the actual bench in a
fresh subprocess under a 1500s watchdog, retrying once if the device is
still alive after a failure.  ``--probe`` / ``--run`` are the internal
child modes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

PROBE_TIMEOUT = 60
RUN_TIMEOUT = 1500


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


def run_bench():
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


def run_probe():
    """Trivial device dispatch: proves the device/tunnel is alive.

    Deliberately tiny (no scene, no Pallas): if THIS hangs, the problem
    is infrastructure, not the renderer."""
    import jax
    import jax.numpy as jnp
    x = jnp.ones((8, 8), jnp.float32)
    y = jax.jit(lambda a: (a @ a).sum())(x)
    jax.block_until_ready(y)
    print(f"bench: probe ok on {jax.devices()[0].platform}:"
          f"{jax.devices()[0].id} (sum={float(y)})", file=sys.stderr,
          flush=True)
    return 0


def _child(mode, timeout):
    """Run `python bench.py --<mode>` in a fresh process. Returns rc
    (124 = timeout). stdout/stderr inherit so the JSON line reaches the
    driver directly."""
    try:
        p = subprocess.run([sys.executable, os.path.abspath(__file__),
                            f"--{mode}"], timeout=timeout)
        return p.returncode
    except subprocess.TimeoutExpired:
        return 124


def probe_until_alive(attempts=4, waits=(20, 60, 120)):
    """Probe with growing backoff: the axon tunnel can take minutes to
    recover after idling (observed repeatedly: alive at gate start,
    dead after an 18-min CPU-only pytest phase, alive again minutes
    later) — a single 20s retry misses that window."""
    rc = _child("probe", PROBE_TIMEOUT)
    for i in range(attempts - 1):
        if rc == 0:
            return 0
        w = waits[min(i, len(waits) - 1)]
        print(f"bench: health probe failed (rc={rc}); retry "
              f"{i + 1}/{attempts - 1} in {w}s", file=sys.stderr,
              flush=True)
        time.sleep(w)
        rc = _child("probe", PROBE_TIMEOUT)
    return rc


def orchestrate():
    # 1. device health probe (60s watchdog, backoff retries)
    rc = probe_until_alive()
    if rc != 0:
        print("bench: DEVICE/TUNNEL UNRESPONSIVE — a trivial 8x8 "
              f"matmul dispatch failed {4} times over ~5 min "
              f"(rc={rc}). This is an infrastructure failure, not a "
              "renderer bug. rc=3.", file=sys.stderr, flush=True)
        return 3

    # 2. the real bench (1500s watchdog)
    rc = _child("run", RUN_TIMEOUT)
    if rc == 0:
        return 0

    # bench failed: is the device still alive?
    print(f"bench: run failed (rc={rc}); re-probing device",
          file=sys.stderr, flush=True)
    if probe_until_alive() != 0:
        print("bench: device/tunnel died during the run — infra "
              "failure. rc=3.", file=sys.stderr, flush=True)
        return 3

    # device alive → genuine bench failure; one fresh-process retry
    print("bench: device alive; retrying bench once in a fresh process",
          file=sys.stderr, flush=True)
    rc = _child("run", RUN_TIMEOUT)
    if rc == 0:
        return 0
    print(f"bench: bench failed twice with a responsive device "
          f"(rc={rc}) — kernel hang or crash. rc=2.", file=sys.stderr,
          flush=True)
    return 2


if __name__ == "__main__":
    if "--probe" in sys.argv:
        sys.exit(run_probe())
    elif "--run" in sys.argv:
        sys.exit(run_bench())
    else:
        sys.exit(orchestrate())
