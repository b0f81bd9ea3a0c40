"""Capture a device trace of killeroo passes and summarize op costs."""
import sys
sys.path.insert(0, "/root/repo")
import glob
import gzip
import json
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

from pbrt_tpu.models import flagship
from pbrt_tpu.integrators import path as pathmod
from pbrt_tpu.samplers.samplers import SamplerConfig
from pbrt_tpu.cameras import projective

job, cam_ctor = flagship.killeroo()
scene = job.scene
W = H = 700
camera = cam_ctor(W, H)
cfg = SamplerConfig(kind="sobol", seed=0, spp=8)
MAX_DEPTH = int(job.integrator_params.get("maxdepth", 5))
B = 1 << 17


@jax.jit
def one_pass(scene, camera, pixel0, sample_idx):
    pixel_ids = pixel0 + jnp.arange(B, dtype=jnp.uint32)
    ray, weight, pfilm, pid, sidx = pathmod.camera_rays_for_pixels(
        camera, W, H, cfg, pixel_ids, sample_idx,
        projective.generate_rays)
    L, n_rays = pathmod.trace_paths(scene, ray, pid, sidx, cfg,
                                    max_depth=MAX_DEPTH, count_rays=True)
    return jnp.sum(L * weight[:, None]), n_rays


scene = jax.device_put(scene)
camera = jax.device_put(camera)
jax.block_until_ready(one_pass(scene, camera, jnp.uint32(0), jnp.uint32(999)))

TRACE = "/tmp/kprof"
with jax.profiler.trace(TRACE):
    for k in range(3):
        r = one_pass(scene, camera, jnp.uint32(k * B % (W * H)),
                     jnp.uint32(k))
    jax.block_until_ready(r)

# summarize from the trace proto (xplane)
files = sorted(glob.glob(TRACE + "/**/*.trace.json.gz", recursive=True))
if not files:
    files = sorted(glob.glob(TRACE + "/**/*.json.gz", recursive=True))
print("trace files:", files)
agg = defaultdict(lambda: [0.0, 0])
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pid_name = ev.get("pid")
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e3  # ms
        agg[name][0] += dur
        agg[name][1] += 1
rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
tot = sum(v[0] for _, v in rows)
print(f"total event time {tot:.1f} ms over 3 passes")
for name, (ms, n) in rows[:40]:
    print(f"{ms/3:8.3f} ms/pass  n={n//3:5d}  {name[:110]}")
