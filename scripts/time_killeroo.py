"""Time killeroo-simple passes on the TPU (bench headline workload)."""
import sys
sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

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
print("tris(padded):", scene.dense_npad, "chunks:",
      scene.dense_cb.shape[0], "maxdepth:", MAX_DEPTH, flush=True)

import os
B = 1 << int(os.environ.get("KB_LOG2", "17"))   # pixel chunk per pass
N_PASSES = int(os.environ.get("KB_PASSES", "8"))


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
t0 = time.time()
out = one_pass(scene, camera, jnp.uint32(0), jnp.uint32(99))
jax.block_until_ready(out)
print(f"compile+first: {time.time()-t0:.1f}s n_rays={float(out[1]):.0f}",
      flush=True)
n = N_PASSES
t0 = time.time()
outs = [one_pass(scene, camera, jnp.uint32((s % 3) * B), jnp.uint32(s))
        for s in range(n)]
jax.block_until_ready(outs)
dt = (time.time() - t0) / n
nr = float(sum(float(o[1]) for o in outs)) / n
print(f"pass({B} px): {dt*1e3:.2f} ms  rays/s: {nr/dt/1e6:.2f}M")
