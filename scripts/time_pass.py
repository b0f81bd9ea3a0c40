"""Time one bench-shaped pass (Cornell 256x256, depth 5) on the TPU."""
import sys
sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp

from pbrt_tpu.models import flagship
from pbrt_tpu.integrators import path as pathmod
from pbrt_tpu.samplers.samplers import SamplerConfig
from pbrt_tpu.cameras import projective

W = H = 256
MAX_DEPTH = 5
scene, cam_ctor = flagship.cornell(tessellate=True)
camera = cam_ctor(W, H)
B = W * H
cfg = SamplerConfig(kind="sobol", seed=0, spp=32)


@jax.jit
def one_pass(scene, camera, sample_idx):
    pixel_ids = jnp.arange(B, dtype=jnp.uint32)
    ray, weight, pfilm, pid, sidx = pathmod.camera_rays_for_pixels(
        camera, W, H, cfg, pixel_ids, sample_idx,
        projective.generate_rays)
    L, n_rays = pathmod.trace_paths(scene, ray, pid, sidx, cfg,
                                    max_depth=MAX_DEPTH, count_rays=True)
    return jnp.sum(L * weight[:, None]), n_rays


t0 = time.time()
out = one_pass(scene, camera, jnp.uint32(99))
jax.block_until_ready(out)
print(f"compile+first: {time.time()-t0:.1f}s  n_rays={float(out[1]):.0f}",
      flush=True)
n = 10
t0 = time.time()
outs = [one_pass(scene, camera, jnp.uint32(100 + s)) for s in range(n)]
jax.block_until_ready(outs)
dt = (time.time() - t0) / n
print(f"pass: {dt*1e3:.2f} ms   rays/s: {float(out[1])/dt/1e6:.2f}M",
      flush=True)
