import sys; sys.path.insert(0, "/root/repo")
import time
import jax
import jax.numpy as jnp
from pbrt_tpu.models import flagship
from pbrt_tpu.integrators import path as pathmod
from pbrt_tpu.samplers.samplers import SamplerConfig
from pbrt_tpu.cameras import projective

job, cam_ctor = flagship.killeroo()
scene = jax.device_put(job.scene)
W = H = 700
camera = jax.device_put(cam_ctor(W, H))
cfg = SamplerConfig(kind="sobol", seed=0, spp=8)
B = 1 << 17

@jax.jit
def one_pass(scene, camera, pixel0, sample_idx):
    pixel_ids = pixel0 + jnp.arange(B, dtype=jnp.uint32)
    ray, weight, pfilm, pid, sidx = pathmod.camera_rays_for_pixels(
        camera, W, H, cfg, pixel_ids, sample_idx,
        projective.generate_rays)
    L, n_rays = pathmod.trace_paths(scene, ray, pid, sidx, cfg,
                                    max_depth=5, count_rays=True)
    return jnp.sum(L * weight[:, None]), n_rays

jax.block_until_ready(one_pass(scene, camera, jnp.uint32(0), jnp.uint32(1)))
with jax.profiler.trace("/tmp/jaxtrace"):
    out = [one_pass(scene, camera, jnp.uint32(0), jnp.uint32(2 + s))
           for s in range(3)]
    jax.block_until_ready(out)
print("trace written")
