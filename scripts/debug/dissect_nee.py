"""What's inside the ~28ms/pass of NEE shading? (run on TPU)

Whole-pass ablations (floor-safe):
  full        : real pass
  cheap light : sample_li stubbed to a fixed point-light
  no MIS pdf  : power-heuristic weight forced to 1 (drops pdf_f in NEE)
  lambert NEE : NEE's eval_f stubbed to kd/pi (keeps sample_f real)
"""
import sys
sys.path.insert(0, "/root/repo")
import time
from unittest import mock

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.models import flagship
from pbrt_tpu.integrators import path as pathmod
from pbrt_tpu.samplers.samplers import SamplerConfig
from pbrt_tpu.cameras import projective
from pbrt_tpu.materials import bsdf
from pbrt_tpu.lights import lights
from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import sampling

W = H = 256
MAX_DEPTH = 5
scene, cam_ctor = flagship.cornell(tessellate=True)
camera = cam_ctor(W, H)
B = W * H
cfg = SamplerConfig(kind="sobol", seed=0, spp=32)


def timed(fn, n=8):
    jax.block_until_ready(fn(jnp.uint32(99)))
    t0 = time.time()
    out = [fn(jnp.uint32(100 + s)) for s in range(n)]
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def make_pass():
    @jax.jit
    def one_pass(sample_idx):
        pixel_ids = jnp.arange(B, dtype=jnp.uint32)
        ray, weight, pfilm, pid, sidx = pathmod.camera_rays_for_pixels(
            camera, W, H, cfg, pixel_ids, sample_idx,
            projective.generate_rays)
        L, n_rays = pathmod.trace_paths(scene, ray, pid, sidx, cfg,
                                        max_depth=MAX_DEPTH,
                                        count_rays=True)
        return jnp.sum(L * weight[:, None]), n_rays
    return one_pass

t_full = timed(make_pass())
print(f"full         : {t_full*1e3:8.2f} ms", flush=True)

real_sample_li = lights.sample_li

def cheap_sample_li(scn, l, p, ns, u1, u2):
    lp = jnp.asarray([2.5, 4.9, 2.5])
    d = lp[None, :] - p
    dist = geom.length(d)
    wi = d / jnp.maximum(dist, 1e-9)[:, None]
    li = jnp.full((p.shape[0], 31), 5.0) / jnp.maximum(dist * dist,
                                                       1e-9)[:, None]
    pdf = jnp.ones(p.shape[0])
    return wi, li, pdf, dist, jnp.ones(p.shape[0], bool)

with mock.patch.object(lights, "sample_li", cheap_sample_li):
    t = timed(make_pass())
print(f"cheap light  : {t*1e3:8.2f} ms  (light sampling delta "
      f"{(t_full-t)*1e3:+.2f})", flush=True)

real_ph = sampling.power_heuristic

def one_w(nf, fp, ng, gp):
    return jnp.ones_like(fp)

with mock.patch.object(sampling, "power_heuristic", one_w):
    t = timed(make_pass())
print(f"no MIS pdf   : {t*1e3:8.2f} ms  (heuristic+pdf_f delta "
      f"{(t_full-t)*1e3:+.2f})", flush=True)

real_eval = bsdf.eval_f
calls = {"n": 0}

def lam_first_eval(params, wo, wi):
    # stub only the NEE call (first eval per bounce); sample_f's
    # internal call goes through the real path
    calls["n"] += 1
    if calls["n"] % 2 == 1:
        return params.kd * (1.0 / np.pi)
    return real_eval(params, wo, wi)

with mock.patch.object(bsdf, "eval_f", lam_first_eval):
    t = timed(make_pass())
print(f"lambert NEE  : {t*1e3:8.2f} ms  (NEE eval_f delta "
      f"{(t_full-t)*1e3:+.2f})", flush=True)
