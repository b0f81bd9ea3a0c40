"""In-context ablation of the full bench pass (each variant is a whole
pass, so the axon gather-poisoning ~3.7ms dispatch floor is noise).

  full           : the real pass
  random sampler : sobol -> counter-hash RNG      (sampler cost)
  no NEE         : n_lights=0 scene               (NEE shading + shadow rays)
  lambert bsdf   : eval/pdf/sample = pure cosine  (BSDF dispatch cost)
  no makehit     : make_hit returns constants     (hit-record gathers)
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
from pbrt_tpu.ops import intersect as isect
from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import sampling

W = H = 256
SPP = 32
MAX_DEPTH = 5
scene, cam_ctor = flagship.cornell(tessellate=True)
camera = cam_ctor(W, H)
B = W * H
N_IT = 8


def timed(fn, n=N_IT):
    jax.block_until_ready(fn(jnp.uint32(99)))
    t0 = time.time()
    out = [fn(jnp.uint32(100 + s)) for s in range(n)]
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def make_pass(scn, cfg):
    @jax.jit
    def one_pass(sample_idx):
        pixel_ids = jnp.arange(B, dtype=jnp.uint32)
        ray, weight, pfilm, pid, sidx = pathmod.camera_rays_for_pixels(
            camera, W, H, cfg, pixel_ids, sample_idx,
            projective.generate_rays)
        L, n_rays = pathmod.trace_paths(scn, ray, pid, sidx, cfg,
                                        max_depth=MAX_DEPTH,
                                        count_rays=True)
        return jnp.sum(L * weight[:, None]), n_rays
    return one_pass

cfg_sobol = SamplerConfig(kind="sobol", seed=0, spp=SPP)
cfg_rand = SamplerConfig(kind="random", seed=0, spp=SPP)

t_full = timed(make_pass(scene, cfg_sobol))
print(f"full             : {t_full*1e3:8.2f} ms", flush=True)

t_rand = timed(make_pass(scene, cfg_rand))
print(f"random sampler   : {t_rand*1e3:8.2f} ms  (sampler delta "
      f"{(t_full-t_rand)*1e3:+.2f})", flush=True)

scene_nl = scene.replace(n_lights=0)
t_nonee = timed(make_pass(scene_nl, cfg_sobol))
print(f"no NEE           : {t_nonee*1e3:8.2f} ms  (NEE+shadow delta "
      f"{(t_full-t_nonee)*1e3:+.2f})", flush=True)

real_eval, real_pdf, real_sample = bsdf.eval_f, bsdf.pdf_f, bsdf.sample_f

def lam_eval(params, wo, wi):
    return params.kd * (1.0 / np.pi)

def lam_pdf(params, wo, wi):
    return bsdf.abs_cos_theta(wi) * (1.0 / np.pi)

def lam_sample(params, wo, u_lobe, u1, u2, u3=None):
    sgn = jnp.sign(wo[..., 2:3])
    wi = sampling.cosine_sample_hemisphere(u1, u2) * jnp.concatenate(
        [jnp.ones_like(sgn), jnp.ones_like(sgn), sgn], -1)
    f = lam_eval(params, wo, wi)
    pdf = lam_pdf(params, wo, wi)
    B_ = wo.shape[0]
    false = jnp.zeros((B_,), bool)
    return wi, f, pdf, false, false, jnp.ones((B_,))

with mock.patch.object(bsdf, "eval_f", lam_eval), \
     mock.patch.object(bsdf, "pdf_f", lam_pdf), \
     mock.patch.object(bsdf, "sample_f", lam_sample):
    t_lam = timed(make_pass(scene, cfg_sobol))
print(f"lambert bsdf     : {t_lam*1e3:8.2f} ms  (bsdf dispatch delta "
      f"{(t_full-t_lam)*1e3:+.2f})", flush=True)

real_make_hit = isect.make_hit

def fake_make_hit(scn, ray, t, prim, u, v, found):
    B_ = t.shape[0]
    up = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (B_, 3))
    return isect.Hit(valid=found, t=t, p=ray.o + t[:, None] * ray.d,
                     ng=up, ns=up, uv=jnp.stack([u, v], -1),
                     wo=-geom.normalize(ray.d), prim=prim,
                     material=jnp.where(found, 0, -1),
                     light=jnp.where(found, -1, -1),
                     instance=jnp.zeros_like(prim))

with mock.patch.object(isect, "make_hit", fake_make_hit):
    t_nmh = timed(make_pass(scene, cfg_sobol))
print(f"no makehit       : {t_nmh*1e3:8.2f} ms  (make_hit delta "
      f"{(t_full-t_nmh)*1e3:+.2f})", flush=True)

# gather_materials stub: constant matte record
real_gm = bsdf.gather_materials

def fake_gm(scn, midx, uv=None, p=None, u_mix=None):
    B_ = midx.shape[0]
    c31 = jnp.full((B_, 31), 0.5)
    z = jnp.zeros((B_,))
    return bsdf.MaterialParams(
        type=jnp.zeros_like(midx), kd=c31, ks=c31 * 0, kr=c31 * 0,
        kt=c31 * 0, rough_u=z, rough_v=z, eta=z + 1.5, eta_spec=c31,
        k_spec=c31 * 0, sigma=z, opacity=c31 * 0 + 1.0)

with mock.patch.object(bsdf, "gather_materials", fake_gm):
    t_ngm = timed(make_pass(scene, cfg_sobol))
print(f"no gather_mats   : {t_ngm*1e3:8.2f} ms  (gather delta "
      f"{(t_full-t_ngm)*1e3:+.2f})", flush=True)
