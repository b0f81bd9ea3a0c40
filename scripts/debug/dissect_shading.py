"""What's inside the 33ms non-intersect time? sampler vs bsdf vs lights."""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.models import flagship
from pbrt_tpu.integrators import path as pathmod
from pbrt_tpu.samplers.samplers import SamplerConfig, sample_dim
from pbrt_tpu.materials import bsdf
from pbrt_tpu.core import geometry as geom
from pbrt_tpu.lights import lights, distrib
from pbrt_tpu.ops import intersect as isect

W = H = 256
scene, cam_ctor = flagship.cornell(tessellate=True)
cfg = SamplerConfig(kind="sobol", seed=0, spp=32)
B = W * H
N_IT = 8
N_DIMS_PER_PASS = 5 + 6 * 9      # camera + 6 bounces x 9 dims

def timed(fn, args_list):
    jax.block_until_ready(fn(*args_list[0]))
    t0 = time.time()
    out = [fn(*a) for a in args_list[1:N_IT + 1]]
    jax.block_until_ready(out)
    return (time.time() - t0) / N_IT

pids = jnp.arange(B, dtype=jnp.uint32)
args_s = [(jnp.uint32(100 + s),) for s in range(N_IT + 2)]

@jax.jit
def sampler_all_dims(sidx):
    s = jnp.zeros(B)
    sidxb = jnp.broadcast_to(sidx, (B,))
    for dim in range(N_DIMS_PER_PASS):
        s = s + sample_dim(cfg, pids, sidxb, dim)
    return s.sum()

t = timed(sampler_all_dims, args_s)
print(f"sampler {N_DIMS_PER_PASS} dims : {t*1e3:8.2f} ms", flush=True)

rng = np.random.default_rng(0)
def dirs(seed, n):
    r = np.random.default_rng(seed)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(d)

mat_args = []
for s in range(N_IT + 2):
    r = np.random.default_rng(s)
    midx = jnp.asarray(r.integers(0, scene.mat_type.shape[0], B), jnp.int32)
    uv = jnp.asarray(r.uniform(size=(B, 2)), jnp.float32)
    p = jnp.asarray(r.uniform(size=(B, 3)), jnp.float32)
    wo = dirs(s * 3 + 1, B)
    wo = wo.at[:, 2].set(jnp.abs(wo[:, 2]) + 0.05)
    wi = dirs(s * 3 + 2, B)
    us = [jnp.asarray(r.uniform(size=B), jnp.float32) for _ in range(3)]
    mat_args.append((midx, uv, p, wo, wi, *us))

@jax.jit
def gather_only(midx, uv, p, wo, wi, u0, u1, u2):
    m = bsdf.gather_materials(scene, midx, uv=uv, p=p, u_mix=u0)
    return m.kd.sum() + m.rough_u.sum()

print(f"gather_materials : {timed(gather_only, mat_args)*1e3:8.2f} ms  "
      f"(x6 per pass)", flush=True)

@jax.jit
def evalpdff(midx, uv, p, wo, wi, u0, u1, u2):
    m = bsdf.gather_materials(scene, midx, uv=uv, p=p, u_mix=u0)
    f = bsdf.eval_f(m, wo, wi)
    pdf = bsdf.pdf_f(m, wo, wi)
    return f.sum() + pdf.sum()

print(f"gather+eval+pdf  : {timed(evalpdff, mat_args)*1e3:8.2f} ms  "
      f"(x6 per pass, NEE)", flush=True)

@jax.jit
def samplef(midx, uv, p, wo, wi, u0, u1, u2):
    m = bsdf.gather_materials(scene, midx, uv=uv, p=p, u_mix=u0)
    wi_l, f, pdf, sp, tr, ef = bsdf.sample_f(m, wo, u0, u1, u2)
    return f.sum() + pdf.sum() + wi_l.sum()

print(f"gather+sample_f  : {timed(samplef, mat_args)*1e3:8.2f} ms  "
      f"(x6 per pass)", flush=True)

light_args = []
for s in range(N_IT + 2):
    r = np.random.default_rng(s + 99)
    p = jnp.asarray(r.uniform(0, 5, size=(B, 3)), jnp.float32)
    ns = dirs(s * 7 + 3, B)
    us = [jnp.asarray(r.uniform(size=B), jnp.float32) for _ in range(3)]
    light_args.append((p, ns, *us))

@jax.jit
def nee_lights(p, ns, u0, u1, u2):
    l, sel = distrib.select_light(scene, "uniform", p, u0)
    wi, li, pdf_l, dist, delta = lights.sample_li(scene, l, p, ns, u1, u2)
    return wi.sum() + li.sum() + pdf_l.sum() + dist.sum()

print(f"light sample_li  : {timed(nee_lights, light_args)*1e3:8.2f} ms  "
      f"(x6 per pass)", flush=True)
