"""Does packing all material columns into ONE gathered table (or a
one-hot matmul) recover the ~11ms/pass gather_materials cost?"""
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
from pbrt_tpu.scene import ir

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


def make_pass(scn):
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

t_full = timed(make_pass(scene))
print(f"baseline         : {t_full*1e3:8.2f} ms", flush=True)

# ---- packed single-gather variant -----------------------------------
S31 = [("kd", "mat_kd"), ("ks", "mat_ks"), ("kr", "mat_kr"),
       ("kt", "mat_kt"), ("eta_spec", "mat_eta_spec"),
       ("k_spec", "mat_k_spec"), ("opacity", "mat_opacity")]
SC = [("rough_u", "mat_rough_u"), ("rough_v", "mat_rough_v"),
      ("eta", "mat_eta"), ("sigma", "mat_sigma")]
cols = [np.asarray(getattr(scene, a)) for _, a in S31]
scal = [np.asarray(getattr(scene, a))[:, None] for _, a in SC]
remap = np.asarray(scene.mat_remap_rough).astype(np.float32)[:, None]
mtype = np.asarray(scene.mat_type).astype(np.float32)[:, None]
packed_np = np.concatenate(cols + scal + [remap, mtype], -1)
packed = jnp.asarray(packed_np, jnp.float32)
print("packed cols:", packed.shape, flush=True)

real_gm = bsdf.gather_materials

def packed_gm(scn, material_idx, uv=None, p=None, u_mix=None):
    material_idx = bsdf.resolve_mix(scn, material_idx, u_mix, p)
    m = jnp.clip(material_idx, 0, scn.mat_type.shape[0] - 1)
    row = packed[m]                            # ONE [B,C] gather
    o = 0
    f31 = {}
    for name, _ in S31:
        f31[name] = row[:, o:o + 31]; o += 31
    fsc = {}
    for name, _ in SC:
        fsc[name] = row[:, o]; o += 1
    remap_f = row[:, o] > 0.5; o += 1
    mtype_f = row[:, o].astype(jnp.int32); o += 1
    au = jnp.where(remap_f, bsdf.roughness_to_alpha(fsc["rough_u"]),
                   fsc["rough_u"])
    av = jnp.where(remap_f, bsdf.roughness_to_alpha(fsc["rough_v"]),
                   fsc["rough_v"])
    au = jnp.where(fsc["rough_u"] > 0, jnp.maximum(au, 1e-3), 0.0)
    av = jnp.where(fsc["rough_v"] > 0, jnp.maximum(av, 1e-3), 0.0)
    op = f31["opacity"]
    return bsdf.MaterialParams(
        type=jnp.where(material_idx >= 0, mtype_f, ir.MAT_NONE),
        kd=f31["kd"] * op, ks=f31["ks"] * op, kr=f31["kr"] * op,
        kt=f31["kt"] * op, rough_u=au, rough_v=av, eta=fsc["eta"],
        eta_spec=f31["eta_spec"], k_spec=f31["k_spec"],
        sigma=fsc["sigma"], opacity=op)

with mock.patch.object(bsdf, "gather_materials", packed_gm):
    t_packed = timed(make_pass(scene))
print(f"packed 1-gather  : {t_packed*1e3:8.2f} ms  ({(t_full-t_packed)*1e3:+.2f})",
      flush=True)

# ---- one-hot matmul variant ------------------------------------------
M = packed.shape[0]

def onehot_gm(scn, material_idx, uv=None, p=None, u_mix=None):
    material_idx = bsdf.resolve_mix(scn, material_idx, u_mix, p)
    m = jnp.clip(material_idx, 0, scn.mat_type.shape[0] - 1)
    oh = (m[:, None] == jnp.arange(M, dtype=jnp.int32)[None, :]
          ).astype(jnp.float32)
    row = oh @ packed                           # [B,M] @ [M,C] on MXU
    o = 0
    f31 = {}
    for name, _ in S31:
        f31[name] = row[:, o:o + 31]; o += 31
    fsc = {}
    for name, _ in SC:
        fsc[name] = row[:, o]; o += 1
    remap_f = row[:, o] > 0.5; o += 1
    mtype_f = jnp.round(row[:, o]).astype(jnp.int32); o += 1
    au = jnp.where(remap_f, bsdf.roughness_to_alpha(fsc["rough_u"]),
                   fsc["rough_u"])
    av = jnp.where(remap_f, bsdf.roughness_to_alpha(fsc["rough_v"]),
                   fsc["rough_v"])
    au = jnp.where(fsc["rough_u"] > 0, jnp.maximum(au, 1e-3), 0.0)
    av = jnp.where(fsc["rough_v"] > 0, jnp.maximum(av, 1e-3), 0.0)
    op = f31["opacity"]
    return bsdf.MaterialParams(
        type=jnp.where(material_idx >= 0, mtype_f, ir.MAT_NONE),
        kd=f31["kd"] * op, ks=f31["ks"] * op, kr=f31["kr"] * op,
        kt=f31["kt"] * op, rough_u=au, rough_v=av, eta=fsc["eta"],
        eta_spec=f31["eta_spec"], k_spec=f31["k_spec"],
        sigma=fsc["sigma"], opacity=op)

with mock.patch.object(bsdf, "gather_materials", onehot_gm):
    t_oh = timed(make_pass(scene))
print(f"one-hot matmul   : {t_oh*1e3:8.2f} ms  ({(t_full-t_oh)*1e3:+.2f})",
      flush=True)
