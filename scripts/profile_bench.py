"""Decompose bench.py time: tunnel dispatch overhead vs intersect vs shading."""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.models import flagship
from pbrt_tpu.integrators import path as pathmod
from pbrt_tpu.samplers.samplers import SamplerConfig
from pbrt_tpu.cameras import projective
from pbrt_tpu.ops import intersect as isect
from pbrt_tpu.core import geometry as geom

W = H = 256
SPP = 32
MAX_DEPTH = 5
scene, cam_ctor = flagship.cornell(tessellate=True)
camera = cam_ctor(W, H)
cfg = SamplerConfig(kind="sobol", seed=0, spp=SPP)
B = W * H


@jax.jit
def one_pass(sample_idx):
    pixel_ids = jnp.arange(B, dtype=jnp.uint32)
    ray, weight, pfilm, pid, sidx = pathmod.camera_rays_for_pixels(
        camera, W, H, cfg, pixel_ids, sample_idx, projective.generate_rays)
    L = pathmod.trace_paths(scene, ray, pid, sidx, cfg, max_depth=MAX_DEPTH)
    return jnp.sum(L * weight[:, None])


@jax.jit
def all_passes():
    def body(s, acc):
        return acc + one_pass(s.astype(jnp.uint32))
    return jax.lax.fori_loop(0, SPP, body, 0.0)


@jax.jit
def intersect_only(sample_idx):
    # 11 sequential dependent intersects on camera rays (mimic per-pass ray mix)
    pixel_ids = jnp.arange(B, dtype=jnp.uint32)
    ray, weight, pfilm, pid, sidx = pathmod.camera_rays_for_pixels(
        camera, W, H, cfg, pixel_ids, sample_idx, projective.generate_rays)
    acc = 0.0
    r = ray
    for k in range(11):
        t, prim, u, v, found = isect.intersect(scene, r)
        acc = acc + jnp.sum(t * (prim + 1)) + jnp.sum(u + v)
        # vary the ray a bit to keep passes distinct & dependent
        r = geom.Ray(o=r.o + 1e-4 * r.d, d=r.d, tmax=r.tmax,
                     wavelength=r.wavelength, time=r.time)
    return acc


def timeit(fn, args_list, label):
    fn(*args_list[0]).block_until_ready()
    t0 = time.time()
    for a in args_list:
        float(fn(*a))
    dt = time.time() - t0
    print(f"{label}: {dt:.3f}s total, {dt/len(args_list)*1000:.1f} ms/call")
    return dt


print("backend:", jax.default_backend())

args32 = [(jnp.uint32(s),) for s in range(SPP)]
dt_pass = timeit(one_pass, args32, "one_pass x32 (bench as-is)")
dt_isect = timeit(intersect_only, args32, "intersect_only x32 (11 isect/pass)")
dt_all = timeit(all_passes, [()], "all_passes x1 (fori_loop inside jit)")

total_rays = B * SPP * 11
print(f"bench-style rays/s: {total_rays/dt_pass/1e6:.2f} M")
print(f"single-dispatch rays/s: {total_rays/dt_all/1e6:.2f} M")
print(f"intersect share (rough): {dt_isect/dt_pass*100:.0f}%")
