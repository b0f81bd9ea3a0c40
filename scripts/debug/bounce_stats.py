"""Capture REAL per-bounce queue stats from a killeroo pass via a
trace_pair spy (tracers stay inside one jit trace)."""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from pbrt_tpu.models import flagship
from pbrt_tpu.integrators import path as pathmod
from pbrt_tpu.samplers.samplers import SamplerConfig
from pbrt_tpu.cameras import projective
from pbrt_tpu.ops import intersect as isect
from pbrt_tpu.ops import pallas_intersect as pdense

job, cam_ctor = flagship.killeroo()
scene = jax.device_put(job.scene)
W = H = 700
camera = jax.device_put(cam_ctor(W, H))
cfg = SamplerConfig(kind="sobol", seed=0, spp=8)
B = 1 << 17
CAP = []
orig_pair = isect.trace_pair

def stats_for(both_ray, amask):
    o, d, tmax = both_ray.o, both_ray.d, both_ray.tmax
    t_init = tmax.astype(jnp.float32)
    Bb = o.shape[0]
    key = isect._coherence_key(scene, o, d, t_init)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Bb,), 0)
    packed, o0, o1, o2, d0, d1, d2, ts = jax.lax.sort(
        ((key << 18) | lane, o[:, 0], o[:, 1], o[:, 2],
         d[:, 0], d[:, 1], d[:, 2], t_init), num_keys=1)
    r16s = pdense.ray_vectors(jnp.stack([o0, o1, o2], -1),
                              jnp.stack([d0, d1, d2], -1),
                              scene.dense_center)
    T = pdense.RAY_TILE
    nt = Bb // T
    r16t = r16s.reshape(nt, T, 16)
    tmt = ts.reshape(nt, T)
    cl, na, nl = pdense._tile_chunk_lists(r16t, tmt, scene.dense_cb)
    groups = (na + pdense.PICK - 1) // pdense.PICK
    live = (ts > 0).sum()
    return (live, na.sum(), na.max(), groups.sum(),
            (na > 0).sum(), jnp.sort(na)[-16:])

def spy(scene_, nray, sray, ignore_light=None):
    if sray is not None:
        both = jax.tree.map(lambda a, b: jnp.concatenate([a, b], 0),
                            nray, sray)
        CAP.append(stats_for(both, None))
    return orig_pair(scene_, nray, sray, ignore_light)

isect.trace_pair = spy

@jax.jit
def diag(scene, camera, pixel0, sample_idx):
    CAP.clear()
    pixel_ids = pixel0 + jnp.arange(B, dtype=jnp.uint32)
    ray, weight, pfilm, pid, sidx = pathmod.camera_rays_for_pixels(
        camera, W, H, cfg, pixel_ids, sample_idx,
        projective.generate_rays)
    L = pathmod.trace_paths(scene, ray, pid, sidx, cfg, max_depth=5)
    return jnp.sum(L * weight[:, None]), tuple(CAP)

out, caps = diag(scene, camera, jnp.uint32(0), jnp.uint32(99))
jax.block_until_ready(out)
print(f"tiles/launch: {2*B//pdense.RAY_TILE}, chunks C=260, PICK={pdense.PICK}")
for i, (live, nsum, nmax, gsum, nact, top) in enumerate(caps):
    print(f"bounce {i}: live {int(live):7d}  sum(na) {int(nsum):6d}  "
          f"max(na) {int(nmax):3d}  groups {int(gsum):6d}  "
          f"active-tiles {int(nact):4d}  top16na {np.asarray(top)}")
