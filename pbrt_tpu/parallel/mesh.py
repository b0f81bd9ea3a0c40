"""Device-mesh parallel rendering (replaces the reference's pthread tile
pool, src/core/parallel.cpp:184-322).

Design (BASELINE north star): rays + film tiles are sharded over a 1-D
`rays` mesh axis; the scene (BVH, primitive SoA, material/light tables) is
replicated.  The per-device work is the same wavefront pass as single-chip;
film contributions are combined with a `psum` — the collective rides ICI.
Counter-based samplers make results bit-identical to the single-chip render
regardless of sharding (the analog of pbrt's deterministic per-tile seeds).

For multi-host, `jax.distributed` + the same mesh spanning hosts gives
DCN-crossing data parallelism; gradients of scene parameters are psum'd by
the same collective path (see integrators/diff.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from pbrt_tpu.film import film as filmmod
from pbrt_tpu.integrators import path as pathmod
from pbrt_tpu.samplers.samplers import SamplerConfig


def make_mesh(n_devices=None, axis="rays"):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def render_sharded(scene, camera, film, cfg: SamplerConfig, spp,
                   max_depth=5, mesh=None, generate_rays=None,
                   trace_fn=None, progress=None, rays_per_device=1 << 16):
    """Data-parallel render: pixel chunks sharded over the mesh axis.

    Each device traces its shard of the pixel-id chunk and scatter-adds
    into a film replica; replicas are psum'd so every device holds the
    full film (the reference's MergeFilmTile under mutex, film.cpp:124,
    becomes one collective).
    """
    from pbrt_tpu.cameras import projective
    if generate_rays is None:
        generate_rays = projective.generate_rays
    if trace_fn is None:
        trace_fn = pathmod.trace_paths
    if mesh is None:
        mesh = make_mesh()
    axis = mesh.axis_names[0]
    D = mesh.devices.size
    H, W = film.height, film.width
    n_pix = H * W
    chunk = min(n_pix, rays_per_device * D)
    chunk = ((chunk + D - 1) // D) * D
    n_chunks = (n_pix + chunk - 1) // chunk

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(axis), P()),
             out_specs=P())
    def one_pass_sharded(film, pixel_ids, sample_idx):
        ray, weight, pfilm, pid, sidx = pathmod.camera_rays_for_pixels(
            camera, W, H, cfg, pixel_ids, sample_idx, generate_rays)
        L = trace_fn(scene, ray, pid, sidx, cfg, max_depth=max_depth)
        local = filmmod.add_samples(
            film.replace(weighted=jnp.zeros_like(film.weighted),
                         weight=jnp.zeros_like(film.weight),
                         raw=jnp.zeros_like(film.raw),
                         splat=jnp.zeros_like(film.splat)),
            pfilm, L, weight)
        # merge device-local films (MergeFilmTile -> psum over ICI)
        return film.replace(
            weighted=film.weighted + jax.lax.psum(local.weighted, axis),
            weight=film.weight + jax.lax.psum(local.weight, axis),
            raw=film.raw + jax.lax.psum(local.raw, axis),
            splat=film.splat + jax.lax.psum(local.splat, axis))

    # scene/camera as explicit args would need shard_map re-plumbing;
    # the mesh path dispatches once per (sample, chunk) with the same
    # executable — acceptable until multi-chip hardware is available
    one_pass = jax.jit(one_pass_sharded)
    all_ids = np.arange(n_chunks * chunk, dtype=np.uint32)
    all_ids[n_pix:] = 0xFFFFFFFF
    done = 0
    with mesh:
        for s in range(spp):
            for c in range(n_chunks):
                ids = jnp.asarray(all_ids[c * chunk:(c + 1) * chunk])
                film = one_pass(film, ids, jnp.uint32(s))
                done += 1
                if progress:
                    progress(done, spp * n_chunks)
    return film
