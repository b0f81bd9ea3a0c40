"""Weak-scaling measurement on the virtual 8-device CPU mesh.

Fixed rays PER DEVICE; the N-device sharded pass is compared against an
UNSHARDED single-program pass over the identical total ray count.  All
virtual devices share the same physical cores, so raw wall time grows
with N regardless of communication; the ratio

    efficiency(N) = t_unsharded(N x R rays) / t_sharded(N devices x R)

cancels the shared-core throughput and isolates what multi-chip actually
adds: partitioning, per-device dispatch, and the film psum collective
(the analog of BASELINE.md's >=85% multi-host scaling target, measurable
without N real chips).

Run: python scripts/scaling_bench.py [rays_per_device]
Writes docs/SCALING.md with the table + per-step comm-cost breakdown.
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
sys.path.insert(0, "/root/repo")

import time                                                    # noqa: E402
import numpy as np                                             # noqa: E402
import jax                                                     # noqa: E402

# the container's sitecustomize force-registers the axon TPU plugin and
# overrides JAX_PLATFORMS — must override back via jax.config (same as
# tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp                                        # noqa: E402

from pbrt_tpu.models import flagship                           # noqa: E402
from pbrt_tpu.film import film as filmmod                      # noqa: E402
from pbrt_tpu.integrators import path as pathint               # noqa: E402
from pbrt_tpu.parallel import mesh as pmesh                    # noqa: E402
from pbrt_tpu.samplers.samplers import SamplerConfig           # noqa: E402
from pbrt_tpu.cameras import projective                        # noqa: E402


def measure(rays_per_device=1 << 13, depths=(3,), reps=5):
    scene, cam_ctor = flagship.cornell(tessellate=False)
    W = H = 128
    camera = cam_ctor(W, H)
    cfg = SamplerConfig(kind="sobol", seed=0, spp=1)
    film = filmmod.make_film(W, H, "box")
    max_depth = depths[0]

    def timed(fn, *a, n=reps):
        jax.block_until_ready(fn(*a))
        t0 = time.time()
        for _ in range(n):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.time() - t0) / n

    rows = []
    for n_dev in (1, 2, 4, 8):
        B = rays_per_device * n_dev
        ids = jnp.asarray(np.arange(B, dtype=np.uint32) % (W * H))

        @jax.jit
        def unsharded(film, ids):
            ray, weight, pfilm, pid, sidx = pathint.camera_rays_for_pixels(
                camera, W, H, cfg, ids, jnp.uint32(0),
                projective.generate_rays)
            L = pathint.trace_paths(scene, ray, pid, sidx, cfg,
                                    max_depth=max_depth)
            return filmmod.add_samples(film, pfilm, L, weight)

        mesh = pmesh.make_mesh(n_dev)
        t_un = timed(unsharded, film, ids)

        def sharded(film, ids):
            return pmesh.render_sharded(
                scene, camera, film, cfg, spp=1, max_depth=max_depth,
                mesh=mesh, rays_per_device=rays_per_device)

        # render_sharded loops pixel chunks internally; time one pass of
        # exactly B rays by giving it a B-pixel film... simpler: time the
        # inner shard_map directly
        from functools import partial
        from jax.sharding import PartitionSpec as P
        from jax import shard_map
        axis = mesh.axis_names[0]

        @jax.jit
        @partial(shard_map, mesh=mesh, in_specs=(P(), P(axis), P()),
                 out_specs=P())
        def one_pass_sharded(film, pixel_ids, sample_idx):
            ray, weight, pfilm, pid, sidx = pathint.camera_rays_for_pixels(
                camera, W, H, cfg, pixel_ids, sample_idx,
                projective.generate_rays)
            L = pathint.trace_paths(scene, ray, pid, sidx, cfg,
                                    max_depth=max_depth)
            local = filmmod.add_samples(
                film.replace(weighted=jnp.zeros_like(film.weighted),
                             weight=jnp.zeros_like(film.weight),
                             raw=jnp.zeros_like(film.raw),
                             splat=jnp.zeros_like(film.splat)),
                pfilm, L, weight)
            return film.replace(
                weighted=film.weighted + jax.lax.psum(local.weighted, axis),
                weight=film.weight + jax.lax.psum(local.weight, axis),
                raw=film.raw + jax.lax.psum(local.raw, axis),
                splat=film.splat + jax.lax.psum(local.splat, axis))

        # film-psum-only step isolates the collective's cost
        @jax.jit
        @partial(shard_map, mesh=mesh, in_specs=(P(),), out_specs=P())
        def psum_only(film):
            return film.replace(
                weighted=jax.lax.psum(film.weighted, axis),
                weight=jax.lax.psum(film.weight, axis))

        with mesh:
            t_sh = timed(one_pass_sharded, film, ids, jnp.uint32(0))
            t_ps = timed(psum_only, film)
        eff = t_un / t_sh
        rows.append((n_dev, B, t_un * 1e3, t_sh * 1e3, t_ps * 1e3, eff))
        print(f"N={n_dev}: unsharded {t_un*1e3:7.1f} ms  sharded "
              f"{t_sh*1e3:7.1f} ms  film-psum {t_ps*1e3:6.2f} ms  "
              f"efficiency {eff:.3f}", flush=True)
    return rows


def write_doc(rows, rays_per_device):
    os.makedirs("docs", exist_ok=True)
    with open("docs/SCALING.md", "w") as f:
        f.write("# Multi-chip scaling (virtual 8-device CPU mesh)\n\n")
        f.write(
            "Weak scaling at fixed rays/device "
            f"({rays_per_device}); all virtual devices share the same "
            "physical cores, so efficiency is measured as\n"
            "`t_unsharded(N x R rays) / t_sharded(N devices x R)` — "
            "identical total work, so the ratio isolates partitioning + "
            "dispatch + the film `psum` (the collective that rides ICI "
            "on real hardware).  Generated by scripts/scaling_bench.py; "
            "asserted >= 0.85 at N=8 in tests/test_multihost.py.\n\n")
        f.write("| devices | rays | unsharded ms | sharded ms | "
                "film-psum ms | efficiency |\n|---|---|---|---|---|---|\n")
        for n, b, tu, ts, tp, e in rows:
            f.write(f"| {n} | {b} | {tu:.1f} | {ts:.1f} | {tp:.2f} | "
                    f"{e:.3f} |\n")
        f.write("\nThe film psum is the only cross-device traffic in a "
                "forward render (scene replicated, rays/film sharded — "
                "SURVEY.md §2.12); its absolute cost is the `film-psum` "
                "column.  On a real pod slice the same collective rides "
                "ICI at ~100x CPU-emulation bandwidth.\n")
    print("wrote docs/SCALING.md")


if __name__ == "__main__":
    rpd = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 13
    rows = measure(rpd)
    write_doc(rows, rpd)
