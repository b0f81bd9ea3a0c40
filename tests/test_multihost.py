"""Multi-host (multi-process) rendering test: 2 jax.distributed processes
on CPU render the flagship scene over a global mesh; the result must match
the single-process render (SURVEY §4 test item e)."""
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_render_matches_single():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "pbrt_tpu.parallel.multihost",
             "--coordinator", coord, "--num-processes", "2",
             "--process-id", str(pid), "--cpu-devices", "2",
             "--size", "16", "--spp", "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=390)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    m = re.search(r"MULTIHOST_OK mean=([\d.]+) sum=([\d.]+) devices=(\d+)",
                  outs[0] + outs[1])
    assert m, (outs[0][-1500:], outs[1][-1500:])
    mean_2proc = float(m.group(1))
    assert int(m.group(3)) == 4        # 2 procs x 2 devices: global mesh

    # single-process reference over the same 4-device mesh
    from pbrt_tpu.parallel.multihost import render_flagship_distributed
    img = np.asarray(render_flagship_distributed(16, 16, 2))
    assert abs(img.mean() - mean_2proc) < 1e-4, (img.mean(), mean_2proc)


def test_weak_scaling_efficiency():
    """Weak scaling on the 8-device virtual mesh: the N=8 sharded pass
    must reach >=85% of the unsharded same-total-work pass (BASELINE.md
    multi-host scaling target, measured without N real chips — all
    virtual devices share the host cores, so the ratio of equal-work
    runs isolates partitioning + dispatch + the film psum; see
    scripts/scaling_bench.py and docs/SCALING.md for the full curve)."""
    import time
    import jax
    import jax.numpy as jnp
    from functools import partial
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from pbrt_tpu.models import flagship
    from pbrt_tpu.film import film as filmmod
    from pbrt_tpu.integrators import path as pathint
    from pbrt_tpu.parallel import mesh as pmesh
    from pbrt_tpu.samplers.samplers import SamplerConfig
    from pbrt_tpu.cameras import projective

    scene, cam_ctor = flagship.cornell(tessellate=False)
    W = H = 64
    camera = cam_ctor(W, H)
    cfg = SamplerConfig(kind="sobol", seed=0, spp=1)
    film = filmmod.make_film(W, H, "box")
    B = 8 * 2048
    ids = jnp.asarray(np.arange(B, dtype=np.uint32) % (W * H))
    mesh = pmesh.make_mesh(8)
    axis = mesh.axis_names[0]

    @jax.jit
    def unsharded(film, ids):
        ray, weight, pfilm, pid, sidx = pathint.camera_rays_for_pixels(
            camera, W, H, cfg, ids, jnp.uint32(0),
            projective.generate_rays)
        L = pathint.trace_paths(scene, ray, pid, sidx, cfg, max_depth=3)
        return filmmod.add_samples(film, pfilm, L, weight)

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(P(), P(axis), P()),
             out_specs=P())
    def sharded(film, ids, s):
        ray, weight, pfilm, pid, sidx = pathint.camera_rays_for_pixels(
            camera, W, H, cfg, ids, s, projective.generate_rays)
        L = pathint.trace_paths(scene, ray, pid, sidx, cfg, max_depth=3)
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

    def timed(fn, *a, n=3):
        jax.block_until_ready(fn(*a))
        t0 = time.time()
        for _ in range(n):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.time() - t0) / n

    t_un = timed(unsharded, film, ids)
    with mesh:
        t_sh = timed(sharded, film, ids, jnp.uint32(0))
    eff = t_un / t_sh
    assert eff >= 0.85, f"weak-scaling efficiency {eff:.3f} < 0.85"
