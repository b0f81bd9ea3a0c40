"""Multi-host rendering entry points (SURVEY §2.12: JAX collectives over
ICI within a slice, DCN across hosts).

Each host runs the same program under `jax.distributed`; the global mesh
spans every host's devices, rays/film shard globally, the scene replicates,
and the film psum crosses hosts over DCN.  Counter-based samplers keep the
result bit-identical to a single-host render.

Usage (per host):

    python -m pbrt_tpu.parallel.multihost --coordinator host0:9999 \
        --num-processes 2 --process-id <i>

which renders the flagship scene and (on process 0) reports checksums;
tests/test_multihost.py drives a 2-process CPU version of exactly this.
"""

from __future__ import annotations

import argparse
import sys


def init_distributed(coordinator, num_processes, process_id,
                     local_device_count=None):
    import jax
    if local_device_count is not None:
        # CPU multi-process testing: give each process its own devices
        jax.config.update("jax_platforms", "cpu")
        import os
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count="
              f"{local_device_count}")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax


def render_flagship_distributed(width=32, height=32, spp=2, max_depth=3):
    """Render the flagship scene over the global (multi-host) mesh."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from pbrt_tpu.models import flagship
    from pbrt_tpu.film import film as filmmod
    from pbrt_tpu.parallel import mesh as pmesh
    from pbrt_tpu.samplers.samplers import SamplerConfig
    from jax.sharding import Mesh

    scene, cam_ctor = flagship.cornell(tessellate=False)
    camera = cam_ctor(width, height)
    devices = np.asarray(jax.devices())       # global device list
    mesh = Mesh(devices, ("rays",))
    film = filmmod.make_film(width, height, "box")
    cfg = SamplerConfig("sobol", 0, spp)
    film = pmesh.render_sharded(scene, camera, film, cfg, spp=spp,
                                max_depth=max_depth, mesh=mesh,
                                rays_per_device=max(
                                    64, width * height // devices.size))
    return filmmod.develop_spectral(film)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="pbrt_tpu.multihost")
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--cpu-devices", type=int, default=None,
                    help="force N virtual CPU devices per process (testing)")
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--spp", type=int, default=2)
    args = ap.parse_args(argv)
    jax = init_distributed(args.coordinator, args.num_processes,
                           args.process_id, args.cpu_devices)
    import numpy as np
    img = render_flagship_distributed(args.size, args.size, args.spp)
    img_local = np.asarray(img)
    if args.process_id == 0:
        print(f"MULTIHOST_OK mean={img_local.mean():.6f} "
              f"sum={img_local.sum():.4f} "
              f"devices={len(jax.devices())} "
              f"processes={args.num_processes}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
