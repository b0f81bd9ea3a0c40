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
