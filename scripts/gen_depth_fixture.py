"""Generate the metadata-depth golden fixture.

Renders scenes/metadata_depth.pbrt (sphere + floor + area light) with
the reference spectral binary's `metadata` integrator (the fork's depth
strategy, metadata.cpp:54-90: L = |isect.p - ray.o| at the first hit)
and stores the depth map.  tests/test_tools.py::
test_metadata_depth_vs_reference compares pbrt_tpu's metadata
integrator block-medianwise (independent sub-pixel jitter -> per-pixel
values differ at edges; medians over 6x6 blocks are jitter-robust).

Run: python scripts/gen_depth_fixture.py
Requires /tmp/refbuild/pbrt_spectral (scripts/build_reference.sh --spectral).
"""
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SCENE = "scenes/metadata_depth.pbrt"
OUT = "tests/data/ref_metadata_depth.npz"
BIN = "/tmp/refbuild/pbrt_spectral"


def main():
    if not os.path.exists(BIN):
        print(f"reference binary missing: {BIN}", file=sys.stderr)
        return 1
    r = subprocess.run([BIN, SCENE], capture_output=True, text=True,
                       timeout=600)
    if r.returncode != 0:
        print(r.stderr[-500:])
        return r.returncode
    from pbrt_tpu.film.io import read_dat
    img, _ = read_dat("/tmp/depth_ref.dat")
    depth = np.asarray(img)[:, :, 0]      # all bands equal; 1 spp sum
    np.savez_compressed(OUT, depth=depth.astype(np.float32))
    print(f"wrote {OUT}: center {depth[24, 24]:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
