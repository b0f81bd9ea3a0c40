"""Generate the smoke-in-a-glass-box golden fixture (VERDICT r4 item 4).

Renders scenes/smoke_glass.pbrt — a GridDensityMedium (z-ramp density,
scattering) bound INSIDE a glass sphere via MediumInterface, area-lit —
with the reference spectral binary, and stores a downsampled luminance
map in tests/data/ref_smoke_glass.npz.  The parity test
(tests/test_media_interface.py::test_smoke_glass_vs_reference) renders
the same scene with pbrt_tpu's volpath (per-prim grid binding: delta
tracking + boundary-walked ratio-tracked shadow Tr) and compares block
means — the composition Scene::IntersectTr does per segment
(scene.cpp:57-81 + grid.cpp:89+).

Run: python scripts/gen_smoke_fixture.py
Requires /tmp/refbuild/pbrt_spectral (scripts/build_reference.sh --spectral).
"""
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SCENE = "scenes/smoke_glass.pbrt"
OUT = "tests/data/ref_smoke_glass.npz"
BIN = "/tmp/refbuild/pbrt_spectral"
RES = 48
SPP = 64

# 4x4x4 z-ramp density (matches tests' grid-media unit tests)
NZ = NY = NX = 4
DENS = np.broadcast_to(
    (((np.arange(NZ) + 0.5) / NZ) * 2.0)[:, None, None],
    (NZ, NY, NX)).astype(np.float32)

SCENE_TEXT = f"""# smoke-in-a-glass-box golden scene (generated; do not hand-edit)
Integrator "volpath" "integer maxdepth" [6]
Sampler "sobol" "integer pixelsamples" [{SPP}]
Film "image" "integer xresolution" [{RES}] "integer yresolution" [{RES}]
    "string filename" "/tmp/smoke_glass_ref.dat"
LookAt 0 0 -4  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
WorldBegin
MakeNamedMedium "smoke" "string type" "heterogeneous"
    "color sigma_a" [0.5 0.5 0.5] "color sigma_s" [2.5 2.5 2.5]
    "integer nx" [{NX}] "integer ny" [{NY}] "integer nz" [{NZ}]
    "float density" [{' '.join(f'{v:g}' for v in DENS.ravel())}]
    "point p0" [-1 -1 -1] "point p1" [1 1 1]
AttributeBegin
AreaLightSource "area" "color L" [3 3 3]
Translate 0 0 4
Shape "trianglemesh" "point P" [-3 -3 0  3 -3 0  3 3 0  -3 3 0]
    "integer indices" [0 2 1 0 3 2]
AttributeEnd
AttributeBegin
Material "glass"
MediumInterface "smoke" ""
Shape "sphere" "float radius" [1]
AttributeEnd
AttributeBegin
Material "matte" "color Kd" [0.5 0.5 0.5]
Shape "trianglemesh" "point P" [-6 -1.6 -6  6 -1.6 -6  6 -1.6 6  -6 -1.6 6]
    "integer indices" [0 2 1 0 3 2]
AttributeEnd
WorldEnd
"""


def main():
    with open(SCENE, "w") as f:
        f.write(SCENE_TEXT)
    if not os.path.exists(BIN):
        print(f"reference binary missing: {BIN}", file=sys.stderr)
        return 1
    r = subprocess.run([BIN, SCENE], capture_output=True, text=True,
                       timeout=1800)
    print(r.stderr[-800:])
    if r.returncode != 0:
        return r.returncode
    from pbrt_tpu.film.io import read_dat
    img, wl = read_dat("/tmp/smoke_glass_ref.dat")
    # the fork's .dat is the UNWEIGHTED contribution sum ("the more
    # rays, the higher the output value", film.cpp:246) — normalize by
    # spp (box filter: weight 1 per sample) to mean radiance
    lum = np.asarray(img, np.float64).sum(-1) / SPP
    np.savez_compressed(OUT, lum=lum.astype(np.float32), res=RES,
                        spp=SPP)
    print(f"wrote {OUT}: mean {lum.mean():.4f} "
          f"center {lum[16:32, 16:32].mean():.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
