"""Generate scenes/cornell_refrng.pbrt (the matched-RNG parity scene:
cornell geometry, sobol sampler, UNIFORM light strategy) and render it
with the spectral reference binary into tests/data/ref_cornell_refrng.npz.

Run: python scripts/gen_refrng_fixture.py [--render-only]
Requires /tmp/refbuild/pbrt_spectral (scripts/build_reference.sh --spectral).
"""

import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from scripts.gen_cornell_pbrt import mesh_str, quad_str  # noqa: E402
from pbrt_tpu.models.flagship import _uv_sphere  # noqa: E402

SCENE = "scenes/cornell_refrng.pbrt"
OUT = "tests/data/ref_cornell_refrng.npz"
W = H = 128
SPP = 32


def write_scene():
    pts, idx = _uv_sphere(28, 56)
    with open(SCENE, "w") as f:
        f.write('# matched-RNG parity scene (see scripts/gen_refrng_fixture'
                '.py):\n# cornell_bench geometry at 128x128, sobol 32spp, '
                'UNIFORM light strategy\n')
        f.write('LookAt 2.5 -4.5 2.5  2.5 2.5 2.5  0 0 1\n')
        f.write('Camera "perspective" "float fov" [50]\n')
        f.write(f'Film "image" "integer xresolution" [{W}] '
                f'"integer yresolution" [{H}]\n')
        f.write(f'Sampler "sobol" "integer pixelsamples" [{SPP}]\n')
        f.write('Integrator "path" "integer maxdepth" [5] '
                '"string lightsamplestrategy" "uniform"\n')
        f.write('WorldBegin\n')
        f.write('Material "matte" "rgb Kd" [.73 .73 .73]\n')
        f.write(quad_str([[0, 0, 0], [5, 0, 0], [5, 5, 0], [0, 5, 0]]))
        f.write(quad_str([[0, 0, 5], [0, 5, 5], [5, 5, 5], [5, 0, 5]]))
        f.write(quad_str([[0, 5, 0], [5, 5, 0], [5, 5, 5], [0, 5, 5]]))
        f.write('Material "matte" "rgb Kd" [.65 .05 .05]\n')
        f.write(quad_str([[0, 0, 0], [0, 5, 0], [0, 5, 5], [0, 0, 5]]))
        f.write('Material "matte" "rgb Kd" [.12 .45 .15]\n')
        f.write(quad_str([[5, 0, 0], [5, 0, 5], [5, 5, 5], [5, 5, 0]]))
        f.write('AttributeBegin\n')
        f.write('Material "matte" "rgb Kd" [0 0 0]\n')
        f.write('AreaLightSource "diffuse" "rgb L" [15 12.75 9]\n')
        f.write(quad_str([[1.8, 1.8, 4.99], [1.8, 3.2, 4.99],
                          [3.2, 3.2, 4.99], [3.2, 1.8, 4.99]]))
        f.write('AttributeEnd\n')
        f.write('Material "mirror" "rgb Kr" [.9 .9 .9]\n')
        f.write(mesh_str(pts * 1.0 + np.array([3.5, 3.4, 1.0]), idx))
        f.write('Material "plastic" "rgb Kd" [.3 .35 .5] '
                '"rgb Ks" [.4 .4 .4] "float roughness" [.05] '
                '"bool remaproughness" "false"\n')
        f.write(mesh_str(pts * 0.8 + np.array([1.4, 2.6, 0.8]), idx))
        f.write('Material "glass"\n')
        f.write('AttributeBegin\n')
        f.write('Translate 2.5 1.3 0.6\nScale .6 .6 .6\n')
        f.write('Shape "sphere" "float radius" [1]\n')
        f.write('AttributeEnd\n')
        f.write('WorldEnd\n')
    print("wrote", SCENE)


def render_fixture():
    from pbrt_tpu.film.io import read_dat
    out_dat = "/tmp/refrng.dat"
    subprocess.run(["/tmp/refbuild/pbrt_spectral", "--outfile", out_dat,
                    SCENE], check=True)
    img, _flag = read_dat(out_dat)           # [H,W,31]
    img = np.asarray(img, np.float32)
    np.savez_compressed(OUT, img=img, spp=SPP)
    print("wrote", OUT, img.shape, "mean", img.mean())


if __name__ == "__main__":
    if "--render-only" not in sys.argv:
        write_scene()
    render_fixture()
