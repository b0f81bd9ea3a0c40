"""Generate scenes/killeroo_refrng.pbrt (the BASELINE scene with the
sampler swapped to sobol + uniform light strategy) and render it with the
spectral reference binary into tests/data/ref_killeroo_refrng.npz.

The fixture stores a 256x256 center crop (pixels [222:478)^2 — killeroo
bodies + floor shadow) of the 700x700 render plus full-image per-band
means; the parity test renders only the crop's pixels (matched-RNG
sampling is per-pixel, so a crop render is sample-identical to the full
render's crop).

Run: python scripts/gen_killeroo_refrng.py [--render-only]
Requires /tmp/refbuild/pbrt_spectral (scripts/build_reference.sh --spectral).
"""

import os
import re
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SRC = "/root/reference/scenes/killeroo-simple.pbrt"
SCENE = "scenes/killeroo_refrng.pbrt"
OUT = "tests/data/ref_killeroo_refrng.npz"
SPP = 8
CROP = (222, 478)


def write_scene():
    text = open(SRC).read()
    text = re.sub(r'Sampler "halton"[^\n]*',
                  f'Sampler "sobol" "integer pixelsamples" [{SPP}]', text)
    # this fork IGNORES --outfile when the scene names a filename
    # (api.cpp MakeFilm warning) — point the scene itself at the .dat
    text = text.replace('"string filename" "killeroo-simple.exr"',
                        '"string filename" "/tmp/killeroo_refrng.dat"')
    text = text.replace(
        'Integrator "path"',
        'Integrator "path" "integer maxdepth" [5] '
        '"string lightsamplestrategy" "uniform"')
    # the Include is relative to the scene file; this copy lives in
    # /root/repo/scenes, so make it absolute (works for both binaries)
    text = text.replace(
        'Include "geometry/killeroo.pbrt"',
        'Include "/root/reference/scenes/geometry/killeroo.pbrt"')
    with open(SCENE, "w") as f:
        f.write("# matched-RNG parity copy of killeroo-simple.pbrt "
                "(see scripts/gen_killeroo_refrng.py)\n")
        f.write(text)
    print("wrote", SCENE)


def render_fixture():
    from pbrt_tpu.film.io import read_dat
    out_dat = "/tmp/killeroo_refrng.dat"
    subprocess.run(["/tmp/refbuild/pbrt_spectral", "--outfile", out_dat,
                    SCENE], check=True)
    img, _flag = read_dat(out_dat)           # [H,W,31]
    # the fork's spectral .dat stores the UNNORMALIZED per-pixel sample
    # sum ("the more rays, the higher the output value", film.cpp:247);
    # box filter + weight-1 samples make mean = sum / spp exactly
    img = np.asarray(img, np.float32) / SPP
    y0, y1 = CROP
    np.savez_compressed(
        OUT, crop=img[y0:y1, y0:y1], crop_box=np.asarray(CROP), spp=SPP,
        band_mean=img.reshape(-1, img.shape[-1]).mean(0))
    print("wrote", OUT, img.shape, "crop mean",
          img[y0:y1, y0:y1].mean())


if __name__ == "__main__":
    if "--render-only" not in sys.argv:
        write_scene()
    render_fixture()
