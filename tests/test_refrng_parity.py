"""Matched-RNG pixel-level parity against the reference binary.

The headline correctness gate (BASELINE.md: "allclose to reference
render at equal spp, matched RNG"): scenes/cornell_refrng.pbrt rendered
with the reference-exact integrator (integrators/refpath.py — pbrt's
EstimateDirect two-estimator structure, per-lane Sobol dimension
counters, GlobalSampler index remapping) must reproduce the reference
binary's .dat output pixel-for-pixel at equal spp.

Fixture: tests/data/ref_cornell_refrng4.npz, rendered by the reference
built with scripts/build_reference.sh --spectral (-ffp-contract=off —
see the script's comment: FMA contraction makes the reference leak rays
through mesh seams) via scripts/gen_refrng_fixture.py.

Measured margins at 32spp (full run, scripts/gen_refrng_fixture.py
workload): 99.06% of pixels within 1e-2 relative, p99 = 0.008, image
means within 2e-5 relative.  The residual non-matching pixels are
exact-seam samples where triangle tie-breaking differs (the scene's
axis-aligned geometry + raw Sobol's dyadic samples put rays exactly on
mesh diagonals) — divergent by construction, not error.
"""

import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "data",
                       "ref_cornell_refrng4.npz")
SCENE = os.path.join(os.path.dirname(__file__), "..", "scenes",
                     "cornell_refrng.pbrt")


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="no fixture")
def test_matched_rng_pixel_parity():
    from pbrt_tpu.parser.api import parse_scene
    from pbrt_tpu.tools.pbrt import build_camera
    from pbrt_tpu.integrators import refpath
    from pbrt_tpu.film import film as filmmod

    d = np.load(FIXTURE)
    ref = d["img"]
    spp = int(d["spp"])
    job = parse_scene(SCENE)
    W, H = 128, 128
    camera = build_camera(job, W, H)
    film = filmmod.make_film(W, H, "box", radius=(0.5, 0.5),
                             pbrt_boundary=True)
    film = refpath.render_ref(job.scene, camera, film, W, H, spp=spp,
                              max_depth=5)
    ours = np.asarray(film.weighted)

    lo = ours.sum(-1)
    lr = ref.sum(-1)
    rel = np.abs(lo - lr) / np.maximum(lr, 1e-3)
    frac_close = float(np.mean(rel < 1e-2))
    # pixel-level allclose: the overwhelming majority of pixels bit-track
    # the reference; the tail is exact-seam tie-break divergence
    assert frac_close > 0.98, frac_close
    assert np.median(rel) < 1e-4, np.median(rel)
    assert abs(lo.mean() / lr.mean() - 1.0) < 2e-3
    # spectral agreement on matching pixels (bands, not just luminance)
    m = rel < 1e-2
    band_rel = np.abs(ours[m] - ref[m]) / np.maximum(ref[m], 1e-3)
    assert np.median(band_rel) < 1e-4


def test_sobol_global_index_enumerates_pixels():
    """The derived index map matches brute-force Sobol enumeration
    (lowdiscrepancy.h:229 semantics) for a 16x16 raster."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from pbrt_tpu.core import lds

    m, F = 4, 4
    tab = lds._SOBOL_NP

    def sobol_xy(i):
        x = y = 0
        for j in range(30):
            if (i >> j) & 1:
                x ^= int(tab[0, j]) << 2
                y ^= int(tab[1, j]) << 2
        return x, y

    seen = {}
    for i in range(F << (2 * m)):
        x, y = sobol_xy(i)
        seen.setdefault((x >> (32 - m), y >> (32 - m)), []).append(i)
    for (px, py), idxs in seen.items():
        for f in range(F):
            mine = int(lds.sobol_global_index(
                np.uint32(f), np.uint32(px), np.uint32(py), m))
            want = [i for i in idxs if (i >> (2 * m)) == f]
            assert len(want) == 1 and mine == want[0], (px, py, f)
