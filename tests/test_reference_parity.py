"""Radiance parity against the actual reference binary.

tests/data/ref_killeroo_blocks.npz holds 28x28-block means of a
killeroo-simple render by the reference compiled with
PBRT_SAMPLED_SPECTRUM (built via scripts/build_reference.sh, 8spp,
700x700, path/maxdepth 5).  We render a center crop of the same scene
at 2spp and require the lit block means to agree — the full-spectrum
analog of BASELINE.md's "radiance correctness" metric.
"""

import os

import numpy as np
import pytest

SCENE = "/root/reference/scenes/killeroo-simple.pbrt"
FIXTURE = os.path.join(os.path.dirname(__file__), "data",
                       "ref_killeroo_blocks.npz")


@pytest.mark.skipif(not os.path.exists(SCENE),
                    reason="reference scene not available")
def test_killeroo_crop_matches_reference(tmp_path):
    from pbrt_tpu.parser.api import parse_scene
    from pbrt_tpu.tools.pbrt import run_job
    from pbrt_tpu.film import film as filmmod

    d = np.load(FIXTURE)
    ref_blocks = d["blocks"]            # [25,25,31] per-sample means
    k = int(d["block"])

    job = parse_scene(SCENE)
    # center crop: blocks 10..15 in x and y (rows of the killeroo body)
    crop = (10 * k / 700, 15 * k / 700, 10 * k / 700, 15 * k / 700)
    job.crop_window = crop
    spp = 2
    film, _ = run_job(job, spp=spp, quiet=True)
    ours = np.asarray(film.raw) / spp           # [700,700,31] means

    bo = ours.reshape(25, k, 25, k, 31).mean((1, 3))
    sel = np.s_[10:15, 10:15]
    lum_r = ref_blocks[sel].sum(-1)
    lum_o = bo[sel].sum(-1)
    mask = lum_r > lum_r.mean() * 0.2
    rel = np.abs(lum_o - lum_r)[mask] / lum_r[mask]
    assert np.median(rel) < 0.08, (np.median(rel), rel.max())
    # per-band spectral shape over the crop: same curve within a few %
    spec_r = ref_blocks[sel].reshape(-1, 31)[mask.ravel()].mean(0)
    spec_o = bo[sel].reshape(-1, 31)[mask.ravel()].mean(0)
    ratio = spec_o / np.maximum(spec_r, 1e-9)
    assert np.abs(ratio / ratio.mean() - 1.0).max() < 0.06, ratio


VOLPATH = os.path.join(os.path.dirname(__file__), "..", "scenes",
                       "volpath_bench.pbrt")
VOLPATH_FIXTURE = os.path.join(os.path.dirname(__file__), "data",
                               "ref_volpath_blocks.npz")


def test_volpath_bench_matches_reference():
    """Volumetric parity (BASELINE config #4): a box of homogeneous
    scattering fog (camera inside the medium via a pre-Camera
    MediumInterface) rendered with volpath matches the reference
    binary's radiance: 16x16-block luminance within volumetric noise,
    overall energy within 3%, and a flat per-band ratio (medium
    transmittance + in-scatter NEE + HG phase)."""
    from pbrt_tpu.parser.api import parse_scene
    from pbrt_tpu.tools.pbrt import run_job

    d = np.load(VOLPATH_FIXTURE)
    ref_blocks = d["blocks"]            # [16,16,31] per-sample means
    k = int(d["block"])
    job = parse_scene(VOLPATH)
    spp = 32
    film, _ = run_job(job, spp=spp, quiet=True, progress=False)
    ours = np.asarray(film.raw) / spp
    bo = ours.reshape(16, k, 16, k, 31).mean((1, 3))
    lum_r = ref_blocks.sum(-1)
    lum_o = bo.sum(-1)
    assert abs(lum_o.sum() / lum_r.sum() - 1.0) < 0.03
    rel = np.abs(lum_o - lum_r) / lum_r
    assert np.median(rel) < 0.10, (np.median(rel), rel.max())
    spec_r = ref_blocks.reshape(-1, 31).mean(0)
    spec_o = bo.reshape(-1, 31).mean(0)
    ratio = spec_o / np.maximum(spec_r, 1e-9)
    assert np.abs(ratio / ratio.mean() - 1.0).max() < 0.02, ratio


CORNELL = os.path.join(os.path.dirname(__file__), "..", "scenes",
                       "cornell_bench.pbrt")
CORNELL_FIXTURE = os.path.join(os.path.dirname(__file__), "data",
                               "ref_cornell_blocks.npz")


def test_cornell_bench_matches_reference():
    """The bench scene's .pbrt twin (scripts/gen_cornell_pbrt.py) renders
    to the reference's radiance: 16x16-block luminance means within noise
    and a flat per-band ratio (glass/mirror/plastic + area light NEE)."""
    from pbrt_tpu.parser.api import parse_scene
    from pbrt_tpu.tools.pbrt import run_job

    d = np.load(CORNELL_FIXTURE)
    ref_blocks = d["blocks"]            # [16,16,31] per-sample means
    k = int(d["block"])
    job = parse_scene(CORNELL)
    spp = 2
    film, _ = run_job(job, spp=spp, quiet=True, progress=False)
    ours = np.asarray(film.raw) / spp
    bo = ours.reshape(16, k, 16, k, 31).mean((1, 3))
    lum_r = ref_blocks.sum(-1)
    lum_o = bo.sum(-1)
    mask = lum_r > lum_r.mean() * 0.05
    rel = np.abs(lum_o - lum_r)[mask] / lum_r[mask]
    assert np.median(rel) < 0.08, (np.median(rel), rel.max())
    spec_r = ref_blocks.reshape(-1, 31)[mask.ravel()].mean(0)
    spec_o = bo.reshape(-1, 31)[mask.ravel()].mean(0)
    ratio = spec_o / np.maximum(spec_r, 1e-9)
    assert np.abs(ratio / ratio.mean() - 1.0).max() < 0.05, ratio
