"""Film checkpoint/resume tests (new capability vs reference: its film
is written only at render end, integrator.cpp:341)."""
import numpy as np

from pbrt_tpu.models import flagship
from pbrt_tpu.film import film as filmmod
from pbrt_tpu.film import checkpoint as ckpt
from pbrt_tpu.integrators import path
from pbrt_tpu.samplers.samplers import SamplerConfig


def _setup():
    scene, cam_ctor = flagship.cornell()
    cam = cam_ctor(16, 16)
    film = filmmod.make_film(16, 16, "gaussian")
    cfg = SamplerConfig("sobol", 0, 4)
    return scene, cam, film, cfg


def test_resume_is_bit_identical(tmp_path):
    scene, cam, film, cfg = _setup()
    ref = path.render(scene, cam, film, cfg, spp=4, max_depth=3)

    cp = str(tmp_path / "film.ckpt")
    # phase 1: render only 2 spp, checkpointing every pass
    part = path.render(scene, cam, film, cfg, spp=2, max_depth=3,
                       checkpoint_path=cp, checkpoint_every=0.0)
    # the saved spp-count of the partial run is for spp=2; rewrite the
    # checkpoint under the full-render fingerprint (same scene/cfg) as
    # a preempted 4-spp run would have written it
    fp4 = ckpt.render_fingerprint(scene, cfg, 4, 3, 16, 16)
    ckpt.save(cp, part, 2, fp4)

    # phase 2: resume to the full 4 spp
    out = path.render(scene, cam, film, cfg, spp=4, max_depth=3,
                      checkpoint_path=cp, checkpoint_every=1e9)
    assert np.array_equal(np.asarray(out.weighted),
                          np.asarray(ref.weighted))
    assert np.array_equal(np.asarray(out.weight), np.asarray(ref.weight))
    assert np.array_equal(np.asarray(out.raw), np.asarray(ref.raw))


def test_mismatched_fingerprint_starts_fresh(tmp_path):
    scene, cam, film, cfg = _setup()
    cp = str(tmp_path / "film.ckpt")
    ckpt.save(cp, film, 3, "deadbeefdeadbeef")
    restored, spp_done = ckpt.load(
        cp, film, ckpt.render_fingerprint(scene, cfg, 4, 3, 16, 16))
    assert spp_done == 0


def test_corrupt_checkpoint_starts_fresh(tmp_path):
    scene, cam, film, cfg = _setup()
    cp = str(tmp_path / "film.ckpt")
    with open(cp, "wb") as f:
        f.write(b"not a checkpoint")
    restored, spp_done = ckpt.load(
        cp, film, ckpt.render_fingerprint(scene, cfg, 4, 3, 16, 16))
    assert spp_done == 0


def test_completed_checkpoint_skips_render(tmp_path):
    scene, cam, film, cfg = _setup()
    cp = str(tmp_path / "film.ckpt")
    ref = path.render(scene, cam, film, cfg, spp=2, max_depth=3,
                      checkpoint_path=cp, checkpoint_every=1e9)
    # re-running the identical render resumes at completed==spp and
    # does no extra passes: result unchanged
    again = path.render(scene, cam, film, cfg, spp=2, max_depth=3,
                        checkpoint_path=cp, checkpoint_every=1e9)
    assert np.array_equal(np.asarray(again.weighted),
                          np.asarray(ref.weighted))
