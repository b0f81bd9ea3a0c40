"""Lens camera tests (reference: cameras/realistic.cpp, omni.cpp,
realisticEye.cpp — the fork's headline camera models)."""
import json
import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.cameras import lens
from pbrt_tpu.core import transform as tfm


SINGLET_DAT = """# f=50mm biconvex singlet: radius thickness eta aperture
50 4 1.5 20
-50 0 1 20
"""


@pytest.fixture
def singlet(tmp_path):
    p = tmp_path / "singlet.dat"
    p.write_text(SINGLET_DAT)
    return str(p)


def _build_singlet(path, **kw):
    surfs = lens.read_dat_lens(path)
    return lens.build_lens_camera("realistic", tfm.Transform(), surfs,
                                  focus_distance=1e6, film_diag=0.035, **kw)


def test_dat_parse(singlet):
    surfs = lens.read_dat_lens(singlet)
    assert len(surfs) == 2
    assert np.isclose(surfs[0]["radius_x"], 0.05)
    assert np.isclose(surfs[0]["thickness"], 0.004)
    assert surfs[0]["eta"] == 1.5


def test_paraxial_focus(singlet):
    cam = _build_singlet(singlet)
    # thin-lens f = R/(2(n-1)) = 50mm; thick singlet focuses slightly closer
    fd = float(cam.film_distance)
    assert 0.040 < fd < 0.055, fd


def test_parallel_rays_converge(singlet):
    """Rays from the on-axis film point through different pupil points must
    exit (nearly) parallel when the film sits at the focal plane."""
    cam = _build_singlet(singlet)
    B = 16
    o = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0]]), (B, 1))
    ys = np.linspace(-0.008, 0.008, B)
    rear = np.stack([np.zeros(B), ys,
                     np.full(B, float(cam.z_pos[0]))], -1)
    d = jnp.asarray(rear) - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o2, d2, ok = lens.trace_lenses_from_film(
        cam, o, d, jnp.full(B, 550.0))
    ok = np.asarray(ok)
    assert ok.sum() >= B - 2, ok
    d2 = np.asarray(d2)[ok]
    # all exit directions nearly parallel to +z
    spread = np.abs(d2[:, 1] / d2[:, 2]).max()
    assert spread < 0.02, spread


def test_chromatic_aberration_shifts_focus(singlet):
    cam = _build_singlet(singlet, ca_enabled=True)
    B = 2
    o = jnp.zeros((B, 3))
    rear = jnp.asarray([[0.0, 0.008, float(cam.z_pos[0])]] * B)
    d = rear - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    _, d_blue, _ = lens.trace_lenses_from_film(cam, o, d,
                                               jnp.full(B, 420.0))
    _, d_red, _ = lens.trace_lenses_from_film(cam, o, d,
                                              jnp.full(B, 680.0))
    # dispersion: blue bends more (higher eta) than red
    slope_blue = float(d_blue[0, 1] / d_blue[0, 2])
    slope_red = float(d_red[0, 1] / d_red[0, 2])
    assert slope_blue < slope_red, (slope_blue, slope_red)


def test_json_lens_roundtrip(tmp_path, singlet):
    from pbrt_tpu.tools import lenstool
    out = tmp_path / "singlet.json"
    lenstool.convert(singlet, str(out))
    surfs, micro = lens.read_json_lens(str(out))
    ref = lens.read_dat_lens(singlet)
    assert len(surfs) == len(ref)
    for a, b in zip(surfs, ref):
        assert np.isclose(a["radius_x"], b["radius_x"])
        assert np.isclose(a["thickness"], b["thickness"])
        assert np.isclose(a["eta"], b["eta"])


def test_eye_camera_builds(tmp_path):
    # minimal 4-surface eye (cornea front/back, lens front/back) in the
    # Zemax-style spec format: focal + [rx ry thick medium semiDiam cx cy]
    # mediumIndex = medium on the FILM side of each surface:
    # 1=cornea(1.377) 2=aqueous(1.337) 3=lens(1.42) 4=vitreous(1.336)
    spec_txt = """16.5
7.8 7.8 0.55 1 4.5 0 0
6.5 6.5 2.8 2 4.5 0 0
0 0 0.25 2 2.0 0 0
10.2 10.2 4.0 3 4.5 0 0
-6.0 -6.0 16.32 4 4.5 0 0
"""
    p = tmp_path / "eye.txt"
    p.write_text(spec_txt)
    focal, surfs = lens.read_eye_spec(str(p))
    assert np.isclose(focal, 16.5)
    assert len(surfs) == 5
    iors = [np.full(31, v, np.float32)
            for v in (1.377, 1.337, 1.42, 1.336)]
    cam = lens.build_lens_camera(
        "realisticEye", tfm.Transform(), surfs,
        film_distance=16.32, retina_radius=12.0, retina_semi_diam=4.0,
        film_diag=8.0, ior_spectra=iors, pupil_diameter=4.0,
        diffraction=True)
    # generate a batch of rays; a reasonable fraction must make it through
    B = 256
    rs = np.random.RandomState(0)
    pf = jnp.asarray(rs.rand(B, 2).astype(np.float32) * 64)
    ul = jnp.asarray(rs.rand(B, 2).astype(np.float32))
    ray, w = lens.generate_rays(cam, pf, ul, width=64, height=64)
    frac = float((np.asarray(w) > 0).mean())
    # rear-disk sampling: only ~(pupil/rear aperture)^2 ~ 20% of samples
    # can clear the 2mm-radius pupil; ~12% survive with vignetting (the
    # reference's exit-pupil precompute is the later optimization)
    assert frac > 0.05, frac
    d = np.asarray(ray.d)[np.asarray(w) > 0]
    # rays exit toward the scene (+z in camera space == +z world here)
    assert (d[:, 2] > 0).mean() > 0.95


def test_realistic_camera_renders(singlet):
    """End-to-end: singlet lens camera images an emissive quad."""
    from pbrt_tpu.scene.ir import SceneBuilder, MaterialSpec
    from pbrt_tpu.film import film as filmmod
    from pbrt_tpu.integrators import path as pathint
    from pbrt_tpu.samplers.samplers import SamplerConfig
    b = SceneBuilder()
    black = b.add_material(MaterialSpec())
    li = b.add_area_light(np.full(31, 20.0, np.float32))
    # big quad 2m in front of the camera, facing it (normal -z)
    b.add_triangle_mesh([[-1, -1, 2], [1, -1, 2], [1, 1, 2], [-1, 1, 2]],
                        [[0, 2, 1], [2, 0, 3]], black, light_id=li)
    scene = b.build()
    cam = _build_singlet(singlet)
    film = filmmod.make_film(24, 24, "box")
    film = pathint.render(scene, cam, film, SamplerConfig("sobol", 0, 8),
                          spp=8, max_depth=1,
                          generate_rays=lens.generate_rays)
    img = np.asarray(filmmod.develop_spectral(film))
    assert img.max() > 1.0, img.max()  # the quad is imaged
    assert np.isfinite(img).all()
