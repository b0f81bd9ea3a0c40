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


def _omni_with_microlens(tmp_path, singlet, dims=16, sim_radius=0,
                         offsets=None, ml_radius=2.0, ml_semi_ap=1.0):
    from pbrt_tpu.tools import lenstool
    out = tmp_path / "omni.json"
    lenstool.convert(singlet, str(out))
    j = json.loads(out.read_text())
    nx = ny = dims
    # cell on a 35mm-diag film is ~1.5mm at 16x16: pick the microlens
    # aperture/curvature at cell scale so most pupil samples survive
    j["microlens"] = {
        "dimensions": [nx, ny],
        "offsets": offsets if offsets is not None
        else [[0.0, 0.0]] * (nx * ny),
        "surfaces": [{"radius": ml_radius, "thickness": 0.4, "ior": 1.5,
                      "semi_aperture": ml_semi_ap, "conic_constant": 0.0}],
    }
    out.write_text(json.dumps(j))
    surfs, micro = lens.read_json_lens(str(out))
    return lens.build_lens_camera(
        "omni", tfm.Transform(), surfs, focus_distance=1e6,
        film_diag=0.035, microlens=micro,
        microlens_sensor_offset=0.001, microlens_sim_radius=sim_radius)


def test_microlens_attach(tmp_path, singlet):
    cam = _omni_with_microlens(tmp_path, singlet)
    assert cam.ml_n_surfaces == 1
    assert cam.ml_dims == (16, 16)
    assert cam.ml_surface_kinds == ("sphere",)
    # rear-first z accumulation: single surface sits at its own thickness
    assert np.isclose(float(cam.ml_z[0]), 0.4e-3)
    assert not cam.ml_has_offsets


def test_microlens_pupil_sampling_is_cellwise(tmp_path, singlet):
    """SampleMicrolensPupil (omni.cpp:972): all film points within one
    cell sample the SAME cell-sized region of the microlens plane."""
    cam = _omni_with_microlens(tmp_path, singlet, dims=8)
    fw, fh = lens._ml_extent(cam, 64, 64)
    fw, fh = float(fw), float(fh)
    cell = fw / 8
    # two film points inside cell (4,4), one in cell (5,4)
    px = jnp.asarray([cell * 0.1, cell * 0.4, cell * 1.2])
    py = jnp.asarray([cell * 0.25, cell * 0.25, cell * 0.25])
    u = jnp.asarray([[0.5, 0.5]] * 3)
    p, area = lens._ml_sample_pupil(cam, px, py, u, fw, fh)
    p = np.asarray(p)
    assert np.allclose(p[0], p[1])
    assert not np.allclose(p[0], p[2])
    assert np.allclose(p[:, 2], 1e-3)
    assert np.isclose(float(area), fw * fh / 64)


def test_microlens_rays_render_and_differ(tmp_path, singlet):
    """A microlens array must change the generated ray field vs the same
    main stack without it (the fork's light-field camera feature)."""
    # 64x64 lenslets (0.39mm cells), f = R/(n-1) = 0.5mm ~ the 0.4mm
    # film->lens gap: near-collimating, so survivors reach the main stack
    cam_ml = _omni_with_microlens(tmp_path, singlet, dims=64,
                                  ml_radius=0.25, ml_semi_ap=0.2)
    surfs = lens.read_dat_lens(singlet)
    cam_plain = lens.build_lens_camera("omni", tfm.Transform(), surfs,
                                       focus_distance=1e6, film_diag=0.035)
    B = 512
    rs = np.random.RandomState(1)
    pf = jnp.asarray(rs.rand(B, 2).astype(np.float32) * 64)
    ul = jnp.asarray(rs.rand(B, 2).astype(np.float32))
    ray_ml, w_ml = lens.generate_rays(cam_ml, pf, ul, width=64, height=64)
    ray_pl, w_pl = lens.generate_rays(cam_plain, pf, ul, width=64, height=64)
    frac = float((np.asarray(w_ml) > 0).mean())
    assert frac > 0.05, frac  # TIR + main-aperture vignetting is expected
    both = (np.asarray(w_ml) > 0) & (np.asarray(w_pl) > 0)
    assert both.sum() > 20
    dd = np.abs(np.asarray(ray_ml.d)[both] - np.asarray(ray_pl.d)[both])
    assert dd.max() > 1e-3           # the array visibly redirects rays


def test_microlens_refracts_toward_cell_axis(tmp_path, singlet):
    """A positive microlens bends a +z ray hitting off its cell center
    toward the cell axis (in the micro stack alone)."""
    cam = _omni_with_microlens(tmp_path, singlet, dims=8)
    fw, fh = lens._ml_extent(cam, 64, 64)
    fw, fh = float(fw), float(fh)
    cellw, cellh = fw / 8, fh / 8
    # cell (4,4) center, offset +0.3 cell in x; ray straight up (+z)
    cx = -fw / 2 + 4.5 * cellw
    cy = -fh / 2 + 4.5 * cellh
    o = jnp.asarray([[cx + 0.3 * cellw, cy, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    corners = [(cx - cellw / 2, cy - cellh / 2),
               (cx + cellw / 2, cy - cellh / 2),
               (cx + cellw / 2, cy + cellh / 2),
               (cx - cellw / 2, cy + cellh / 2)]
    o2, d2, ok = lens._ml_trace_stack(
        cam, o, d, jnp.full(1, 550.0), jnp.full(1, cx), jnp.full(1, cy),
        [(jnp.full(1, a), jnp.full(1, b)) for a, b in corners])
    assert bool(ok[0])
    assert float(d2[0, 0]) < -1e-4   # bent back toward the cell axis (-x)


def test_microlens_sim_radius_neighbor_selection(tmp_path, singlet):
    """simulationRadius=1 searches neighbor elements: a tilted ray whose
    microlens-plane crossing (z=1mm) lands in cell (5,4) but whose actual
    surface hit (z=0.4mm) is still inside cell (4,4) dies at R=0 (wrong
    element's quad bounds) and survives at R=1 (omni.cpp
    TraceFullLensSystemFromFilm:1074-1096 neighbor search)."""
    def build(sim_radius):
        cam = _omni_with_microlens(tmp_path, singlet, dims=16,
                                   sim_radius=sim_radius)
        # replace the main stack with one wide-open flat stop so only the
        # microlens decides survival
        return cam.replace(
            curv_x=jnp.zeros(1), curv_y=jnp.zeros(1),
            conic_x=jnp.zeros(1), conic_y=jnp.zeros(1),
            z_pos=jnp.asarray([0.05]), aperture=jnp.asarray([10.0]),
            is_stop=jnp.asarray([True]), eta_const=jnp.ones(1),
            eta_idx=jnp.full(1, -1, jnp.int32), asph=jnp.zeros((1, 4)),
            n_surfaces=1, surface_kinds=("flat",))
    cam0, cam1 = build(0), build(1)
    fw, fh = lens._ml_extent(cam0, 64, 64)
    fw, fh = float(fw), float(fh)
    cellw = fw / 16
    cx4 = -fw / 2 + 4.5 * cellw       # cell (4,*) center
    # slope 0.25 cell/mm: crossing at z=1mm is at 0.55 cell (-> cell 5),
    # surface hit at z~0.4mm is at ~0.4 cell (inside cell 4)
    o = jnp.asarray([[cx4 + 0.3 * cellw, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.25 * cellw / 1e-3, 0.0, 1.0]], jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    wl = jnp.full(1, 550.0)
    _, _, ok0 = lens._ml_full_trace(cam0, o, d, wl, fw, fh)
    _, _, ok1 = lens._ml_full_trace(cam1, o, d, wl, fw, fh)
    assert not bool(ok0[0])   # wrong element at R=0: quad bounds cull
    assert bool(ok1[0])       # R=1 finds the true first-hit element
