"""FourierBSDF tests: SCATFUN IO round-trip and grid-bake evaluation
against a synthetic Lambertian table (reference materials/fourier.cpp,
reflection.cpp FourierBSDF)."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.materials import fourier

RHO = 0.6


def _lambertian_table(tmp_path, n_mu=24):
    """Encode f = RHO/pi for reflection as a SCATFUN table: stored
    series value is f * |muI| with a single DC Fourier coefficient."""
    mu = np.linspace(-1.0, 1.0, n_mu)
    coeffs = [[np.array([RHO / np.pi * abs(mi)], np.float32)
               if mi * mo < 0 else np.zeros(1, np.float32)
               for mo in mu] for mi in mu]
    path = str(tmp_path / "lambert.bsdf")
    fourier.write_bsdf(path, mu, coeffs, n_channels=1, eta=1.0)
    return path


def test_io_roundtrip(tmp_path):
    path = _lambertian_table(tmp_path)
    tab = fourier.read_bsdf(path)
    assert tab["n_channels"] == 1
    assert tab["m_max"] == 1
    assert len(tab["mu"]) == 24
    assert abs(tab["eta"] - 1.0) < 1e-6
    # a stored coefficient: reflection cell away from zero
    i = 3           # mu ~ -0.74
    o = 20          # mu ~ +0.74
    m = tab["m"][i, o]
    off = tab["a_offset"][i, o]
    assert m == 1
    assert abs(tab["a"][off] - RHO / np.pi * 0.7391) < 1e-3


def test_bake_and_eval_matches_lambert(tmp_path):
    tab = fourier.read_bsdf(_lambertian_table(tmp_path))
    grid = jnp.asarray(fourier.bake_grid(tab, n_mu=48, n_phi=16))
    # reflection pair, away from grazing and from the mu=0 seam
    wo = jnp.asarray([[0.3, 0.1, 0.95], [0.0, 0.0, 1.0]])
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    wi = jnp.asarray([[-0.2, 0.4, 0.89], [0.5, 0.0, 0.866]])
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    f = np.asarray(fourier.eval_grid(grid, wo, wi))
    assert np.allclose(f, RHO / np.pi, rtol=0.12), f
    # opposite-hemisphere (transmission) pair: zero for this table
    wt = jnp.asarray([[0.2, 0.0, -0.98]])
    wt = wt / jnp.linalg.norm(wt, axis=-1, keepdims=True)
    ft = np.asarray(fourier.eval_grid(grid, wo[:1], wt))
    assert (ft < 0.02).all(), ft


def test_albedo_integrates(tmp_path):
    """MC hemispherical reflectance of the baked grid ~= RHO."""
    tab = fourier.read_bsdf(_lambertian_table(tmp_path))
    grid = jnp.asarray(fourier.bake_grid(tab, n_mu=48, n_phi=16))
    B = 100_000
    rs = np.random.RandomState(0)
    z = rs.uniform(0, 1, B)
    phi = rs.uniform(0, 2 * np.pi, B)
    r = np.sqrt(1 - z * z)
    wi = jnp.asarray(np.stack([r * np.cos(phi), r * np.sin(phi), z], -1),
                     jnp.float32)
    wo = jnp.broadcast_to(jnp.asarray([0.25, 0.0, 0.968]), (B, 3))
    f = np.asarray(fourier.eval_grid(grid, wo, wi))[:, 0]
    # uniform hemisphere pdf = 1/(2pi)
    albedo = (f * z).mean() * 2 * np.pi
    assert abs(albedo - RHO) < 0.06, albedo


def test_fourier_scene_matches_matte(tmp_path):
    """A SCATFUN table encoding a rho=0.6 Lambertian must render (path
    integrator, NEE+BSDF MIS) close to a true matte with the same kd."""
    import jax
    from pbrt_tpu.parser.api import PbrtAPI
    from pbrt_tpu.tools.pbrt import run_job
    from pbrt_tpu.film import film as filmmod
    from pbrt_tpu.scene import ir as _ir
    path = _lambertian_table(tmp_path, n_mu=32)
    base = """
LookAt 0 0 -4  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Sampler "sobol" "integer pixelsamples" [48]
Integrator "path" "integer maxdepth" [3]
WorldBegin
AttributeBegin
AreaLightSource "area" "color L" [10 10 10]
Shape "trianglemesh" "point P" [-3 3 -3  3 3 -3  3 3 3  -3 3 3]
    "integer indices" [0 1 2 2 3 0]
AttributeEnd
%s
Shape "sphere" "float radius" [1]
WorldEnd
"""
    out = {}
    for name, mat in [
            ("fourier", 'Material "fourier" "string bsdffile" "%s"' % path),
            ("matte", 'Material "matte" "color Kd" [0.6 0.6 0.6]')]:
        job = PbrtAPI().parse_string(base % mat)
        if name == "fourier":
            assert job.scene.has_fourier
            assert (np.asarray(job.scene.mat_type)
                    == _ir.MAT_FOURIER).any()
        film, _ = run_job(job, quiet=True, progress=False)
        out[name] = np.asarray(filmmod.develop_rgb(film))
    a, b = out["fourier"], out["matte"]
    assert np.isfinite(a).all()
    ca = a[8:16, 8:16].mean()
    cb = b[8:16, 8:16].mean()
    assert abs(ca - cb) < 0.15 * max(cb, 1e-6), (ca, cb)
