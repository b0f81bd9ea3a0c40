"""Hair BSDF tests (model: reference src/tests/hair.cpp white-furnace
energy tests + sampling consistency)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.materials import hair


def _sphere_dirs(n, seed):
    rs = np.random.RandomState(seed)
    z = rs.uniform(-1, 1, n)
    phi = rs.uniform(0, 2 * np.pi, n)
    r = np.sqrt(np.maximum(1 - z * z, 0))
    return np.stack([r * np.cos(phi), r * np.sin(phi), z],
                    -1).astype(np.float32)


@pytest.mark.parametrize("beta", [0.1, 0.3, 0.6, 0.9])
def test_white_furnace(beta):
    """sigma_a = 0: the BSDF scatters all energy — uniform-sphere MC of
    f * |cos z| * 4pi ~= 1 (hair.cpp WhiteFurnace test)."""
    B = 200_000
    wi = jnp.asarray(_sphere_dirs(B, 0))
    wo_np = np.array([0.3, 0.8, 0.52])
    wo = jnp.broadcast_to(jnp.asarray(wo_np / np.linalg.norm(wo_np),
                                      jnp.float32), (B, 3))
    h = jnp.full((B,), 0.35)
    sigma_a = jnp.zeros((B, 3))
    f = hair.hair_eval(wo, wi, h, sigma_a, beta_m=beta, beta_n=beta)
    est = float((f[:, 0] * jnp.abs(wi[:, 2])).mean() * 4 * np.pi)
    assert 0.9 < est < 1.1, est


@pytest.mark.parametrize("beta", [0.2, 0.5])
def test_sampled_furnace(beta):
    """Importance-sampled version: E[f |cos| / pdf] ~= 1 when sigma_a=0
    (hair.cpp WhiteFurnaceSampled)."""
    B = 100_000
    rs = np.random.RandomState(1)
    wo_np = np.array([0.1, -0.6, 0.79])
    wo = jnp.broadcast_to(jnp.asarray(wo_np / np.linalg.norm(wo_np),
                                      jnp.float32), (B, 3))
    h = jnp.full((B,), -0.5)
    sigma_a = jnp.zeros((B, 3))
    u = jnp.asarray(rs.rand(B, 4).astype(np.float32))
    wi, f, pdf = hair.hair_sample(wo, h, sigma_a, u, beta_m=beta,
                                  beta_n=beta)
    ok = np.asarray(pdf) > 1e-7
    est = (np.asarray(f)[:, 0] * np.abs(np.asarray(wi)[:, 2])
           / np.maximum(np.asarray(pdf), 1e-7))
    est = np.where(ok, est, 0.0).mean()
    assert 0.85 < est < 1.15, est


def test_sample_matches_pdf():
    """pdf returned by hair_sample equals hair_pdf at the sampled wi."""
    B = 4096
    rs = np.random.RandomState(2)
    wo_np = np.array([0.4, 0.5, 0.77])
    wo = jnp.broadcast_to(jnp.asarray(wo_np / np.linalg.norm(wo_np),
                                      jnp.float32), (B, 3))
    h = jnp.full((B,), 0.2)
    sigma_a = jnp.full((B, 3), 0.5)
    u = jnp.asarray(rs.rand(B, 4).astype(np.float32))
    wi, f, pdf = hair.hair_sample(wo, h, sigma_a, u)
    pdf2 = hair.hair_pdf(wo, wi, h, sigma_a)
    assert np.allclose(np.asarray(pdf), np.asarray(pdf2), rtol=1e-4,
                       atol=1e-7)
    # pdf integrates to ~1 over the sphere (uniform MC)
    wi_u = jnp.asarray(_sphere_dirs(B, 3))
    p_u = hair.hair_pdf(wo, wi_u, h, sigma_a)
    total = float(np.asarray(p_u).mean() * 4 * np.pi)
    assert 0.9 < total < 1.1, total


def test_absorption_darkens():
    B = 50_000
    wi = jnp.asarray(_sphere_dirs(B, 4))
    wo = jnp.broadcast_to(jnp.asarray([0.0, 0.6, 0.8], jnp.float32),
                          (B, 3))
    h = jnp.full((B,), 0.0)
    f0 = hair.hair_eval(wo, wi, h, jnp.zeros((B, 3)))
    f1 = hair.hair_eval(wo, wi, h, jnp.full((B, 3), 2.0))
    e0 = float((f0[:, 0] * jnp.abs(wi[:, 2])).mean() * 4 * np.pi)
    e1 = float((f1[:, 0] * jnp.abs(wi[:, 2])).mean() * 4 * np.pi)
    assert e1 < 0.75 * e0, (e0, e1)
    # R lobe (p=0) survives absorption: still some reflectance
    assert e1 > 0.02, e1


def test_sigma_a_reflectance_roundtrip():
    """Darker target colors map to larger sigma_a (hair.cpp fit)."""
    c = jnp.asarray([[0.8, 0.5, 0.2]])
    sa = hair.sigma_a_from_reflectance(c, jnp.asarray([0.3]))
    sa = np.asarray(sa)[0]
    assert sa[2] > sa[1] > sa[0] > 0


def test_hair_material_renders_on_curves():
    """End-to-end: hair material + curve geometry through the parser and
    path integrator (frame from fiber dpdu, h from curve v)."""
    from pbrt_tpu.parser.api import PbrtAPI
    from pbrt_tpu.tools.pbrt import run_job
    from pbrt_tpu.film import film as filmmod
    from pbrt_tpu.scene import ir as _ir
    job = PbrtAPI().parse_string("""
LookAt 0 0 -4  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Sampler "sobol" "integer pixelsamples" [8]
Integrator "path" "integer maxdepth" [3]
WorldBegin
AttributeBegin
AreaLightSource "area" "color L" [15 15 15]
Shape "trianglemesh" "point P" [-3 3 -3  3 3 -3  3 3 3  -3 3 3]
    "integer indices" [0 1 2 2 3 0]
AttributeEnd
Material "hair" "float eumelanin" [0.3]
Shape "curve" "point P" [-1 -1 0  -0.3 0.5 0  0.3 -0.5 0  1 1 0]
    "float width" [0.4] "string type" "flat"
Shape "curve" "point P" [-1 0.8 0  -0.3 0.2 0  0.3 0.8 0  1 -0.6 0]
    "float width" [0.4] "string type" "flat"
WorldEnd
""")
    assert job.scene.has_hair
    mids = np.asarray(job.scene.mat_type)
    assert (mids == _ir.MAT_HAIR).any()
    film, _ = run_job(job, quiet=True, progress=False)
    rgb = np.asarray(filmmod.develop_rgb(film))
    assert np.isfinite(rgb).all()
    assert rgb.max() > 1e-3  # hair scatters light (not black)
