"""Volumetric media tests (reference: src/media/*, tests/hg.cpp)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.media import media as med
from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import spectrum as spec


def test_hg_normalization():
    # integral of HG over sphere == 1
    for g in [0.0, 0.5, -0.3]:
        mu = np.linspace(-1, 1, 20001)
        p = np.asarray(med.hg_p(jnp.float32(g), jnp.asarray(mu)))
        integral = 2 * np.pi * np.trapezoid(p, mu)
        assert abs(integral - 1.0) < 1e-3, (g, integral)


def test_hg_sample_matches_pdf():
    g = 0.6
    B = 20000
    rs = np.random.RandomState(0)
    wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (B, 3))
    wi, pdf = med.hg_sample(jnp.float32(g), wo,
                            jnp.asarray(rs.rand(B).astype(np.float32)),
                            jnp.asarray(rs.rand(B).astype(np.float32)))
    # mean cosine of HG == g (measured against -wo = +z)
    cos_t = np.asarray(wi)[:, 2]
    assert abs(cos_t.mean() - g) < 0.02
    # sampled pdf equals analytic value at sampled angles
    p_ref = np.asarray(med.hg_p(jnp.float32(g), jnp.asarray(cos_t)))
    assert np.allclose(np.asarray(pdf), p_ref, rtol=1e-3, atol=1e-5)


def test_homogeneous_transmittance():
    m = med.make_homogeneous(np.full(31, 0.5), np.full(31, 1.0))
    o = jnp.zeros((4, 3))
    d = jnp.asarray([[0, 0, 1.0]] * 4)
    tmax = jnp.asarray([0.0, 0.5, 1.0, 2.0])
    tr = np.asarray(med.transmittance(m, o, d, tmax,
                                      jnp.zeros(4, jnp.uint32),
                                      jnp.zeros(4, jnp.uint32), 0))
    expected = np.exp(-1.5 * np.asarray([0.0, 0.5, 1.0, 2.0]))
    assert np.allclose(tr[:, 0], expected, atol=1e-5)


def test_homogeneous_distance_sampling_unbiased():
    """E[weight * indicator] estimates of Tr and scattering integrals."""
    sigma_a, sigma_s = 0.3, 0.7
    m = med.make_homogeneous(np.full(31, sigma_a), np.full(31, sigma_s))
    B = 50000
    o = jnp.zeros((B, 3))
    d = jnp.asarray([[0, 0, 1.0]] * B)
    tmax = jnp.full(B, 1.0)
    pid = jnp.arange(B, dtype=jnp.uint32)
    t, inter, w = med.sample_distance(m, o, d, tmax, pid,
                                      jnp.zeros(B, jnp.uint32), 7)
    w = np.asarray(w)[:, 0]
    inter = np.asarray(inter)
    # surface estimator: E[w | !interact]*P = Tr(1)
    est_tr = np.where(~inter, w, 0).mean()
    assert abs(est_tr - np.exp(-1.0)) < 0.01
    # scattering estimator: E[w] over interactions = int sigma_s Tr dt
    expected = sigma_s / 1.0 * (1 - np.exp(-1.0))
    est_sc = np.where(inter, w, 0).mean()
    assert abs(est_sc - expected) < 0.01, (est_sc, expected)


def test_grid_tracking_matches_analytic():
    """Uniform-density grid must reproduce the homogeneous solution."""
    dens = np.full((4, 4, 4), 1.0, np.float32)
    m2w = np.eye(4)
    m2w[0, 0] = m2w[1, 1] = m2w[2, 2] = 10.0   # 10-unit cube
    m2w[:3, 3] = [-5, -5, 0]
    m = med.make_grid(np.full(31, 0.4), np.full(31, 0.6), 0.0, dens, m2w)
    B = 40000
    # ray through the grid center (x=y=0); note the reference's trilinear
    # lookup tapers density near boundaries (0 outside), so the expected
    # optical depth integrates the actual interpolated density
    o = jnp.zeros((B, 3))
    d = jnp.asarray([[0, 0, 1.0]] * B)
    pid = jnp.arange(B, dtype=jnp.uint32)
    zs = np.linspace(0, 2.0, 401)
    pts = jnp.asarray(np.stack([np.zeros_like(zs),
                                np.zeros_like(zs), zs], -1), jnp.float32)
    rho = np.asarray(med.density_at(m, pts))
    tau2 = 1.0 * np.trapezoid(rho, zs)          # sigma_t = 1.0
    tr = np.asarray(med.transmittance(m, o, d, jnp.full(B, 2.0), pid,
                                      jnp.zeros(B, jnp.uint32), 3))[:, 0]
    assert abs(tr.mean() - np.exp(-tau2)) < 0.01, (tr.mean(), np.exp(-tau2))
    # delta-tracking interaction probability over 3 units
    zs3 = np.linspace(0, 3.0, 601)
    pts3 = jnp.asarray(np.stack([np.zeros_like(zs3),
                                 np.zeros_like(zs3), zs3], -1),
                       jnp.float32)
    tau3 = 1.0 * np.trapezoid(np.asarray(med.density_at(m, pts3)), zs3)
    t, inter, w = med.sample_distance(m, o, d, jnp.full(B, 3.0), pid,
                                      jnp.zeros(B, jnp.uint32), 11)
    p_inter = np.asarray(inter).mean()
    assert abs(p_inter - (1 - np.exp(-tau3))) < 0.01, (p_inter,
                                                       1 - np.exp(-tau3))


def test_volpath_fog_dims_image():
    """A homogeneous absorbing fog must dim a lit wall by ~Tr."""
    from pbrt_tpu.scene.ir import SceneBuilder, MaterialSpec
    from pbrt_tpu.core import transform as tfm
    from pbrt_tpu.cameras import projective
    from pbrt_tpu.film import film as filmmod
    from pbrt_tpu.integrators import path as pathint
    from pbrt_tpu.integrators import volpath
    from pbrt_tpu.samplers.samplers import SamplerConfig
    b = SceneBuilder()
    black = b.add_material(MaterialSpec())
    li = b.add_area_light(np.full(31, 5.0, np.float32))
    b.add_triangle_mesh([[-5, -5, 4], [5, -5, 4], [5, 5, 4], [-5, 5, 4]],
                        [[0, 2, 1], [2, 0, 3]], black, light_id=li)
    scene = b.build()
    cam = projective.make_perspective(
        tfm.look_at([0, 0, 0], [0, 0, 4], [0, 1, 0]), 40.0, 12, 12)
    cfg = SamplerConfig("sobol", 0, 16)
    sigma_a = 0.2
    m = med.make_homogeneous(np.full(31, sigma_a), np.zeros(31))
    tr_fn = volpath.make_trace_volpath_medium(m)
    f1 = pathint.render(scene, cam, filmmod.make_film(12, 12), cfg,
                        spp=16, max_depth=2, trace_fn=tr_fn)
    img = np.asarray(filmmod.develop_spectral(f1))
    center = img[5:7, 5:7].mean()
    # emissive wall at distance 4 through fog: Le * exp(-0.2*4)
    expected = 5.0 * np.exp(-sigma_a * 4.0)
    assert abs(center - expected) / expected < 0.05, (center, expected)


def test_named_medium_preset():
    """MakeNamedMedium "preset" loads measured scattering data (medium
    .cpp:181 GetMediumScatteringProperties); explicit sigma_* override."""
    import numpy as np
    from pbrt_tpu.parser.api import PbrtAPI
    from pbrt_tpu.integrators.volpath import build_medium_from_job
    base = """
Film "image" "integer xresolution" [8] "integer yresolution" [8]
MakeNamedMedium "goo" "string type" "homogeneous" %s
WorldBegin
Shape "sphere" "float radius" [1]
WorldEnd
"""
    job_p = PbrtAPI().parse_string(base % '"string preset" "Skin1"')
    med_p = build_medium_from_job(job_p)
    job_d = PbrtAPI().parse_string(base % '')
    med_d = build_medium_from_job(job_d)
    sa_p = np.asarray(med_p.sigma_a)
    sa_d = np.asarray(med_d.sigma_a)
    assert not np.allclose(sa_p, sa_d)       # preset changed the default
    assert sa_p.min() >= 0 and np.isfinite(sa_p).all()
    # explicit sigma_a wins over the preset
    job_o = PbrtAPI().parse_string(
        base % ('"string preset" "Skin1" "color sigma_a" [9 9 9]'))
    sa_o = np.asarray(build_medium_from_job(job_o).sigma_a)
    assert sa_o.mean() > 5.0
