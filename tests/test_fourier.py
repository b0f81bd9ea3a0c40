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


def test_sampler_pdf_consistency_and_albedo(tmp_path):
    """sample_grid draws must carry exactly the density pdf_grid reports,
    and the importance-sampled reflectance estimate must hit RHO."""
    tab = fourier.read_bsdf(_lambertian_table(tmp_path))
    grid_np = fourier.bake_grid(tab, n_mu=48, n_phi=16)
    grid = jnp.asarray(grid_np)
    a0_np, lum_np = fourier.bake_cr_tables(grid_np)
    a0, lum = jnp.asarray(a0_np), jnp.asarray(lum_np)
    B = 200_000
    rs = np.random.RandomState(1)
    wo = jnp.broadcast_to(jnp.asarray([0.25, 0.0, 0.968]), (B, 3))
    us = jnp.asarray(rs.rand(B).astype(np.float32))
    u1 = jnp.asarray(rs.rand(B).astype(np.float32))
    u2 = jnp.asarray(rs.rand(B).astype(np.float32))
    wi = fourier.sample_grid_cr(a0, lum, wo, us, u1, u2)
    assert np.allclose(np.linalg.norm(np.asarray(wi), axis=-1), 1.0,
                       atol=1e-5)
    pdf = np.asarray(fourier.pdf_grid_cr(a0, lum, wo, wi))
    assert (pdf > 0).all()
    f = np.asarray(fourier.eval_grid(grid, wo, wi))[:, 0]
    cos_i = np.abs(np.asarray(wi)[:, 2])
    albedo = (f * cos_i / pdf).mean()
    assert abs(albedo - RHO) < 0.05, albedo
    # the sampler should concentrate where f*cos is: reflection side
    assert (np.asarray(wi)[:, 2] > 0).mean() > 0.95


def test_sample_f_dispatch_uses_cdfs(tmp_path):
    """Through bsdf.sample_f, fourier lanes must return (f, pdf) that
    match eval_f/pdf_f (MIS consistency) and land a RHO-ish albedo."""
    from pbrt_tpu.materials import bsdf
    from pbrt_tpu.scene import ir as irmod
    tab = fourier.read_bsdf(_lambertian_table(tmp_path))
    grid_np = fourier.bake_grid(tab, n_mu=48, n_phi=16)
    a0_np, lum_np = fourier.bake_cr_tables(grid_np)
    B = 65536
    rs = np.random.RandomState(2)
    z31 = jnp.zeros((B, 31))
    p = bsdf.MaterialParams(
        type=jnp.full(B, irmod.MAT_FOURIER, jnp.int32),
        kd=z31, ks=z31, kr=z31, kt=z31,
        rough_u=jnp.zeros(B), rough_v=jnp.zeros(B),
        eta=jnp.ones(B), eta_spec=z31 + 1.0, k_spec=z31,
        sigma=jnp.zeros(B), opacity=z31 + 1.0,
        fourier_grid=jnp.asarray(grid_np)[None],
        fourier_id=jnp.zeros(B, jnp.int32),
        fourier_a0=jnp.asarray(a0_np)[None],
        fourier_lum=jnp.asarray(lum_np)[None],
        families=(irmod.MAT_FOURIER,))
    wo = jnp.broadcast_to(jnp.asarray([0.25, 0.0, 0.968]), (B, 3))
    us = jnp.asarray(rs.rand(B).astype(np.float32))
    u1 = jnp.asarray(rs.rand(B).astype(np.float32))
    u2 = jnp.asarray(rs.rand(B).astype(np.float32))
    wi, f, pdf, is_spec, trans, eta_fac = bsdf.sample_f(p, wo, us, u1, u2)
    ok = np.asarray(pdf) > 1e-9
    assert ok.mean() > 0.95
    f2 = np.asarray(bsdf.eval_f(p, wo, wi))
    pdf2 = np.asarray(bsdf.pdf_f(p, wo, wi))
    assert np.allclose(np.asarray(f)[ok], f2[ok], rtol=1e-4, atol=1e-6)
    assert np.allclose(np.asarray(pdf)[ok], pdf2[ok], rtol=1e-4, atol=1e-6)
    est = (np.asarray(f)[:, 0] * np.abs(np.asarray(wi)[:, 2])
           / np.maximum(np.asarray(pdf), 1e-12))[ok].mean()
    assert abs(est - RHO) < 0.05, est


def test_cr_sampling_chi2_coarse_grid(tmp_path):
    """VERDICT r4 item 6: at a COARSE lattice the sampler's empirical
    distribution must match the Catmull-Rom interpolated density (the
    reference's SampleCatmullRom2D semantics, interpolation.cpp:172-256)
    — a piecewise-constant cell sampler fails this chi-square check.

    Bins muI at 3x the lattice resolution so sub-cell shape is tested:
    the CR density varies INSIDE cells; cell-constant sampling is flat
    there."""
    tab = fourier.read_bsdf(_lambertian_table(tmp_path))
    grid_np = fourier.bake_grid(tab, n_mu=12, n_phi=8)    # coarse
    a0_np, lum_np = fourier.bake_cr_tables(grid_np)
    a0, lum = jnp.asarray(a0_np), jnp.asarray(lum_np)
    B = 300_000
    rs = np.random.RandomState(7)
    wo = jnp.broadcast_to(jnp.asarray([0.25, 0.0, 0.968]), (B, 3))
    us = jnp.asarray(rs.rand(B).astype(np.float32))
    u1 = jnp.asarray(rs.rand(B).astype(np.float32))
    u2 = jnp.asarray(rs.rand(B).astype(np.float32))
    wi = np.asarray(fourier.sample_grid_cr(a0, lum, wo, us, u1, u2))
    mu = -wi[:, 2]
    nb = (12 - 1) * 3
    hist, edges = np.histogram(mu, bins=nb, range=(-1, 1), density=True)
    cent = 0.5 * (edges[:-1] + edges[1:])
    # expected marginal density in mu from the CR interpolant of a0
    nm = a0_np.shape[0]
    xo = (0.968 + 1.0) * 0.5 * (nm - 1)
    o_off, o_w = fourier._cr_weights_uniform(
        jnp.full((1,), xo, jnp.float32), nm)
    rows = jnp.asarray(a0_np).T[fourier._cr_taps(o_off, nm)]
    F_mu = np.asarray(jnp.einsum('bk,bkn->bn', o_w, rows))[0]
    xq = (cent + 1.0) * 0.5 * (nm - 1)
    fv, tot = fourier._cr_eval_1d(
        jnp.tile(jnp.asarray(F_mu)[None], (nb, 1)),
        jnp.asarray(xq, jnp.float32))
    h_mu = 2.0 / (nm - 1)
    want = np.asarray(fv) / (np.asarray(tot) * h_mu)
    m = want > 0.05 * want.max()
    chi2 = np.sum((hist[m] - want[m]) ** 2 / np.maximum(want[m], 1e-9))
    # dof ~ bins; chi2/dof should be O(MC noise) << cell-constant error
    assert chi2 / m.sum() < 0.02, chi2 / m.sum()
