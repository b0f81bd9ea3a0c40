"""BSDF sampling/eval consistency (model: reference src/tests/bsdfs.cpp
chi-square frequency checks)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.materials import bsdf
from pbrt_tpu.scene import ir
from pbrt_tpu.core import geometry as geom


def _params(B, mtype, **kw):
    d = dict(
        type=jnp.full(B, mtype, jnp.int32),
        kd=jnp.full((B, 31), kw.get("kd", 0.6)),
        ks=jnp.full((B, 31), kw.get("ks", 0.4)),
        kr=jnp.full((B, 31), kw.get("kr", 1.0)),
        kt=jnp.full((B, 31), kw.get("kt", 1.0)),
        rough_u=jnp.full(B, kw.get("rough", 0.2)),
        rough_v=jnp.full(B, kw.get("rough", 0.2)),
        eta=jnp.full(B, kw.get("eta", 1.5)),
        eta_spec=jnp.full((B, 31), 0.2),
        k_spec=jnp.full((B, 31), 3.0),
        sigma=jnp.full(B, kw.get("sigma", 0.0)),
        opacity=jnp.ones((B, 31)),
        disney=jnp.broadcast_to(jnp.asarray(
            kw.get("disney", [0.0] * 8), jnp.float32), (B, 8)))
    if mtype == ir.MAT_SSW:
        # the Sw exit lobe needs its normalization factor (bssrdf.h:221)
        d["sss_c"] = jnp.maximum(1.0 - 2.0 * bsdf.fresnel_moment1_jnp(
            1.0 / d["eta"]), 1e-4)
    return bsdf.MaterialParams(**d)


# disney kw helper: [metallic, specTint, sheen, sheenTint, clearcoat,
#                    ccGloss, specTrans, anisotropic]
def _dz(**kw):
    v = [0.0, 0.0, 0.0, 0.5, 0.0, 1.0, 0.0, 0.0]
    keys = ["metallic", "spectint", "sheen", "sheentint", "clearcoat",
            "ccgloss", "spectrans", "aniso"]
    for k, val in kw.items():
        v[keys.index(k)] = val
    return v


WO = np.array([0.3, -0.2, 0.93])
WO = WO / np.linalg.norm(WO)


@pytest.mark.parametrize("mtype,kw", [
    (ir.MAT_MATTE, {}),
    (ir.MAT_MATTE, {"sigma": 20.0}),
    (ir.MAT_PLASTIC, {}),
    (ir.MAT_METAL, {}),
    (ir.MAT_SUBSTRATE, {}),
    (ir.MAT_TRANSLUCENT, {}),
    (ir.MAT_RETRO, {}),
    (ir.MAT_ROUGHGLASS, {"rough": 0.3}),
    (ir.MAT_SSW, {"eta": 1.33}),
    (ir.MAT_DISNEY, {}),
    (ir.MAT_DISNEY, {"disney": [1.0, 0.0, 0.0, 0.5, 0.0, 1.0, 0.0, 0.0]}),
    (ir.MAT_DISNEY, {"disney": [0.0, 0.5, 1.0, 0.5, 1.0, 0.8, 0.0, 0.0]}),
    (ir.MAT_DISNEY, {"rough": 0.3,
                     "disney": [0.0, 0.0, 0.0, 0.5, 0.0, 1.0, 0.9, 0.0]}),
])
def test_sample_eval_pdf_consistency(mtype, kw):
    """At sampled directions, f and pdf from sample_f must match eval_f
    and pdf_f (reference bsdfs.cpp:484-552 approach)."""
    B = 4096
    rs = np.random.RandomState(0)
    p = _params(B, mtype, **kw)
    wo = jnp.broadcast_to(jnp.asarray(WO, jnp.float32), (B, 3))
    u_lobe = jnp.asarray(rs.rand(B).astype(np.float32))
    u1 = jnp.asarray(rs.rand(B).astype(np.float32))
    u2 = jnp.asarray(rs.rand(B).astype(np.float32))
    wi, f, pdf, is_spec, trans, eta_fac = bsdf.sample_f(p, wo, u_lobe, u1, u2)
    ok = np.asarray(pdf) > 1e-6
    assert ok.mean() > 0.5, ok.mean()
    f2 = np.asarray(bsdf.eval_f(p, wo, wi))
    pdf2 = np.asarray(bsdf.pdf_f(p, wo, wi))
    assert np.allclose(np.asarray(f)[ok], f2[ok], rtol=1e-4, atol=1e-6)
    assert np.allclose(np.asarray(pdf)[ok], pdf2[ok], rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("mtype,kw,max_albedo", [
    (ir.MAT_MATTE, {"kd": 1.0}, 1.01),
    (ir.MAT_PLASTIC, {"kd": 0.5, "ks": 0.5}, 1.05),
    (ir.MAT_METAL, {}, 1.01),
    (ir.MAT_TRANSLUCENT, {"kd": 1.0, "kr": 0.5, "kt": 0.5}, 1.05),
    (ir.MAT_RETRO, {"kd": 0.5, "ks": 0.5}, 1.35),
    (ir.MAT_ROUGHGLASS, {"rough": 0.3}, 1.15),
    # Sw integrates to exactly 1 over the cosine hemisphere (that's
    # the c factor's purpose)
    (ir.MAT_SSW, {"eta": 1.33}, 1.02),
    (ir.MAT_DISNEY, {"kd": 1.0}, 1.15),
    (ir.MAT_DISNEY, {"kd": 1.0,
                     "disney": [1.0, 0.0, 0.0, 0.5, 0.0, 1.0, 0.0, 0.0]},
     1.1),
    (ir.MAT_DISNEY, {"kd": 1.0, "rough": 0.3,
                     "disney": [0.0, 0.0, 0.0, 0.5, 0.0, 1.0, 1.0, 0.0]},
     1.15),
])
def test_energy_conservation(mtype, kw, max_albedo):
    """MC hemispherical albedo E[f cos / pdf] stays bounded (white
    furnace; reference rho estimators, reflection.h)."""
    B = 65536
    rs = np.random.RandomState(1)
    p = _params(B, mtype, **kw)
    wo = jnp.broadcast_to(jnp.asarray(WO, jnp.float32), (B, 3))
    wi, f, pdf, _, _, _ = bsdf.sample_f(
        p, wo, jnp.asarray(rs.rand(B).astype(np.float32)),
        jnp.asarray(rs.rand(B).astype(np.float32)),
        jnp.asarray(rs.rand(B).astype(np.float32)))
    f = np.asarray(f)[:, 15]
    pdf = np.asarray(pdf)
    cos = np.abs(np.asarray(wi)[:, 2])
    est = np.where(pdf > 1e-6, f * cos / np.maximum(pdf, 1e-6), 0.0)
    albedo = est.mean()
    assert albedo < max_albedo, albedo
    assert albedo > 0.05, albedo


def test_matte_albedo_exact():
    """Lambertian hemispherical reflectance == kd exactly."""
    B = 100000
    rs = np.random.RandomState(2)
    p = _params(B, ir.MAT_MATTE, kd=0.73)
    wo = jnp.broadcast_to(jnp.asarray(WO, jnp.float32), (B, 3))
    wi, f, pdf, _, _, _ = bsdf.sample_f(
        p, wo, jnp.asarray(rs.rand(B).astype(np.float32)),
        jnp.asarray(rs.rand(B).astype(np.float32)),
        jnp.asarray(rs.rand(B).astype(np.float32)))
    est = (np.asarray(f)[:, 0] * np.abs(np.asarray(wi)[:, 2])
           / np.maximum(np.asarray(pdf), 1e-9)).mean()
    assert abs(est - 0.73) < 0.005, est


def test_retro_peaks_backward():
    """Fork retroreflective: f is largest when wi == wo."""
    B = 3
    p = _params(B, ir.MAT_RETRO, rough=0.1)
    wo = jnp.broadcast_to(jnp.asarray(WO, jnp.float32), (B, 3))
    wi_retro = wo
    wi_mirror = jnp.asarray([[-WO[0], -WO[1], WO[2]]] * B, jnp.float32)
    wi_up = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (B, 3))
    f_r = float(bsdf.eval_f(p, wo, wi_retro)[0, 15])
    f_m = float(bsdf.eval_f(p, wo, wi_mirror)[0, 15])
    f_u = float(bsdf.eval_f(p, wo, wi_up)[0, 15])
    assert f_r > 5 * f_m and f_r > 5 * f_u, (f_r, f_m, f_u)


def test_rough_glass_transmits():
    B = 8192
    rs = np.random.RandomState(3)
    p = _params(B, ir.MAT_ROUGHGLASS, rough=0.2)
    wo = jnp.broadcast_to(jnp.asarray(WO, jnp.float32), (B, 3))
    wi, f, pdf, _, trans, eta_fac = bsdf.sample_f(
        p, wo, jnp.asarray(rs.rand(B).astype(np.float32)),
        jnp.asarray(rs.rand(B).astype(np.float32)),
        jnp.asarray(rs.rand(B).astype(np.float32)))
    trans = np.asarray(trans)
    assert 0.2 < trans.mean() < 0.8       # both lobes exercised
    # transmitted rays have flipped hemisphere and eta_fac != 1
    assert (np.sign(np.asarray(wi)[trans, 2]) == -np.sign(WO[2])).all()
    assert (np.asarray(eta_fac)[trans] != 1.0).all()


def test_disney_lobes_behave():
    """metallic kills diffuse; sheen brightens grazing; clearcoat adds a
    mirror-direction peak (materials/disney.cpp lobe semantics)."""
    B = 1
    wo = jnp.broadcast_to(jnp.asarray(WO, jnp.float32), (B, 3))
    wi_mirror = jnp.asarray([[-WO[0], -WO[1], WO[2]]], jnp.float32)
    graze = np.array([0.995, 0.0, 0.1])
    wi_graze = jnp.asarray([graze / np.linalg.norm(graze)], jnp.float32)
    wi_up = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)

    base = _params(B, ir.MAT_DISNEY, kd=0.5, rough=0.05)
    metal = _params(B, ir.MAT_DISNEY, kd=0.5, rough=0.05,
                    disney=_dz(metallic=1.0))
    sheen = _params(B, ir.MAT_DISNEY, kd=0.5, rough=0.05,
                    disney=_dz(sheen=1.0))
    coat = _params(B, ir.MAT_DISNEY, kd=0.5, rough=0.05,
                   disney=_dz(clearcoat=1.0, ccgloss=1.0))

    # metallic=1 removes the diffuse floor away from the (tight)
    # specular peak — use a direction whose half-angle is ~38 degrees
    far = np.array([0.6, -0.4, 0.5])
    wi_far = jnp.asarray([far / np.linalg.norm(far)], jnp.float32)
    f_base_far = float(bsdf.eval_f(base, wo, wi_far)[0, 15])
    f_metal_far = float(bsdf.eval_f(metal, wo, wi_far)[0, 15])
    assert f_metal_far < 0.25 * f_base_far, (f_base_far, f_metal_far)

    # sheen adds energy at large half-vector angles; isolate it on a
    # black base (kd=0) where only the 0.04-dielectric spec remains
    wo_g = jnp.asarray([[0.9, 0.0, 0.436]], jnp.float32)
    wig = np.array([-0.85, 0.3, 0.43])
    wi_g = jnp.asarray([wig / np.linalg.norm(wig)], jnp.float32)
    base0 = _params(B, ir.MAT_DISNEY, kd=0.0, rough=0.05)
    sheen0 = _params(B, ir.MAT_DISNEY, kd=0.0, rough=0.05,
                     disney=_dz(sheen=1.0))
    f_b_g = float(bsdf.eval_f(base0, wo_g, wi_g)[0, 15])
    f_s_g = float(bsdf.eval_f(sheen0, wo_g, wi_g)[0, 15])
    assert f_s_g > 3.0 * max(f_b_g, 1e-6), (f_b_g, f_s_g)

    # clearcoat peaks at the mirror direction
    f_b_m = float(bsdf.eval_f(base, wo, wi_mirror)[0, 15])
    f_c_m = float(bsdf.eval_f(coat, wo, wi_mirror)[0, 15])
    assert f_c_m > 1.5 * f_b_m, (f_b_m, f_c_m)


def test_disney_spectrans_transmits():
    B = 8192
    rs = np.random.RandomState(5)
    p = _params(B, ir.MAT_DISNEY, kd=0.8, rough=0.2,
                disney=_dz(spectrans=0.9))
    wo = jnp.broadcast_to(jnp.asarray(WO, jnp.float32), (B, 3))
    wi, f, pdf, _, trans, eta_fac = bsdf.sample_f(
        p, wo, jnp.asarray(rs.rand(B).astype(np.float32)),
        jnp.asarray(rs.rand(B).astype(np.float32)),
        jnp.asarray(rs.rand(B).astype(np.float32)))
    trans = np.asarray(trans)
    assert trans.mean() > 0.1, trans.mean()
    assert (np.sign(np.asarray(wi)[trans, 2]) == -np.sign(WO[2])).all()
    assert (np.asarray(eta_fac)[trans] != 1.0).all()


# ---------------------------------------------------------------------------
# Beckmann distribution (reference: microfacet.h:80 + tests/bsdfs.cpp
# chi^2-style sample/pdf consistency)
# ---------------------------------------------------------------------------

def test_beckmann_d_normalizes():
    """Integral of D(wh) cos(wh) over the hemisphere is 1."""
    import numpy as np
    import jax.numpy as jnp
    from pbrt_tpu.materials import bsdf
    for alpha in (0.1, 0.4):
        n = 256
        th = (np.arange(n) + 0.5) * (np.pi / 2) / n
        ph = (np.arange(n) + 0.5) * (2 * np.pi) / n
        T, P = np.meshgrid(th, ph, indexing="ij")
        wh = jnp.asarray(np.stack([np.sin(T) * np.cos(P),
                                   np.sin(T) * np.sin(P),
                                   np.cos(T)], -1).reshape(-1, 3),
                         jnp.float32)
        d = np.asarray(bsdf.beckmann_d(wh, alpha, alpha))
        w = (np.cos(T) * np.sin(T)).reshape(-1)
        integral = (d * w).sum() * (np.pi / 2 / n) * (2 * np.pi / n)
        assert abs(integral - 1.0) < 2e-2, (alpha, integral)


def test_beckmann_sample_pdf_consistency():
    """Histogram of visible-NDF samples matches mf_pdf_wh (the bsdfs.cpp
    chi^2 test, binned-frequency form)."""
    import numpy as np
    import jax.numpy as jnp
    from pbrt_tpu.materials import bsdf
    rng = np.random.default_rng(3)
    N = 200_000
    alpha = 0.3
    wo = jnp.asarray(np.tile([0.45, 0.2, np.sqrt(1 - 0.45**2 - 0.2**2)],
                             (N, 1)), jnp.float32)
    u1 = jnp.asarray(rng.uniform(size=N), jnp.float32)
    u2 = jnp.asarray(rng.uniform(size=N), jnp.float32)
    wh = np.asarray(bsdf.beckmann_sample_wh(wo, u1, u2, alpha, alpha))
    beck = jnp.ones(1, bool)
    # bin over (cos_theta, phi)
    ct = np.clip(wh[:, 2], 0, 1)
    phi = np.mod(np.arctan2(wh[:, 1], wh[:, 0]), 2 * np.pi)
    nb = 12
    H, ce, pe = np.histogram2d(ct, phi, bins=nb,
                               range=[[0.7, 1.0], [0, 2 * np.pi]])
    freq = H / N
    # expected mass per bin from the pdf at bin centers
    cc = 0.5 * (ce[:-1] + ce[1:])
    pc = 0.5 * (pe[:-1] + pe[1:])
    CC, PC = np.meshgrid(cc, pc, indexing="ij")
    st = np.sqrt(1 - CC**2)
    whc = jnp.asarray(np.stack([st * np.cos(PC), st * np.sin(PC), CC],
                               -1).reshape(-1, 3), jnp.float32)
    wo1 = jnp.broadcast_to(wo[0], whc.shape)
    pdf = np.asarray(bsdf.mf_pdf_wh(wo1, whc, alpha, alpha,
                                    jnp.ones(whc.shape[0], bool)))
    dct = ce[1] - ce[0]
    dph = pe[1] - pe[0]
    expected = (pdf.reshape(nb, nb) * dct * dph)
    sig = expected > 5e-3
    rel = np.abs(freq - expected)[sig] / expected[sig]
    assert np.median(rel) < 0.08, np.median(rel)


def test_beckmann_material_renders_differently_from_ggx():
    """A plastic sphere with 'beckmann' vs 'ggx' distribution produces a
    different (but same-energy-scale) highlight."""
    import numpy as np
    import jax.numpy as jnp
    from pbrt_tpu.core import transform as tfm
    from pbrt_tpu.scene.ir import (SceneBuilder, MaterialSpec, MAT_MATTE,
                                   MAT_PLASTIC, PRIM_SPHERE)
    from pbrt_tpu.cameras import projective
    from pbrt_tpu.integrators import path as pathmod
    from pbrt_tpu.samplers.samplers import SamplerConfig

    def render(dist):
        b = SceneBuilder()
        blackm = b.add_material(MaterialSpec(type=MAT_MATTE))
        pl = b.add_material(MaterialSpec(
            type=MAT_PLASTIC, kd=np.full(31, .1, np.float32),
            ks=np.full(31, .8, np.float32), rough_u=0.15, rough_v=0.15,
            remap_roughness=False, distribution=dist))
        li = b.add_area_light(np.full(31, 30.0, np.float32))
        b.add_triangle_mesh([[-1, -1, 4], [1, -1, 4], [1, 1, 4],
                             [-1, 1, 4]], [[0, 2, 1], [0, 3, 2]],
                            blackm, light_id=li)
        b.add_quadric(PRIM_SPHERE, tfm.translate(0, 0, 0),
                      (1.0, -1.0, 1.0, 2 * np.pi), pl)
        scene = b.build()
        W = H = 24
        cam = projective.make_perspective(
            tfm.look_at([0, -4, 2], [0, 0, 0], [0, 0, 1]), 40.0, W, H)
        cfg = SamplerConfig(kind="sobol", seed=0, spp=8)
        pids = jnp.arange(W * H, dtype=jnp.uint32)
        acc = 0.0
        for s in range(8):
            ray, wt, pf, pid, sidx = pathmod.camera_rays_for_pixels(
                cam, W, H, cfg, pids, jnp.uint32(s),
                projective.generate_rays)
            L = pathmod.trace_paths(scene, ray, pid, sidx, cfg,
                                    max_depth=1)
            acc = acc + np.asarray(L * wt[:, None])
        return (acc / 8).sum(-1)

    g = render("ggx")
    bk = render("beckmann")
    assert abs(bk.sum() / g.sum() - 1.0) < 0.25      # same energy scale
    # tails differ: GGX has heavier off-peak falloff
    d = np.abs(g - bk) / np.maximum(g.max(), 1e-6)
    assert d.max() > 0.01, d.max()
