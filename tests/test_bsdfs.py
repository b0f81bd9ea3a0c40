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
