"""BSSRDF beam-diffusion precompute tests (reference core/bssrdf.cpp)."""
import numpy as np
import pytest

from pbrt_tpu.materials import bssrdf


def test_fresnel_moments_continuous_at_one():
    # eta -> 1: no interface, both moments ~ 0; the two polynomial
    # branches must agree at the seam
    assert abs(bssrdf.fresnel_moment1(1.0)) < 0.01
    lo = bssrdf.fresnel_moment1(0.999)
    hi = bssrdf.fresnel_moment1(1.001)
    assert abs(lo - hi) < 0.02
    assert 0.1 < bssrdf.fresnel_moment1(1.33) < 0.3   # water-ish


def test_profile_table_shape_and_positivity():
    t = bssrdf.compute_beam_diffusion_bssrdf(g=0.0, eta=1.33,
                                             n_rho=32, n_radius=64)
    assert t["profile"].shape == (32, 64)
    assert (t["profile"] >= 0).all()
    assert np.isfinite(t["profile"]).all()
    # profile (incl. 2 pi r) decays to ~0 at the largest radii
    assert t["profile"][:, -1].max() < 1e-3 * max(t["profile"].max(), 1e-9)


def test_rho_eff_monotone():
    t = bssrdf.compute_beam_diffusion_bssrdf(g=0.0, eta=1.33,
                                             n_rho=32, n_radius=48)
    re = t["rho_eff"]
    assert (np.diff(re) >= -1e-6).all()      # monotone in albedo
    assert re[0] < 0.02                      # black stays black
    assert re[-1] > 0.5                      # bright albedo reflects
    assert re[-1] <= 1.2                     # bounded (energy-ish)


def test_subsurface_from_diffuse_roundtrip():
    t = bssrdf.compute_beam_diffusion_bssrdf(g=0.0, eta=1.33,
                                             n_rho=64, n_radius=48)
    target = np.array([0.2, 0.5, 0.62])
    mfp = np.array([1.0, 1.2, 0.8])
    sa, ss = bssrdf.subsurface_from_diffuse(t, target, mfp)
    assert (sa > 0).all() and (ss > 0).all()
    # re-derive rho_eff from the recovered single-scatter albedo
    rho = ss / (ss + sa)
    re = np.interp(rho, t["rho"], t["rho_eff"])
    assert np.allclose(re, target, atol=0.03), re


def test_sr_sampling_matches_profile():
    """Radii sampled from the CDF reproduce the profile's mean radius."""
    t = bssrdf.compute_beam_diffusion_bssrdf(g=0.0, eta=1.33,
                                             n_rho=32, n_radius=48)
    rho = 0.8
    u = (np.arange(4096) + 0.5) / 4096
    r = bssrdf.sample_sr(t, np.full_like(u, rho), u)
    assert (r >= 0).all() and (r <= t["radius"][-1]).all()
    # analytic mean radius from the tabulated density
    ri = int(np.interp(rho, t["rho"], np.arange(len(t["rho"]))))
    prof = t["profile"][ri]
    rad = t["radius"]
    w = 0.5 * (prof[1:] + prof[:-1]) * np.diff(rad)
    mean_ref = (0.5 * (rad[1:] + rad[:-1]) * w).sum() / w.sum()
    assert abs(r.mean() - mean_ref) / mean_ref < 0.1, (r.mean(), mean_ref)


def test_eval_sr_positive_and_decaying():
    t = bssrdf.compute_beam_diffusion_bssrdf(g=0.0, eta=1.33,
                                             n_rho=32, n_radius=48)
    rr = np.array([0.01, 0.1, 0.5, 2.0])
    v = bssrdf.eval_sr(t, np.full_like(rr, 0.7), rr)
    assert (v >= 0).all()
    assert v[0] > v[-1]                      # near-field dominates


def test_subsurface_material_parses_to_diffusion_albedo():
    """subsurface/kdsubsurface produce physically-derived diffuse
    response (far-field diffusion limit), not a flat matte."""
    from pbrt_tpu.parser.api import PbrtAPI
    from pbrt_tpu.core import spectrum as spec
    from pbrt_tpu.scene import ir
    import jax.numpy as jnp
    base = """
Film "image" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
Material %s
Shape "sphere" "float radius" [1]
WorldEnd
"""
    # named preset: skin is red-dominant in reflectance
    job = PbrtAPI().parse_string(base % '"subsurface" "string name" "Skin1"')
    s = job.scene
    mid = int(np.asarray(s.prim_material)[0])
    assert int(np.asarray(s.mat_type)[mid]) == ir.MAT_PLASTIC
    kd = np.asarray(s.mat_kd)[mid]
    rgb = np.asarray(spec.to_rgb(jnp.asarray(kd)))
    assert rgb[0] > rgb[1] > rgb[2] > 0, rgb     # skin: R > G > B
    assert rgb.max() <= 1.2
    # kdsubsurface: recovered albedo tracks the requested Kd
    job2 = PbrtAPI().parse_string(
        base % '"kdsubsurface" "color Kd" [0.6 0.3 0.1]')
    mid2 = int(np.asarray(job2.scene.prim_material)[0])
    kd2 = np.asarray(job2.scene.mat_kd)[mid2]
    rgb2 = np.asarray(spec.to_rgb(jnp.asarray(kd2)))
    assert rgb2[0] > rgb2[1] > rgb2[2], rgb2
    assert abs(rgb2[0] - 0.6) < 0.25, rgb2
