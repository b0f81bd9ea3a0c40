"""Hair BSDF — the Chiang et al. 2016 model as implemented by the
reference (materials/hair.{h,cpp}, 525+100 LoC): longitudinal lobes Mp
(von Mises-Fisher-like, modified Bessel form), azimuthal lobes Np
(trimmed logistic around the perfect-specular azimuth Phi(p)), and
attenuations Ap (Fresnel at entry, absorption along internal segments),
for p = 0 (R), 1 (TT), 2 (TRT) and a residual lobe aggregating p>=3.

Everything is batched jnp over SoA inputs; directions live in the hair
frame: +x along the fiber tangent, (y,z) the normal plane, and h in
[-1,1] is the normal-plane offset at which the ray crosses the fiber
(curves provide v across the width, h = 2v - 1).

Parameter conversions follow hair.cpp: beta_m/beta_n -> per-lobe
variance v[p] and logistic scale s; sigma_a from color via the
inverse-mapping of Chiang's fit; alpha scale tilts applied to lobe 0-2.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pbrt_tpu.core import sampling

PI = np.pi
P_MAX = 3
SQRT_PI_OVER_8 = 0.626657069


# ---------------------------------------------------------------------------
# parameter conversions (hair.cpp:58-92, HairMaterial::ComputeScattering)
# ---------------------------------------------------------------------------

def beta_m_to_v(beta_m):
    """Longitudinal roughness -> lobe variances [P_MAX+1] (hair.cpp:258)."""
    v0 = (0.726 * beta_m + 0.812 * beta_m ** 2
          + 3.7 * beta_m ** 20) ** 2
    return jnp.stack([v0, 0.25 * v0, 4.0 * v0, 4.0 * v0], -1)


def beta_n_to_s(beta_n):
    """Azimuthal roughness -> logistic scale (hair.cpp:269)."""
    return SQRT_PI_OVER_8 * (0.265 * beta_n + 1.194 * beta_n ** 2
                             + 5.372 * beta_n ** 22)


def sigma_a_from_reflectance(c, beta_n):
    """Absorption from color (hair.cpp SigmaAFromReflectance:672)."""
    c = jnp.clip(c, 1e-4, 1.0)
    denom = (5.969 - 0.215 * beta_n + 2.532 * beta_n ** 2
             - 10.73 * beta_n ** 3 + 5.574 * beta_n ** 4
             + 0.245 * beta_n ** 5)
    return (jnp.log(c) / denom[..., None]) ** 2


def sigma_a_from_concentration(ce, cp):
    """Melanin concentrations -> sigma_a RGB (hair.cpp:683)."""
    eumelanin = jnp.asarray([0.419, 0.697, 1.37])
    pheomelanin = jnp.asarray([0.187, 0.4, 1.05])
    return ce[..., None] * eumelanin + cp[..., None] * pheomelanin


# ---------------------------------------------------------------------------
# longitudinal lobe Mp (hair.cpp:100-121)
# ---------------------------------------------------------------------------

def _log_i0(x):
    x = jnp.abs(x)
    big = x > 12.0
    # small: series; large: asymptotic log(I0) ~ x - .5 log(2 pi x)
    small = jnp.log(_i0(jnp.minimum(x, 12.0)))
    large = x + 0.5 * (-jnp.log(2 * PI) + jnp.log(1.0 / jnp.maximum(x, 1e-6))
                       + 1.0 / jnp.maximum(8 * x, 1e-6))
    return jnp.where(big, large, small)


def _i0(x):
    """Modified Bessel I0, 10-term series (hair.cpp:86-97)."""
    val = jnp.zeros_like(x)
    x2i = jnp.ones_like(x)
    ifact = 1.0
    for i in range(10):
        if i > 0:
            ifact *= i
        val = val + x2i / (ifact * ifact)
        x2i = x2i * 0.25 * x * x
    return val


def mp(cos_ti, cos_to, sin_ti, sin_to, v):
    """Longitudinal scattering density in theta_i (hair.cpp:103-114)."""
    v = jnp.maximum(v, 1e-5)
    a = cos_ti * cos_to / v
    b = sin_ti * sin_to / v
    stable = (jnp.exp(_log_i0(a) - b - 1.0 / v + 0.6931
                      + jnp.log(1.0 / (2.0 * v))))
    direct = (jnp.exp(-b) * _i0(a)
              / (2.0 * v * jnp.sinh(1.0 / jnp.maximum(v, 1e-5))))
    return jnp.where(v <= 0.1, stable, direct)


# ---------------------------------------------------------------------------
# azimuthal lobe Np (hair.cpp:123-166)
# ---------------------------------------------------------------------------

def _logistic(x, s):
    x = jnp.abs(x)
    e = jnp.exp(-x / s)
    return e / (s * (1.0 + e) ** 2)


def _logistic_cdf(x, s):
    return 1.0 / (1.0 + jnp.exp(-x / s))


def trimmed_logistic(x, s, a, b):
    return _logistic(x, s) / (_logistic_cdf(b, s) - _logistic_cdf(a, s))


def _phi(p, gamma_o, gamma_t):
    return 2.0 * p * gamma_t - 2.0 * gamma_o + p * PI


def np_lobe(phi, p, s, gamma_o, gamma_t):
    """Azimuthal density around the specular azimuth of lobe p
    (hair.cpp:158-166) — wrapped to (-pi, pi]."""
    dphi = phi - _phi(p, gamma_o, gamma_t)
    dphi = jnp.remainder(dphi + PI, 2 * PI) - PI
    return trimmed_logistic(dphi, s, -PI, PI)


def sample_trimmed_logistic(u, s, a, b):
    """Inverse-CDF sample of the trimmed logistic (hair.cpp:183-190)."""
    k = _logistic_cdf(b, s) - _logistic_cdf(a, s)
    x = -s * jnp.log(1.0 / jnp.clip(u * k + _logistic_cdf(a, s),
                                    1e-6, 1 - 1e-6) - 1.0)
    return jnp.clip(x, a, b)


# ---------------------------------------------------------------------------
# attenuation Ap (hair.cpp:128-156) — spectral [.., N_SPECTRA]
# ---------------------------------------------------------------------------

def _fr_dielectric(cos_i, eta):
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin2_t = jnp.maximum(0.0, (1.0 - cos_i ** 2)) / eta ** 2
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 1e-14))
    r_par = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-6)
    r_perp = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-6)
    f = 0.5 * (r_par ** 2 + r_perp ** 2)
    return jnp.where(tir, 1.0, f)


def ap(cos_to, eta, h, T):
    """Per-lobe attenuations [..., P_MAX+1, S] (hair.cpp:128-147).
    T is the single-segment transmittance spectrum [..., S]."""
    cos_go = jnp.sqrt(jnp.maximum(1.0 - h * h, 1e-14))
    cos_t = cos_to * cos_go          # full angle at the entry interface
    f = _fr_dielectric(cos_t, eta)[..., None]
    a0 = jnp.broadcast_to(f, T.shape)
    a1 = (1.0 - f) ** 2 * T
    a2 = a1 * T * f
    # residual lobe: geometric series tail  a2 * f T / (1 - f T)
    a3 = a2 * f * T / jnp.maximum(1.0 - f * T, 1e-4)
    return jnp.stack([a0, a1, a2, a3], -2)


# ---------------------------------------------------------------------------
# full BSDF
# ---------------------------------------------------------------------------

def _dir_angles(w):
    """(sin_theta, cos_theta, phi) with x = fiber axis (hair.h frame)."""
    sin_t = jnp.clip(w[..., 0], -1.0, 1.0)
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t ** 2, 1e-14))
    phi = jnp.arctan2(w[..., 2], w[..., 1])
    return sin_t, cos_t, phi


def _tilted(sin_to, cos_to, p, alpha):
    """Apply the scale-tilt 2^p alpha rotation of lobe p (hair.cpp:337)."""
    shift = {0: -2.0, 1: 1.0, 2: 4.0}[p] * alpha
    s, c = jnp.sin(shift), jnp.cos(shift)
    sin_p = sin_to * c + cos_to * s
    cos_p = jnp.abs(cos_to * c - sin_to * s)
    return sin_p, cos_p


def hair_eval(wo, wi, h, sigma_a, eta=1.55, beta_m=0.3, beta_n=0.3,
              alpha=2.0 * PI / 180):
    """f(wo,wi) [..., S] in the hair frame (hair.cpp HairBSDF::f:288)."""
    sin_to, cos_to, phi_o = _dir_angles(wo)
    sin_ti, cos_ti, phi_i = _dir_angles(wi)
    phi = phi_i - phi_o

    etap = jnp.sqrt(jnp.maximum(eta ** 2 - sin_to ** 2, 1e-6)) \
        / jnp.maximum(cos_to, 1e-6)
    sin_gt = jnp.clip(h / etap, -1.0, 1.0)
    cos_gt = jnp.sqrt(jnp.maximum(1.0 - sin_gt ** 2, 1e-14))
    gamma_o = jnp.arcsin(jnp.clip(h, -1.0, 1.0))
    gamma_t = jnp.arcsin(sin_gt)
    # refracted longitudinal angle for the absorption path length
    sin_tt = sin_to / eta
    cos_tt = jnp.sqrt(jnp.maximum(1.0 - sin_tt ** 2, 1e-14))
    T = jnp.exp(-sigma_a * (2.0 * cos_gt
                            / jnp.maximum(cos_tt, 1e-4))[..., None])
    v = beta_m_to_v(beta_m)
    s = beta_n_to_s(beta_n)
    a = ap(cos_to, eta, h, T)                       # [...,4,S]
    f = jnp.zeros_like(T)
    for p in range(P_MAX):
        sin_tp, cos_tp = _tilted(sin_to, cos_to, p, alpha)
        m = mp(cos_ti, cos_tp, sin_ti, sin_tp, v[..., p])
        n = np_lobe(phi, p, s, gamma_o, gamma_t)
        f = f + (m * n)[..., None] * a[..., p, :]
    # residual lobe: uniform azimuth
    m3 = mp(cos_ti, cos_to, sin_ti, sin_to, v[..., P_MAX])
    f = f + (m3 / (2.0 * PI))[..., None] * a[..., P_MAX, :]
    return f / jnp.maximum(jnp.abs(wi[..., 2]), 1e-4)[..., None]


def _ap_pdf(cos_to, eta, h, T):
    """Lobe-selection pdf from luminance-averaged Ap (hair.cpp:351)."""
    a = ap(cos_to, eta, h, T).mean(-1)              # [...,4]
    return a / jnp.maximum(a.sum(-1, keepdims=True), 1e-9)


def hair_pdf(wo, wi, h, sigma_a, eta=1.55, beta_m=0.3, beta_n=0.3,
             alpha=2.0 * PI / 180):
    """Solid-angle pdf of hair_sample (hair.cpp HairBSDF::Pdf:465)."""
    sin_to, cos_to, phi_o = _dir_angles(wo)
    sin_ti, cos_ti, phi_i = _dir_angles(wi)
    phi = phi_i - phi_o
    etap = jnp.sqrt(jnp.maximum(eta ** 2 - sin_to ** 2, 1e-6)) \
        / jnp.maximum(cos_to, 1e-6)
    sin_gt = jnp.clip(h / etap, -1.0, 1.0)
    cos_gt = jnp.sqrt(jnp.maximum(1.0 - sin_gt ** 2, 1e-14))
    gamma_o = jnp.arcsin(jnp.clip(h, -1.0, 1.0))
    gamma_t = jnp.arcsin(sin_gt)
    sin_tt = sin_to / eta
    cos_tt = jnp.sqrt(jnp.maximum(1.0 - sin_tt ** 2, 1e-14))
    T = jnp.exp(-sigma_a * (2.0 * cos_gt
                            / jnp.maximum(cos_tt, 1e-4))[..., None])
    v = beta_m_to_v(beta_m)
    s = beta_n_to_s(beta_n)
    apdf = _ap_pdf(cos_to, eta, h, T)
    pdf = jnp.zeros_like(cos_to)
    for p in range(P_MAX):
        sin_tp, cos_tp = _tilted(sin_to, cos_to, p, alpha)
        m = mp(cos_ti, cos_tp, sin_ti, sin_tp, v[..., p])
        n = np_lobe(phi, p, s, gamma_o, gamma_t)
        pdf = pdf + m * n * apdf[..., p]
    m3 = mp(cos_ti, cos_to, sin_ti, sin_to, v[..., P_MAX])
    pdf = pdf + m3 / (2.0 * PI) * apdf[..., P_MAX]
    return pdf


def hair_sample(wo, h, sigma_a, u, eta=1.55, beta_m=0.3, beta_n=0.3,
                alpha=2.0 * PI / 180):
    """Importance-sample wi (hair.cpp HairBSDF::Sample_f:389).

    u: [..., 4] uniforms (lobe select, theta x2, phi).
    Returns (wi, f, pdf).
    """
    sin_to, cos_to, phi_o = _dir_angles(wo)
    etap = jnp.sqrt(jnp.maximum(eta ** 2 - sin_to ** 2, 1e-6)) \
        / jnp.maximum(cos_to, 1e-6)
    sin_gt = jnp.clip(h / etap, -1.0, 1.0)
    cos_gt = jnp.sqrt(jnp.maximum(1.0 - sin_gt ** 2, 1e-14))
    gamma_o = jnp.arcsin(jnp.clip(h, -1.0, 1.0))
    gamma_t = jnp.arcsin(sin_gt)
    sin_tt = sin_to / eta
    cos_tt = jnp.sqrt(jnp.maximum(1.0 - sin_tt ** 2, 1e-14))
    T = jnp.exp(-sigma_a * (2.0 * cos_gt
                            / jnp.maximum(cos_tt, 1e-4))[..., None])
    v = beta_m_to_v(beta_m)
    s = beta_n_to_s(beta_n)
    apdf = _ap_pdf(cos_to, eta, h, T)               # [...,4]
    cdf = jnp.cumsum(apdf, -1)
    p_sel = (u[..., 0:1] > cdf).sum(-1)             # [...]: 0..3

    # gather per-lane tilted angles and variance for the chosen lobe
    sin_tps, cos_tps = [], []
    for p in range(P_MAX):
        a_, b_ = _tilted(sin_to, cos_to, p, alpha)
        sin_tps.append(a_)
        cos_tps.append(b_)
    sin_tps.append(sin_to)
    cos_tps.append(cos_to)
    sel = [p_sel == 0, p_sel == 1, p_sel == 2]
    sin_tp = jnp.select(sel, sin_tps[:3], sin_tps[3])
    cos_tp = jnp.select(sel, cos_tps[:3], cos_tps[3])
    v_b = jnp.broadcast_to(v, p_sel.shape + (P_MAX + 1,))
    vp = jnp.take_along_axis(v_b, p_sel[..., None], -1)[..., 0]

    # longitudinal sample (hair.cpp:414-422)
    u0 = jnp.clip(u[..., 1], 1e-5, 1.0)
    cos_theta = 1.0 + vp * jnp.log(
        u0 + (1.0 - u0) * jnp.exp(-2.0 / jnp.maximum(vp, 1e-5)))
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta ** 2, 1e-14))
    cos_phi_l = jnp.cos(2.0 * PI * u[..., 2])
    sin_ti = -cos_theta * sin_tp + sin_theta * cos_phi_l * cos_tp
    cos_ti = jnp.sqrt(jnp.maximum(1.0 - sin_ti ** 2, 1e-14))

    # azimuthal sample
    dphi_peak = _phi(p_sel.astype(jnp.float32), gamma_o, gamma_t)
    dphi_smp = sample_trimmed_logistic(u[..., 3], s, -PI, PI)
    dphi = jnp.where(p_sel < P_MAX, dphi_peak + dphi_smp,
                     2.0 * PI * u[..., 3])
    phi_i = phi_o + dphi
    wi = jnp.stack([sin_ti, cos_ti * jnp.cos(phi_i),
                    cos_ti * jnp.sin(phi_i)], -1)
    f = hair_eval(wo, wi, h, sigma_a, eta, beta_m, beta_n, alpha)
    pdf = hair_pdf(wo, wi, h, sigma_a, eta, beta_m, beta_n, alpha)
    return wi, f, pdf
