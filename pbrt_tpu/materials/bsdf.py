"""Vectorized spectral BSDFs with mask-based type dispatch.

Reference layer: src/core/reflection.{h,cpp} (BxDF lobes), src/core/
microfacet.{h,cpp} (Beckmann/GGX), src/materials/* (lobe assembly).
Instead of virtual BxDF objects allocated per-hit in an arena, every ray
carries a gathered material-parameter record and each material *type* is a
closed-form eval/sample/pdf computed under a lane mask — the wavefront
analog of pbrt's BSDF::Sample_f over <=8 lobes (reflection.h:153).

Conventions match the reference: shading frame with z = shading normal,
wo/wi point away from the surface, eval returns f (no cosine), sample
returns (wi, f, pdf, flags).  All spectra are [...,31].
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import sampling
from pbrt_tpu.scene import ir

INV_PI = sampling.INV_PI
PI = sampling.PI


@struct.dataclass
class MaterialParams:
    """Per-ray gathered material record."""
    type: jnp.ndarray        # [B]
    kd: jnp.ndarray          # [B,31]
    ks: jnp.ndarray
    kr: jnp.ndarray
    kt: jnp.ndarray
    rough_u: jnp.ndarray     # [B] (already alpha-remapped)
    rough_v: jnp.ndarray
    eta: jnp.ndarray         # [B]
    eta_spec: jnp.ndarray    # [B,31]
    k_spec: jnp.ndarray      # [B,31]
    sigma: jnp.ndarray       # [B]
    opacity: jnp.ndarray     # [B,31]
    # per-lane Beckmann selector ([B] bool; None => all-GGX scene and the
    # Beckmann paths compile away — scene.has_beckmann gate)
    beckmann: jnp.ndarray = None
    # disney lobe weights [B,8]: metallic, specTint, sheen, sheenTint,
    # clearcoat, ccGloss, specTrans, anisotropic (None => all zero)
    disney: jnp.ndarray = None
    # hair fiber offset h in [-1,1] (curve v across width; None => no
    # hair materials in the scene, all hair math statically skipped)
    hair_h: jnp.ndarray = None
    # fourier measured BSDFs: shared baked lattice [F,NM,NM,NP,3] and
    # per-lane grid index (None => statically skipped)
    fourier_grid: jnp.ndarray = None
    fourier_id: jnp.ndarray = None
    fourier_a0: jnp.ndarray = None
    fourier_lum: jnp.ndarray = None
    # tabulated BSSRDF (None => scene has no subsurface materials and
    # every sss branch is statically skipped): Sw normalization factor
    # c = 1 - 2*FresnelMoment1(1/eta) (bssrdf.h:221), profile-table id
    # and per-channel medium coefficients for the probe-relocation pass
    sss_c: jnp.ndarray = None        # [B]
    sss_tid: jnp.ndarray = None      # [B]
    sss_sigma_t: jnp.ndarray = None  # [B,31]
    sss_rho: jnp.ndarray = None      # [B,31]
    # static tuple of MAT_* tags present in the scene (None = all); the
    # dispatch below compiles only these lobe families
    families: tuple = struct.field(pytree_node=False, default=None)


def _present(families, *types):
    """Static check: is any of these material families in the scene?"""
    return families is None or any(t in families for t in types)


def bump_shading_normal(scene: ir.SceneData, material_idx, hit):
    """Perturb the shading normal by the bump-map height gradient
    (reference: Material::Bump, material.cpp:50+).  Finite differences of
    the bound float texture in uv; tangents from the shading frame."""
    if (scene.tex_type.shape[0] <= 1
            or not getattr(scene, "has_bump", True)):
        return hit.ns
    from pbrt_tpu.ops import fetch
    m = jnp.clip(material_idx, 0, scene.mat_type.shape[0] - 1)
    btex = jnp.round(fetch.fetch_rows(
        scene.mat_bump_tex, m)).astype(jnp.int32)
    from pbrt_tpu.textures.textures import eval_texture
    eps = 2e-3
    ss, ts = geom.coordinate_system(hit.ns)
    # world-space step matched to the scene scale so noise-family
    # (world-position) textures see a gradient too
    eps_w = 1e-3 * scene.world_radius

    def h(uv, p):
        rgb = eval_texture(scene.tex_images, scene.tex_type,
                           scene.tex_params, scene.tex_c1, scene.tex_c2,
                           btex, uv, p,
                           kinds=getattr(scene, "tex_kinds", None))
        return rgb.mean(-1)

    h0 = h(hit.uv, hit.p)
    du = (h(hit.uv + jnp.asarray([eps, 0.0]), hit.p + eps_w * ss)
          - h0) / eps
    dv = (h(hit.uv + jnp.asarray([0.0, eps]), hit.p + eps_w * ts)
          - h0) / eps
    scale = 0.02  # displacement scale in shading units
    ns2 = geom.normalize(hit.ns - scale * (du[:, None] * ss
                                           + dv[:, None] * ts))
    has = btex >= 0
    ns2 = jnp.where(geom.dot(ns2, hit.ng)[:, None] < 0, -ns2, ns2)
    return jnp.where(has[:, None], ns2, hit.ns)


def hair_shading_frame(scene: ir.SceneData, hit, ss, ts):
    """For hair lanes, align the shading-frame x-axis with the fiber
    tangent: dpdu from the hit triangle's uv parameterization (curves
    emit u along the fiber).  The hair BSDF frame is x=fiber, (y,z) the
    normal plane (hair.h; reference uses the dpdu-aligned BSDF frame)."""
    m = jnp.clip(hit.material, 0, scene.mat_type.shape[0] - 1)
    is_hair = (scene.mat_type[m] == ir.MAT_HAIR) & (hit.material >= 0)
    prim = jnp.clip(hit.prim, 0, scene.tri_v0.shape[0] - 1)
    uv = scene.tri_uv[prim]                       # [B,3,2]
    e1 = scene.tri_e1[prim]
    e2 = scene.tri_e2[prim]
    duv1 = uv[:, 1] - uv[:, 0]
    duv2 = uv[:, 2] - uv[:, 0]
    det = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
    ok = jnp.abs(det) > 1e-12
    inv = 1.0 / jnp.where(ok, det, 1.0)
    dpdu = (duv2[:, 1:2] * e1 - duv1[:, 1:2] * e2) * inv[:, None]
    tang = dpdu - geom.dot(dpdu, hit.ns)[:, None] * hit.ns
    ln = geom.length(tang)
    ok = ok & (ln > 1e-9)
    tang = tang / jnp.maximum(ln, 1e-9)[:, None]
    ts2 = jnp.cross(hit.ns, tang)
    use = (is_hair & ok)[:, None]
    return jnp.where(use, tang, ss), jnp.where(use, ts2, ts)


def shading_frame(scene: ir.SceneData, hit):
    """(ss, ts) tangent frame about hit.ns, with the hair-fiber tangent
    alignment applied on hair lanes (statically skipped otherwise).
    Shared by every integrator so hair shades identically in all of
    them (reference: each BSDF gets the dpdu-aligned frame via
    SurfaceInteraction::ComputeScatteringFunctions)."""
    ss, ts = geom.coordinate_system(hit.ns)
    if getattr(scene, "has_hair", False):
        ss, ts = hair_shading_frame(scene, hit, ss, ts)
    return ss, ts


def roughness_to_alpha(rough):
    """pbrt's RoughnessToAlpha (microfacet.h:83)."""
    x = jnp.log(jnp.maximum(rough, 1e-3))
    return (1.62142 + 0.819955 * x + 0.1734 * x * x
            + 0.0171201 * x ** 3 + 0.000640711 * x ** 4)


def resolve_mix(scene: ir.SceneData, material_idx, u_mix=None, p=None):
    """Resolve MAT_MIX to one of its two named materials by stochastic
    selection with P(a) = amount (materials/mixmat.cpp blends lobe sets;
    one-sample selection is the unbiased wavefront analog).  Without a
    supplied uniform, a position-hash dither is used (spatially correct
    average; integrators on the hot path thread a real sampler dim)."""
    if not getattr(scene, "has_mix", True):
        return material_idx
    m = jnp.clip(material_idx, 0, scene.mat_type.shape[0] - 1)
    is_mix = (scene.mat_type[m] == ir.MAT_MIX) & (material_idx >= 0)
    if u_mix is None:
        if p is None:
            u_mix = jnp.full(m.shape, 0.5)
        else:
            from pbrt_tpu.core import rng as _rng
            bits = jnp.abs(p * 8192.0).astype(jnp.uint32)
            u_mix = _rng.uniform_float(_rng.hash_combine(
                bits[..., 0], bits[..., 1], bits[..., 2]))
    pick_a = u_mix < scene.mat_mix_amt[m]
    resolved = jnp.where(pick_a, scene.mat_mix_a[m], scene.mat_mix_b[m])
    return jnp.where(is_mix, resolved, material_idx)


def gather_materials(scene: ir.SceneData, material_idx, uv=None,
                     p=None, u_mix=None, uv_width=None,
                     face=None, duv=None) -> MaterialParams:
    """Fetch per-ray material records; evaluates texture-bound Kd/Ks at
    the hit uv / world position when the scene has textures.

    The whole record comes from ONE one-hot [B,2M] @ [2M,MPK_COLS]
    matmul over the packed table: XLA's TPU gather lowers to a slow
    per-row loop (~9 ms/pass at B=65k for the ~15 separate table
    gathers this replaces) while the MXU fetches every column at full
    speed.  The table rows are [bf16-hi; residual] so a DEFAULT
    (single-pass bf16) matmul reconstructs the f32 values to ~2^-17
    relative (bit-exact on CPU); each lane's one-hot selects BOTH its
    hi and lo row.  Integer ids ride as small floats (exact in the hi
    half) and are round()ed back."""
    NS = scene.mat_kd.shape[1]
    material_idx = resolve_mix(scene, material_idx, u_mix, p)
    M = scene.mat_type.shape[0]
    m = jnp.clip(material_idx, 0, M - 1)
    idx2 = jnp.arange(2 * M, dtype=m.dtype) % M
    oh = (m[:, None] == idx2[None, :]).astype(jnp.float32)
    row = jax.lax.dot_general(oh, scene.mat_packed,
                              (((1,), (0,)), ((), ())),
                              precision=jax.lax.Precision.DEFAULT)
    sp = {name: row[:, i * NS:(i + 1) * NS]
          for i, name in enumerate(ir.MPK_SPECTRA)}
    rough_u = row[:, ir.MPK_ROUGH_U]
    rough_v = row[:, ir.MPK_ROUGH_V]
    remap = row[:, ir.MPK_REMAP] > 0.5
    au = jnp.where(remap, roughness_to_alpha(rough_u), rough_u)
    av = jnp.where(remap, roughness_to_alpha(rough_v), rough_v)
    # rough==0 stays 0 (perfect specular marker)
    au = jnp.where(rough_u > 0, jnp.maximum(au, 1e-3), 0.0)
    av = jnp.where(rough_v > 0, jnp.maximum(av, 1e-3), 0.0)
    mtype = jnp.round(row[:, ir.MPK_TYPE]).astype(jnp.int32)
    beck = (row[:, ir.MPK_BECKMANN] > 0.5
            if getattr(scene, "has_beckmann", False) else None)
    kd = sp["kd"]
    ks = sp["ks"]
    if uv is not None and scene.tex_type.shape[0] > 1:
        from pbrt_tpu.textures.textures import eval_texture
        from pbrt_tpu.core import spectrum as _spec
        pw = p if p is not None else jnp.zeros(uv.shape[:-1] + (3,))
        kd_tex = jnp.round(row[:, ir.MPK_KD_TEX]).astype(jnp.int32)
        ks_tex = jnp.round(row[:, ir.MPK_KS_TEX]).astype(jnp.int32)
        for tex_idx, slot in ((kd_tex, "kd"), (ks_tex, "ks")):
            rgb = eval_texture(scene.tex_images, scene.tex_type,
                               scene.tex_params, scene.tex_c1, scene.tex_c2,
                               tex_idx, uv, pw, uv_width=uv_width,
                               face=(face if getattr(scene, "has_ptex",
                                                     True) else None),
                               kinds=getattr(scene, "tex_kinds", None),
                               duv=duv)
            s = _spec.from_rgb(rgb, "reflectance")
            if slot == "kd":
                kd = jnp.where((tex_idx >= 0)[:, None], s, kd)
            else:
                ks = jnp.where((tex_idx >= 0)[:, None], s, ks)
    # uber opacity scales every surface lobe (uber.cpp:40-58); opacity
    # defaults to 1 for all other materials so the multiply is a no-op
    op = sp["opacity"]
    eta = row[:, ir.MPK_ETA]
    return MaterialParams(
        type=jnp.where(material_idx >= 0, mtype, ir.MAT_NONE),
        kd=kd * op, ks=ks * op, kr=sp["kr"] * op,
        kt=sp["kt"] * op, rough_u=au, rough_v=av,
        eta=eta, eta_spec=sp["eta_spec"],
        k_spec=sp["k_spec"], sigma=row[:, ir.MPK_SIGMA],
        opacity=op, beckmann=beck,
        disney=(row[:, ir.MPK_DISNEY:ir.MPK_DISNEY + 8]
                if getattr(scene, "has_disney", True) else None),
        hair_h=(jnp.clip(2.0 * uv[..., 1] - 1.0, -0.995, 0.995)
                if getattr(scene, "has_hair", False) and uv is not None
                else None),
        fourier_grid=(scene.fourier_grid
                      if getattr(scene, "has_fourier", False) else None),
        fourier_id=(jnp.round(row[:, ir.MPK_FOURIER]).astype(jnp.int32)
                    if getattr(scene, "has_fourier", False) else None),
        fourier_a0=(scene.fourier_a0
                    if getattr(scene, "has_fourier", False) else None),
        fourier_lum=(scene.fourier_lum
                     if getattr(scene, "has_fourier", False) else None),
        sss_c=(jnp.maximum(1.0 - 2.0 * fresnel_moment1_jnp(
            1.0 / jnp.maximum(eta, 1e-3)), 1e-4)
            if getattr(scene, "has_sss", False) else None),
        sss_tid=(jnp.round(row[:, ir.MPK_BSSRDF]).astype(jnp.int32)
                 if getattr(scene, "has_sss", False) else None),
        sss_sigma_t=(row[:, ir.MPK_SSS_SIGT:ir.MPK_SSS_SIGT + NS]
                     if getattr(scene, "has_sss", False) else None),
        sss_rho=(row[:, ir.MPK_SSS_RHO:ir.MPK_SSS_RHO + NS]
                 if getattr(scene, "has_sss", False) else None),
        families=getattr(scene, "mat_families", None))


def fresnel_moment1_jnp(eta):
    """First angular Fresnel moment, jnp (reference bssrdf.cpp:43)."""
    e2, e3 = eta * eta, eta * eta * eta
    e4, e5 = e3 * eta, e3 * eta * eta
    lo = (0.45966 - 1.73965 * eta + 3.37668 * e2 - 3.904945 * e3
          + 2.49277 * e4 - 0.68441 * e5)
    hi = (-4.61686 + 11.1136 * eta - 10.4646 * e2 + 5.11455 * e3
          - 1.27198 * e4 + 0.12746 * e5)
    return jnp.where(eta < 1, lo, hi)


# ---------------------------------------------------------------------------
# local-frame helpers (reflection.h:50-115)
# ---------------------------------------------------------------------------

def cos_theta(w):
    return w[..., 2]


def abs_cos_theta(w):
    return jnp.abs(w[..., 2])


def same_hemisphere(a, b):
    return a[..., 2] * b[..., 2] > 0


# ---------------------------------------------------------------------------
# Fresnel (reflection.cpp FrDielectric / FrConductor)
# ---------------------------------------------------------------------------

def fresnel_dielectric(cos_i, eta_i, eta_t):
    """Unpolarized dielectric Fresnel; handles entering/exiting by sign."""
    cos_i = jnp.clip(cos_i, -1.0, 1.0)
    entering = cos_i > 0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    ci = jnp.abs(cos_i)
    sin_t = ei / et * jnp.sqrt(jnp.maximum(1e-14, 1.0 - ci * ci))
    tir = sin_t >= 1.0
    ct = jnp.sqrt(jnp.maximum(1e-14, 1.0 - sin_t * sin_t))
    r_par = (et * ci - ei * ct) / jnp.maximum(et * ci + ei * ct, 1e-9)
    r_perp = (ei * ci - et * ct) / jnp.maximum(ei * ci + et * ct, 1e-9)
    f = 0.5 * (r_par * r_par + r_perp * r_perp)
    return jnp.where(tir, 1.0, f)


def fresnel_conductor(cos_i, eta, k):
    """Spectral conductor Fresnel (reflection.cpp FrConductor); eta,k [...,31]."""
    ci = jnp.clip(jnp.abs(cos_i), 0.0, 1.0)[..., None]
    ci2 = ci * ci
    si2 = 1.0 - ci2
    eta2 = eta * eta
    k2 = k * k
    t0 = eta2 - k2 - si2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4 * eta2 * k2, 1e-14))
    t1 = a2b2 + ci2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 1e-14))
    t2 = 2.0 * a * ci
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-9)
    t3 = ci2 * a2b2 + si2 * si2
    t4 = t2 * si2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-9)
    return 0.5 * (rp + rs)


# ---------------------------------------------------------------------------
# Trowbridge-Reitz / GGX microfacet distribution (microfacet.{h,cpp})
# ---------------------------------------------------------------------------

def ggx_d(wh, ax, ay):
    cos2 = wh[..., 2] ** 2
    sin2 = jnp.maximum(0.0, 1.0 - cos2)
    e = (wh[..., 0] ** 2 / jnp.maximum(ax * ax, 1e-12)
         + wh[..., 1] ** 2 / jnp.maximum(ay * ay, 1e-12)) + cos2
    return 1.0 / jnp.maximum(PI * ax * ay * e * e, 1e-12)


def _ggx_lambda(w, ax, ay):
    """Smith Lambda for GGX (microfacet.cpp:80)."""
    abs_tan2 = jnp.maximum(0.0, 1.0 - w[..., 2] ** 2) / jnp.maximum(
        w[..., 2] ** 2, 1e-12)
    c2 = w[..., 2] ** 2
    s2 = jnp.maximum(0.0, 1.0 - c2)
    inv_s = 1.0 / jnp.sqrt(jnp.maximum(s2, 1e-20))
    cos_phi = jnp.where(s2 > 1e-20, w[..., 0] * inv_s, 1.0)
    sin_phi = jnp.where(s2 > 1e-20, w[..., 1] * inv_s, 0.0)
    alpha2 = cos_phi ** 2 * ax * ax + sin_phi ** 2 * ay * ay
    return 0.5 * (-1.0 + jnp.sqrt(1.0 + alpha2 * abs_tan2))


def ggx_g(wo, wi, ax, ay):
    return 1.0 / (1.0 + _ggx_lambda(wo, ax, ay) + _ggx_lambda(wi, ax, ay))


def ggx_g1(w, ax, ay):
    return 1.0 / (1.0 + _ggx_lambda(w, ax, ay))


def ggx_sample_wh(wo, u1, u2, ax, ay):
    """Sample the visible GGX NDF (Heitz 2018 ellipsoid trick;
    reference: TrowbridgeReitzSample, microfacet.cpp:244)."""
    flip = wo[..., 2] < 0
    w = jnp.where(flip[..., None], -wo, wo)
    # stretch
    vh = geom.normalize(jnp.stack(
        [ax * w[..., 0], ay * w[..., 1], w[..., 2]], -1))
    # orthonormal basis
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where((lensq > 1e-20)[..., None],
                   jnp.stack([-vh[..., 1] * inv, vh[..., 0] * inv,
                              jnp.zeros_like(inv)], -1),
                   jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), vh.shape))
    t2 = jnp.cross(vh, t1)
    r = jnp.sqrt(u1)
    phi = 2 * PI * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1e-14, 1.0 - p1 * p1)) + s * p2
    pz = jnp.sqrt(jnp.maximum(1e-14, 1.0 - p1 * p1 - p2 * p2))
    nh = (p1[..., None] * t1 + p2[..., None] * t2 + pz[..., None] * vh)
    wh = geom.normalize(jnp.stack(
        [ax * nh[..., 0], ay * nh[..., 1],
         jnp.maximum(nh[..., 2], 1e-6)], -1))
    return jnp.where(flip[..., None], -wh, wh)


def ggx_pdf_wh(wo, wh, ax, ay):
    """Visible-NDF pdf (microfacet.h Pdf: D * G1 * |wo.wh| / |cos wo|)."""
    return (ggx_d(wh, ax, ay) * ggx_g1(wo, ax, ay)
            * jnp.abs(geom.dot(wo, wh))
            / jnp.maximum(abs_cos_theta(wo), 1e-9))


# ---------------------------------------------------------------------------
# Beckmann distribution (reference: microfacet.h:80, microfacet.cpp
# BeckmannDistribution) — selected per material via "string distribution"
# ---------------------------------------------------------------------------

SQRT_PI_INV = float(1.0 / np.sqrt(np.pi))


def beckmann_d(wh, ax, ay):
    c2 = wh[..., 2] ** 2
    tan2 = jnp.maximum(0.0, 1.0 - c2) / jnp.maximum(c2, 1e-12)
    s2 = jnp.maximum(1.0 - c2, 1e-20)
    cos2phi = wh[..., 0] ** 2 / s2
    sin2phi = wh[..., 1] ** 2 / s2
    e = jnp.exp(-tan2 * (cos2phi / jnp.maximum(ax * ax, 1e-12)
                         + sin2phi / jnp.maximum(ay * ay, 1e-12)))
    return e / jnp.maximum(PI * ax * ay * c2 * c2, 1e-12)


def _beckmann_lambda(w, ax, ay):
    c2 = w[..., 2] ** 2
    abs_tan = jnp.sqrt(jnp.maximum(0.0, 1.0 - c2)
                       / jnp.maximum(c2, 1e-12))
    s2 = jnp.maximum(1.0 - c2, 1e-20)
    cos2phi = w[..., 0] ** 2 / s2
    sin2phi = w[..., 1] ** 2 / s2
    alpha = jnp.sqrt(cos2phi * ax * ax + sin2phi * ay * ay + 1e-20)
    a = 1.0 / jnp.maximum(alpha * abs_tan, 1e-12)
    lam = (1.0 - 1.259 * a + 0.396 * a * a) / \
        jnp.maximum(3.535 * a + 2.181 * a * a, 1e-12)
    return jnp.where(a >= 1.6, 0.0, lam)


def beckmann_sample_11(cos_theta_i, u1, u2):
    """BeckmannSample11 (microfacet.cpp:107-180): visible-NDF slope
    sampling via erf-inverse Newton (fixed-iteration, vectorized)."""
    from jax.scipy.special import erf, erfinv
    ct = jnp.maximum(cos_theta_i, -0.9999)
    st = jnp.sqrt(jnp.maximum(1e-14, 1.0 - ct * ct))
    tant = st / jnp.maximum(ct, 1e-7)
    cot = 1.0 / jnp.maximum(tant, 1e-12)

    a0 = erf(cot)
    sx = jnp.maximum(u1, 1e-6)
    theta = jnp.arccos(jnp.clip(ct, -1.0, 1.0))
    fit = 1.0 + theta * (-0.876 + theta * (0.4265 - 0.0594 * theta))
    b = a0 - (1.0 + a0) * jnp.power(1.0 - sx, fit)
    norm = 1.0 / jnp.maximum(
        1.0 + a0 + SQRT_PI_INV * tant * jnp.exp(-cot * cot), 1e-12)

    def newton(i, b):
        inv_erf = erfinv(jnp.clip(b, -0.99999, 0.99999))
        value = norm * (1.0 + b + SQRT_PI_INV * tant
                        * jnp.exp(-inv_erf * inv_erf)) - sx
        derivative = norm * (1.0 - inv_erf * tant)
        step = value / jnp.where(jnp.abs(derivative) > 1e-9,
                                 derivative, 1e-9)
        b2 = b - step
        return jnp.clip(b2, -1.0 + 1e-6, 1.0 - 1e-6)

    b = jax.lax.fori_loop(0, 10, newton, jnp.clip(b, -1 + 1e-6, 1 - 1e-6))
    slope_x = erfinv(jnp.clip(b, -0.99999, 0.99999))
    slope_y = erfinv(jnp.clip(2.0 * jnp.maximum(u2, 1e-6) - 1.0,
                              -0.99999, 0.99999))
    # normal incidence special case
    r = jnp.sqrt(jnp.maximum(-jnp.log(jnp.maximum(1.0 - u1, 1e-12)),
                             1e-14))
    phi = 2.0 * PI * u2
    near = cos_theta_i > 0.9999
    slope_x = jnp.where(near, r * jnp.cos(phi), slope_x)
    slope_y = jnp.where(near, r * jnp.sin(phi), slope_y)
    return slope_x, slope_y


def beckmann_sample_wh(wo, u1, u2, ax, ay):
    """Visible-NDF Sample_wh (microfacet.cpp BeckmannSample + Sample_wh)."""
    flip = wo[..., 2] < 0
    w = jnp.where(flip[..., None], -wo, wo)
    ws = geom.normalize(jnp.stack(
        [ax * w[..., 0], ay * w[..., 1], w[..., 2]], -1))
    sx, sy = beckmann_sample_11(ws[..., 2], u1, u2)
    s2 = jnp.maximum(1.0 - ws[..., 2] ** 2, 1e-20)
    inv_s = 1.0 / jnp.sqrt(s2)
    cos_phi = jnp.where(s2 > 1e-20, ws[..., 0] * inv_s, 1.0)
    sin_phi = jnp.where(s2 > 1e-20, ws[..., 1] * inv_s, 0.0)
    tmp = cos_phi * sx - sin_phi * sy
    sy = sin_phi * sx + cos_phi * sy
    sx = ax * tmp
    sy = ay * sy
    wh = geom.normalize(jnp.stack([-sx, -sy, jnp.ones_like(sx)], -1))
    return jnp.where(flip[..., None], -wh, wh)


# ---------------------------------------------------------------------------
# generic microfacet dispatch: beck (optional [B] bool) selects Beckmann
# per lane; None compiles the pure-GGX path (scene.has_beckmann gate)
# ---------------------------------------------------------------------------

def mf_d(wh, ax, ay, beck=None):
    if beck is None:
        return ggx_d(wh, ax, ay)
    return jnp.where(beck, beckmann_d(wh, ax, ay), ggx_d(wh, ax, ay))


def _mf_lambda(w, ax, ay, beck=None):
    if beck is None:
        return _ggx_lambda(w, ax, ay)
    return jnp.where(beck, _beckmann_lambda(w, ax, ay),
                     _ggx_lambda(w, ax, ay))


def mf_g(wo, wi, ax, ay, beck=None):
    return 1.0 / (1.0 + _mf_lambda(wo, ax, ay, beck)
                  + _mf_lambda(wi, ax, ay, beck))


def mf_g1(w, ax, ay, beck=None):
    return 1.0 / (1.0 + _mf_lambda(w, ax, ay, beck))


def mf_sample_wh(wo, u1, u2, ax, ay, beck=None):
    if beck is None:
        return ggx_sample_wh(wo, u1, u2, ax, ay)
    return jnp.where(beck[..., None],
                     beckmann_sample_wh(wo, u1, u2, ax, ay),
                     ggx_sample_wh(wo, u1, u2, ax, ay))


def mf_pdf_wh(wo, wh, ax, ay, beck=None):
    """Visible-NDF pdf (microfacet.h Pdf: D * G1 * |wo.wh| / |cos wo|)."""
    return (mf_d(wh, ax, ay, beck) * mf_g1(wo, ax, ay, beck)
            * jnp.abs(geom.dot(wo, wh))
            / jnp.maximum(abs_cos_theta(wo), 1e-9))


# ---------------------------------------------------------------------------
# lobe primitives
# ---------------------------------------------------------------------------

def lambertian_f(kd):
    return kd * INV_PI


def oren_nayar_f(kd, sigma_deg, wo, wi):
    """Oren-Nayar (reflection.cpp:117)."""
    sigma = jnp.radians(sigma_deg)
    s2 = sigma * sigma
    A = 1.0 - s2 / (2.0 * (s2 + 0.33))
    Bc = 0.45 * s2 / (s2 + 0.09)
    sin_to = jnp.sqrt(jnp.maximum(1e-14, 1.0 - wo[..., 2] ** 2))
    sin_ti = jnp.sqrt(jnp.maximum(1e-14, 1.0 - wi[..., 2] ** 2))
    # max(0, cos(phi_i - phi_o))
    denom_i = jnp.maximum(sin_ti, 1e-9)
    denom_o = jnp.maximum(sin_to, 1e-9)
    cos_dphi = ((wi[..., 0] * wo[..., 0] + wi[..., 1] * wo[..., 1])
                / (denom_i * denom_o))
    max_cos = jnp.where((sin_ti > 1e-4) & (sin_to > 1e-4),
                        jnp.maximum(0.0, cos_dphi), 0.0)
    abs_ci = jnp.abs(wi[..., 2])
    abs_co = jnp.abs(wo[..., 2])
    big = jnp.maximum(abs_ci, abs_co) + 1e-9
    small = jnp.minimum(abs_ci, abs_co)
    sin_a = jnp.sqrt(jnp.maximum(1e-14, 1.0 - small * small))
    tan_b = jnp.sqrt(jnp.maximum(1e-14, 1.0 - big * big)) / big
    return kd * INV_PI * (A + Bc * max_cos * sin_a * tan_b)[..., None]



def _safe_half(wo, wi):
    """Half vector with a unit-z fallback when wo ~= -wi: dividing a
    near-zero sum by its near-zero length overflows, and inf primals
    turn masked-out backward cotangents into NaN (camera/pose grads)."""
    wh = wo + wi
    # sqrt floored INSIDE: at wi == -wo exactly (glass at normal
    # incidence) length_sq is 0 and d sqrt(0) = inf would NaN the
    # masked-out backward
    wh_len = jnp.sqrt(geom.length_sq(wh) + 1e-12)
    ok = wh_len > 1e-5
    whn = jnp.where(ok[..., None],
                    wh / jnp.maximum(wh_len, 1e-6)[..., None],
                    jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), wh.shape))
    return whn, ok


def microfacet_reflection_f(ks, wo, wi, ax, ay, F, beck=None):
    """Torrance-Sparrow (reflection.cpp:408): D G F / (4 cos_o cos_i)."""
    co = abs_cos_theta(wo)
    ci = abs_cos_theta(wi)
    wh, wh_ok = _safe_half(wo, wi)
    ok = (co > 1e-6) & (ci > 1e-6) & wh_ok & same_hemisphere(wo, wi)
    d = mf_d(wh, ax, ay, beck)
    g = mf_g(wo, wi, ax, ay, beck)
    f = ks * F * (d * g / jnp.maximum(4 * co * ci, 1e-9))[..., None]
    return jnp.where(ok[..., None], f, 0.0)


def microfacet_reflection_pdf(wo, wi, ax, ay, beck=None):
    wh, wh_ok = _safe_half(wo, wi)
    pdf = mf_pdf_wh(wo, wh, ax, ay, beck) / jnp.maximum(
        4 * jnp.abs(geom.dot(wo, wh)), 1e-9)
    return jnp.where(same_hemisphere(wo, wi) & wh_ok, pdf, 0.0)


def fresnel_blend_f(rd, rs, wo, wi, ax, ay):
    """Ashikhmin-Shirley FresnelBlend (reflection.cpp:480, substrate)."""
    def pow5(x):
        return x * x * x * x * x
    ci = abs_cos_theta(wi)
    co = abs_cos_theta(wo)
    diffuse = ((28.0 / (23.0 * PI)) * rd * (1.0 - rs)
               * ((1.0 - pow5(1.0 - 0.5 * ci))
                  * (1.0 - pow5(1.0 - 0.5 * co)))[..., None])
    wh, ok = _safe_half(wo, wi)
    d = ggx_d(wh, ax, ay)
    dot_iw = jnp.abs(geom.dot(wi, wh))
    schlick = rs + pow5(1.0 - dot_iw)[..., None] * (1.0 - rs)
    spec = (d / jnp.maximum(4 * dot_iw * jnp.maximum(ci, co), 1e-9))[..., None] * schlick
    out = diffuse + jnp.where(ok[..., None], spec, 0.0)
    return jnp.where(same_hemisphere(wo, wi)[..., None], out, 0.0)


# ---------------------------------------------------------------------------
# Disney principled BSDF (materials/disney.cpp: DisneyDiffuse/Retro/Sheen,
# anisotropic GGX specular with DisneyFresnel, GTR1 clearcoat,
# MicrofacetTransmission for specTrans)
# ---------------------------------------------------------------------------

def _pow5(x):
    return x * x * x * x * x


def _disney_unpack(params):
    dz = params.disney
    if dz is None:
        dz = jnp.zeros(params.type.shape + (8,), params.kd.dtype)
    return (dz[..., 0], dz[..., 1], dz[..., 2], dz[..., 3], dz[..., 4],
            dz[..., 5], dz[..., 6])


def _gtr1_d(cos_h, alpha):
    """GTR1 NDF (disney.cpp GTR1): heavier tails than GGX; used by the
    clearcoat lobe only."""
    a2 = jnp.clip(alpha * alpha, 1e-6, 1.0 - 1e-4)
    c2 = cos_h * cos_h
    return (a2 - 1.0) / (PI * jnp.log(a2) * (1.0 + (a2 - 1.0) * c2))


def _smith_ggx_sep(cos_t, alpha):
    """Separable smithG_GGX as used by disney.cpp's clearcoat (absorbs
    the 1/cos of the microfacet denominator)."""
    a2 = alpha * alpha
    c2 = cos_t * cos_t
    return 1.0 / (jnp.abs(cos_t) + jnp.sqrt(jnp.maximum(
        a2 + c2 - a2 * c2, 1e-12)))


def _disney_weights(params):
    """Per-lane lobe selection probabilities [B,4]:
    (cosine diffuse+retro+sheen, GGX specular, GTR1 clearcoat,
    microfacet transmission).  pdf_f uses the same mixture, which keeps
    the one-sample estimator consistent by construction."""
    metallic, _, _, _, cc, _, strans = _disney_unpack(params)
    w_diff = (1.0 - metallic) * (1.0 - strans) + 1e-4
    w_spec = jnp.ones_like(metallic)
    w_cc = 0.5 * jnp.clip(cc, 0.0, 1.0)
    w_trans = (1.0 - metallic) * strans
    tot = w_diff + w_spec + w_cc + w_trans
    return jnp.stack([w_diff, w_spec, w_cc, w_trans], -1) / tot[..., None]


def _disney_f_refl(params, wo, wi):
    """Reflective Disney lobes f(wo,wi) [B,31] (same-hemisphere only;
    caller masks)."""
    from pbrt_tpu.core import spectrum as _spec
    (metallic, spec_tint, sheen, sheen_tint, cc, cc_gloss,
     strans) = _disney_unpack(params)
    base = params.kd
    lum = jnp.maximum(_spec.luminance(base), 1e-4)
    ctint = base / lum[..., None]
    co = jnp.maximum(abs_cos_theta(wo), 1e-6)
    ci = jnp.maximum(abs_cos_theta(wi), 1e-6)
    wh, wh_ok = _safe_half(wo, wi)
    cosd = jnp.abs(geom.dot(wi, wh))          # half-vector angle
    ax, ay = params.rough_u, params.rough_v
    rough = jnp.clip((ax * ay) ** 0.25, 1e-3, 1.0)  # undo alpha remap
    Fo = _pow5(jnp.clip(1.0 - co, 0.0, 1.0))
    Fi = _pow5(jnp.clip(1.0 - ci, 0.0, 1.0))
    Fd = _pow5(jnp.clip(1.0 - cosd, 0.0, 1.0))
    diffuse_w = (1.0 - metallic) * (1.0 - strans)
    # DisneyDiffuse + DisneyRetro (Burley 2012 split as in disney.cpp)
    f_diff = base * (INV_PI * (1.0 - 0.5 * Fo) * (1.0 - 0.5 * Fi))[..., None]
    RR = 2.0 * rough * cosd * cosd
    f_retro = base * (INV_PI * RR * (Fo + Fi + Fo * Fi * (RR - 1.0))
                      )[..., None]
    # DisneySheen
    csheen = (1.0 - sheen_tint)[..., None] + sheen_tint[..., None] * ctint
    f_sheen = sheen[..., None] * csheen * Fd[..., None]
    f = diffuse_w[..., None] * (f_diff + f_retro + f_sheen)
    # specular GGX with DisneyFresnel (Schlick toward Cspec0)
    r0 = ((params.eta - 1.0) / (params.eta + 1.0)) ** 2
    cspec0 = ((1.0 - metallic)[..., None] * r0[..., None]
              * ((1.0 - spec_tint)[..., None]
                 + spec_tint[..., None] * ctint)
              + metallic[..., None] * base)
    F = cspec0 + Fd[..., None] * (1.0 - cspec0)
    d = ggx_d(wh, ax, ay)
    g = ggx_g(wo, wi, ax, ay)
    f = f + jnp.where(wh_ok[..., None],
                      (d * g / (4.0 * co * ci))[..., None] * F, 0.0)
    # clearcoat (GTR1 + fixed-0.25 separable smith, disney.cpp)
    acc = 0.1 * (1.0 - cc_gloss) + 0.001 * cc_gloss
    dr = _gtr1_d(wh[..., 2], acc)
    gr = _smith_ggx_sep(cos_theta(wo), 0.25) * _smith_ggx_sep(
        cos_theta(wi), 0.25)
    fr = 0.04 + 0.96 * Fd
    f_cc = cc * dr * gr * fr * 0.25
    return f + jnp.where(wh_ok, f_cc, 0.0)[..., None]


def _disney_pdf(params, wo, wi):
    """Mixture pdf matching _disney_weights' sampling strategy."""
    w = _disney_weights(params)
    refl = same_hemisphere(wo, wi)
    pdf_cos = jnp.where(refl, abs_cos_theta(wi) * INV_PI, 0.0)
    ax, ay = params.rough_u, params.rough_v
    pdf_spec = jnp.where(refl, microfacet_reflection_pdf(wo, wi, ax, ay),
                         0.0)
    (_, _, _, _, _, cc_gloss, _) = _disney_unpack(params)
    wh, wh_ok = _safe_half(wo, wi)
    acc = 0.1 * (1.0 - cc_gloss) + 0.001 * cc_gloss
    dwo = jnp.maximum(jnp.abs(geom.dot(wo, wh)), 1e-6)
    pdf_cc = jnp.where(refl & wh_ok,
                       jnp.abs(_gtr1_d(wh[..., 2], acc))
                       * jnp.abs(wh[..., 2]) / (4.0 * dwo), 0.0)
    _, pdf_rt = _rough_transmission(params, wo, wi)
    return (w[..., 0] * pdf_cos + w[..., 1] * pdf_spec
            + w[..., 2] * pdf_cc + w[..., 3] * pdf_rt)


# ---------------------------------------------------------------------------
# type dispatch: eval / pdf / sample
# ---------------------------------------------------------------------------

def _masks(t):
    # subsurface lanes that reach the dispatch un-relocated (bdpt/sppm/
    # whitted have no probe pass) fall back to the diffusion-limit
    # plastic: kd holds the table's effective albedo (parser/api.py)
    is_sss_fallback = (t == ir.MAT_SUBSURFACE) | (t == ir.MAT_KDSUBSURFACE)
    has_diff = ((t == ir.MAT_MATTE) | (t == ir.MAT_PLASTIC)
                | (t == ir.MAT_UBER) | (t == ir.MAT_RETRO)
                | is_sss_fallback)
    has_ggx_diel = ((t == ir.MAT_PLASTIC) | (t == ir.MAT_UBER)
                    | is_sss_fallback)
    is_metal = t == ir.MAT_METAL
    is_substrate = t == ir.MAT_SUBSTRATE
    is_mirror = t == ir.MAT_MIRROR
    is_glass = t == ir.MAT_GLASS
    is_rough_glass = t == ir.MAT_ROUGHGLASS
    is_translucent = t == ir.MAT_TRANSLUCENT
    is_retro = t == ir.MAT_RETRO
    is_delta = is_mirror | is_glass | (t == ir.MAT_NONE)
    n_lobes = (has_diff.astype(jnp.float32) + has_ggx_diel + is_metal
               + is_substrate + 2 * is_rough_glass + 2 * is_translucent
               + is_retro)
    return (has_diff, has_ggx_diel, is_metal, is_substrate, is_mirror,
            is_glass, is_delta, jnp.maximum(n_lobes, 1.0),
            is_rough_glass, is_translucent, is_retro)


def _retro_d(cos_r, alpha):
    """Retro lobe density over the hemisphere, peaked at wi == wo
    (behavioral model of the fork's RetroReflection microfacet lobes,
    materials/retroreflective.cpp:80-174): GGX-shaped in the angle to wo,
    approximately normalized over the hemisphere."""
    a2 = jnp.maximum(alpha * alpha, 1e-6)
    c = jnp.clip(cos_r, -1.0, 1.0)
    d = a2 / (jnp.pi * ((c * c) * (a2 - 1.0) + 1.0) ** 2)
    return d


def _rough_transmission(params, wo, wi):
    """MicrofacetTransmission f and pdf (reflection.cpp:451, microfacet.h
    Pdf with dwh/dwi change of variables).  Valid on opposite hemispheres."""
    ax, ay = jnp.maximum(params.rough_u, 1e-4), jnp.maximum(params.rough_v, 1e-4)
    co = cos_theta(wo)
    ci = cos_theta(wi)
    eta = jnp.where(co > 0, params.eta, 1.0 / params.eta)
    whr = wo + wi * eta[..., None]
    whl = jnp.sqrt(geom.length_sq(whr) + 1e-12)
    wh_ok2 = whl > 1e-6
    wh = jnp.where(wh_ok2[..., None],
                   whr / jnp.maximum(whl, 1e-6)[..., None],
                   jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), whr.shape))
    wh = jnp.where(wh[..., 2:3] < 0, -wh, wh)
    dwo = geom.dot(wo, wh)
    dwi = geom.dot(wi, wh)
    ok = (dwo * dwi < 0) & (jnp.abs(co) > 1e-6) & (jnp.abs(ci) > 1e-6) \
        & wh_ok2
    F = fresnel_dielectric(dwo, 1.0, params.eta)
    sqrt_denom = dwo + eta * dwi
    d = ggx_d(wh, ax, ay)
    g = ggx_g(wo, wi, ax, ay)
    factor = 1.0 / eta      # radiance transport scaling
    f_val = ((1.0 - F) * jnp.abs(
        d * g * eta * eta * jnp.abs(dwi) * jnp.abs(dwo) * factor * factor
        / jnp.maximum(jnp.abs(ci * co) * sqrt_denom * sqrt_denom, 1e-9)))
    f = params.kt * jnp.where(ok, f_val, 0.0)[..., None]
    dwh_dwi = jnp.abs(eta * eta * dwi) / jnp.maximum(
        sqrt_denom * sqrt_denom, 1e-9)
    pdf = jnp.where(ok, ggx_pdf_wh(wo, wh, ax, ay) * dwh_dwi, 0.0)
    return f, pdf


def eval_f(params: MaterialParams, wo, wi):
    """f(wo, wi) for non-delta lobes, local frame; [B,31]."""
    t = params.type
    (has_diff, has_ggx_diel, is_metal, is_substrate, _, _, is_delta,
     _, is_rglass, is_transl, is_retro) = _masks(t)
    co = abs_cos_theta(wo)
    ci = abs_cos_theta(wi)
    valid = (co > 1e-6) & (ci > 1e-6) & ~is_delta & (t != ir.MAT_NONE)
    refl = same_hemisphere(wo, wi)

    fam = params.families
    f = jnp.zeros_like(params.kd)
    # diffuse (lambert / oren-nayar)
    if _present(fam, ir.MAT_MATTE, ir.MAT_PLASTIC, ir.MAT_UBER,
                ir.MAT_RETRO, ir.MAT_SUBSURFACE, ir.MAT_KDSUBSURFACE):
        f_lam = lambertian_f(params.kd)
        f_diff = jnp.where((params.sigma > 1e-6)[..., None],
                           oren_nayar_f(params.kd, params.sigma, wo, wi),
                           f_lam)
        f = f + jnp.where((has_diff & refl)[..., None], f_diff, 0.0)

    ax, ay = params.rough_u, params.rough_v
    wh, wh_ok = _safe_half(wo, wi)
    # dielectric-coat microfacet (plastic/uber/roughglass reflection)
    if _present(fam, ir.MAT_PLASTIC, ir.MAT_UBER, ir.MAT_ROUGHGLASS,
                ir.MAT_SUBSURFACE, ir.MAT_KDSUBSURFACE, ir.MAT_DISNEY):
        F_diel = fresnel_dielectric(geom.dot(wi, wh), 1.0,
                                    params.eta)[..., None]
    if _present(fam, ir.MAT_PLASTIC, ir.MAT_UBER, ir.MAT_SUBSURFACE,
                ir.MAT_KDSUBSURFACE):
        f_spec_d = microfacet_reflection_f(params.ks, wo, wi, ax, ay,
                                           F_diel, params.beckmann)
        f = f + jnp.where((has_ggx_diel & (ax > 0))[..., None],
                          f_spec_d, 0.0)
    if _present(fam, ir.MAT_ROUGHGLASS):
        f_rg_refl = microfacet_reflection_f(params.kr, wo, wi, ax, ay,
                                            F_diel, params.beckmann)
        f = f + jnp.where((is_rglass & refl)[..., None], f_rg_refl, 0.0)
    # rough-glass transmission (also the disney specTrans lobe)
    if _present(fam, ir.MAT_ROUGHGLASS, ir.MAT_DISNEY):
        f_rg_t, _ = _rough_transmission(params, wo, wi)
        f = f + jnp.where((is_rglass & ~refl)[..., None], f_rg_t, 0.0)
    # conductor microfacet (metal) — ks holds the scale (1 by default)
    if _present(fam, ir.MAT_METAL):
        F_cond = fresnel_conductor(geom.dot(wi, wh), params.eta_spec,
                                   params.k_spec)
        f_metal = microfacet_reflection_f(params.ks, wo, wi, ax, ay,
                                          F_cond, params.beckmann)
        f = f + jnp.where((is_metal & (ax > 0))[..., None], f_metal, 0.0)
    # substrate
    if _present(fam, ir.MAT_SUBSTRATE):
        f_sub = fresnel_blend_f(params.kd, params.ks, wo, wi, ax, ay)
        f = f + jnp.where(is_substrate[..., None], f_sub, 0.0)
    # translucent: lambertian reflection + transmission scaled by kr/kt
    # (materials/translucent.cpp)
    if _present(fam, ir.MAT_TRANSLUCENT):
        f_tr_r = params.kr * params.kd * INV_PI
        f_tr_t = params.kt * params.kd * INV_PI
        f = f + jnp.where((is_transl & refl)[..., None], f_tr_r, 0.0)
        f = f + jnp.where((is_transl & ~refl)[..., None], f_tr_t, 0.0)
    # fork retroreflective lobe: peaked at wi == wo
    if _present(fam, ir.MAT_RETRO):
        cos_r = geom.dot(wi, wo)
        f_ret = params.ks * _retro_d(cos_r,
                                     jnp.maximum(ax, 1e-3))[..., None]
        f = f + jnp.where((is_retro & refl)[..., None], f_ret, 0.0)
    # disney principled lobes (fully custom path; statically skipped
    # for scenes with no disney materials — scene.has_disney)
    if params.disney is not None:
        is_disney = t == ir.MAT_DISNEY
        f = f + jnp.where((is_disney & refl)[..., None],
                          _disney_f_refl(params, wo, wi), 0.0)
        metallic_d, strans_d = (_disney_unpack(params)[0],
                                _disney_unpack(params)[6])
        # specTrans transmission: kt already holds sqrt(baseColor)
        f = f + jnp.where((is_disney & ~refl)[..., None],
                          f_rg_t * ((1.0 - metallic_d)
                                    * strans_d)[..., None], 0.0)
    # hair (materials/hair.cpp via materials/hair.py; kd = sigma_a,
    # rough_u/v = beta_m/beta_n, sigma = alpha degrees, frame: x=fiber)
    if params.hair_h is not None:
        from pbrt_tpu.materials import hair as hairmod
        is_hair = t == ir.MAT_HAIR
        f_hair = hairmod.hair_eval(
            wo, wi, params.hair_h, params.kd, eta=params.eta,
            beta_m=params.rough_u, beta_n=params.rough_v,
            alpha=params.sigma * (PI / 180.0))
        f = jnp.where(is_hair[..., None], f_hair, f)
    # Sw exit lobe at a BSSRDF probe point pi: Fresnel transmission
    # scaled to unit albedo, cosine-shaped (SeparableBSSRDF::Sw,
    # bssrdf.h:221).  The reference's radiance-mode eta^2 in the
    # adapter exactly cancels the 1/eta^2 its FresnelSpecular entry
    # transmission applied (path.cpp:155 + reflection.h:351); our
    # interface event applies NO entry factor, so the pair is folded
    # to its net value of 1 here.
    if params.sss_c is not None:
        is_ssw = t == ir.MAT_SSW
        fr_wi = fresnel_dielectric(cos_theta(wi), 1.0, params.eta)
        f_ssw = (1.0 - fr_wi) / (params.sss_c * PI)
        f = jnp.where((is_ssw & refl)[..., None], f_ssw[..., None], f)
    # fourier measured BSDF: trilinear lookup of the compile-time baked
    # lattice, one static unroll per registered grid (F is tiny)
    if params.fourier_id is not None:
        from pbrt_tpu.materials import fourier as fouriermod
        from pbrt_tpu.core import spectrum as _spec
        is_four = t == ir.MAT_FOURIER
        for gi in range(params.fourier_grid.shape[0]):
            rgb = fouriermod.eval_grid(params.fourier_grid[gi], wo, wi)
            f_four = _spec.from_rgb(jnp.maximum(rgb, 0.0), "reflectance")
            f = jnp.where((is_four & (params.fourier_id == gi))[..., None],
                          f_four, f)
    return jnp.where(valid[..., None], f, 0.0)


def pdf_f(params: MaterialParams, wo, wi):
    t = params.type
    (has_diff, has_ggx_diel, is_metal, is_substrate, _, _, is_delta,
     n_lobes, is_rglass, is_transl, is_retro) = _masks(t)
    fam = params.families
    refl = same_hemisphere(wo, wi)
    pdf_diff = jnp.where(refl, abs_cos_theta(wi) * INV_PI, 0.0)
    ax, ay = params.rough_u, params.rough_v
    pdf = jnp.where(has_diff, pdf_diff, 0.0)
    if _present(fam, ir.MAT_PLASTIC, ir.MAT_UBER, ir.MAT_METAL,
                ir.MAT_SUBSTRATE, ir.MAT_ROUGHGLASS, ir.MAT_SUBSURFACE,
                ir.MAT_KDSUBSURFACE):
        pdf_ggx = microfacet_reflection_pdf(wo, wi, ax, ay,
                                            params.beckmann)
        pdf = pdf + jnp.where((has_ggx_diel | is_metal) & (ax > 0),
                              pdf_ggx, 0.0)
        pdf = pdf + jnp.where(is_substrate, 0.5 * (pdf_diff + pdf_ggx),
                              0.0)
    if _present(fam, ir.MAT_ROUGHGLASS):
        _, pdf_rg_t = _rough_transmission(params, wo, wi)
        pdf = pdf + jnp.where(is_rglass, jnp.where(refl, pdf_ggx, 0.0)
                              + pdf_rg_t, 0.0)
    if _present(fam, ir.MAT_TRANSLUCENT):
        pdf_transl = abs_cos_theta(wi) * INV_PI   # either hemisphere
        pdf = pdf + jnp.where(is_transl, 2.0 * 0.5 * pdf_transl, 0.0)
    if _present(fam, ir.MAT_RETRO):
        cos_r = geom.dot(wi, wo)
        pdf_retro = jnp.where(refl,
                              _retro_d(cos_r, jnp.maximum(ax, 1e-3))
                              * jnp.abs(cos_r), 0.0)
        pdf = pdf + jnp.where(is_retro, pdf_retro, 0.0)
    pdf = pdf / n_lobes
    # disney: self-normalized lobe mixture (outside the n_lobes scheme)
    if params.disney is not None:
        is_disney = t == ir.MAT_DISNEY
        pdf = jnp.where(is_disney, _disney_pdf(params, wo, wi), pdf)
    if params.hair_h is not None:
        from pbrt_tpu.materials import hair as hairmod
        is_hair = t == ir.MAT_HAIR
        pdf_hair = hairmod.hair_pdf(
            wo, wi, params.hair_h, params.kd, eta=params.eta,
            beta_m=params.rough_u, beta_n=params.rough_v,
            alpha=params.sigma * (PI / 180.0))
        pdf = jnp.where(is_hair, pdf_hair, pdf)
    if params.fourier_id is not None:
        if params.fourier_a0 is not None:
            # density of the Catmull-Rom inversion sampler
            # (fourier.py pdf_grid_cr; SampleCatmullRom2D twin)
            from pbrt_tpu.materials import fourier as fouriermod
            for gi in range(params.fourier_grid.shape[0]):
                pdf_g = fouriermod.pdf_grid_cr(
                    params.fourier_a0[gi], params.fourier_lum[gi],
                    wo, wi)
                pdf = jnp.where((t == ir.MAT_FOURIER)
                                & (params.fourier_id == gi), pdf_g, pdf)
        else:   # two-sided cosine fallback (p=1/2 each hemisphere)
            pdf = jnp.where(t == ir.MAT_FOURIER,
                            0.5 * abs_cos_theta(wi) * INV_PI, pdf)
    if params.sss_c is not None:
        # Sw exit lobe: one-sided cosine (SeparableBSSRDFAdapter keeps
        # BxDF's default cosine sampling)
        pdf = jnp.where(t == ir.MAT_SSW, pdf_diff, pdf)
    # uber opacity: the surface lobes are only picked with prob 1-p_tr
    if _present(fam, ir.MAT_UBER):
        transp = jnp.clip(1.0 - params.opacity, 0.0, 1.0).mean(-1)
        pdf = jnp.where(t == ir.MAT_UBER, pdf * (1.0 - transp), pdf)
    return jnp.where(is_delta | (t == ir.MAT_NONE), 0.0, pdf)


def sample_f(params: MaterialParams, wo, u_lobe, u1, u2, u3=None):
    """Sample wi; returns (wi, f, pdf, is_specular, transmitted, eta_fac).

    u3: extra uniform for the hair azimuth dimension; when absent a
    hash-decorrelated fallback is derived from u1/u2.

    eta_fac: multiplicative update for the path's etaScale (Russian-roulette
    radiance correction, reference path.cpp:150-156).
    """
    t = params.type
    fam = params.families
    (has_diff, has_ggx_diel, is_metal, is_substrate, is_mirror, is_glass,
     is_delta, n_lobes, is_rglass, is_transl, is_retro) = _masks(t)
    ax, ay = params.rough_u, params.rough_v
    sgn = jnp.sign(wo[..., 2:3])

    # uber opacity: a specular eta=1 transmission lobe with T = 1-opacity
    # (uber.cpp:40-58), sampled stochastically so transparent uber surfaces
    # pass shadow-free rays straight through
    if _present(fam, ir.MAT_UBER):
        transp = jnp.clip(1.0 - params.opacity, 0.0, 1.0)
        p_tr = jnp.where(t == ir.MAT_UBER, transp.mean(-1), 0.0)
        pick_pass = u_lobe < p_tr
        u_lobe = jnp.where(
            p_tr > 0,
            jnp.clip((u_lobe - p_tr) / jnp.maximum(1.0 - p_tr, 1e-6),
                     0.0, 1.0 - 1e-7),
            u_lobe)
    else:
        pick_pass = jnp.zeros_like(u_lobe, bool)

    # lobe candidates
    need_ggx = _present(fam, ir.MAT_PLASTIC, ir.MAT_UBER, ir.MAT_METAL,
                        ir.MAT_SUBSTRATE, ir.MAT_ROUGHGLASS,
                        ir.MAT_DISNEY, ir.MAT_SUBSURFACE,
                        ir.MAT_KDSUBSURFACE)
    need_rt = _present(fam, ir.MAT_ROUGHGLASS, ir.MAT_DISNEY)
    wi_diff = sampling.cosine_sample_hemisphere(u1, u2) * jnp.concatenate(
        [jnp.ones_like(sgn), jnp.ones_like(sgn), sgn], -1)
    wi = wi_diff
    if need_ggx:
        wh = mf_sample_wh(wo, u1, u2, jnp.maximum(ax, 1e-4),
                          jnp.maximum(ay, 1e-4), params.beckmann)
        wi_ggx = geom.reflect(wo, wh)
        # choose among lobes: uniform over present lobes (BSDF::Sample_f)
        two_lobe = has_ggx_diel | is_substrate
        pick_spec = (two_lobe & (u_lobe >= 0.5)) | is_metal
        wi = jnp.where(pick_spec[..., None], wi_ggx, wi_diff)
    if need_rt:
        # rough-glass transmission: refract wo about sampled wh
        eta_rg = jnp.where(cos_theta(wo) > 0, 1.0 / params.eta,
                           params.eta)
        can_rt, wi_rt = geom.refract(wo, jnp.where(
            geom.dot(wo, wh)[..., None] >= 0, wh, -wh), eta_rg)
    if _present(fam, ir.MAT_ROUGHGLASS):
        # rough glass: reflect/transmit half-half
        wi_rg = jnp.where((u_lobe < 0.5)[..., None], wi_ggx,
                          jnp.where(can_rt[..., None], wi_rt, wi_ggx))
        wi = jnp.where(is_rglass[..., None], wi_rg, wi)
    if _present(fam, ir.MAT_TRANSLUCENT):
        # translucent: flip hemisphere for the transmission half
        wi_tr = jnp.where((u_lobe < 0.5)[..., None], wi_diff,
                          wi_diff * jnp.asarray([1.0, 1.0, -1.0]))
        wi = jnp.where(is_transl[..., None], wi_tr, wi)
    if _present(fam, ir.MAT_RETRO):
        # retro lobe: GGX-shaped spread around +wo
        a2 = jnp.maximum(ax, 1e-3) ** 2
        cos_rr = jnp.sqrt(jnp.maximum(
            (1.0 - u1) / jnp.maximum(u1 * (a2 - 1.0) + 1.0, 1e-9), 0.0))
        sin_rr = jnp.sqrt(jnp.maximum(1.0 - cos_rr * cos_rr, 1e-14))
        phi_r = 2 * PI * u2
        b1v, b2v = geom.coordinate_system(wo)
        wi_retro = geom.normalize(
            (sin_rr * jnp.cos(phi_r))[..., None] * b1v
            + (sin_rr * jnp.sin(phi_r))[..., None] * b2v
            + cos_rr[..., None] * wo)
        # retro: diffuse half / retro half
        wi_re = jnp.where((u_lobe < 0.5)[..., None], wi_diff, wi_retro)
        wi = jnp.where(is_retro[..., None], wi_re, wi)
    # disney: mixture over (cosine, GGX spec, GTR1 clearcoat, specTrans)
    # with the same per-lane probabilities _disney_pdf integrates
    is_disney = t == ir.MAT_DISNEY
    if params.disney is not None:
        dw = _disney_weights(params)
        dc1 = dw[..., 0]
        dc2 = dc1 + dw[..., 1]
        dc3 = dc2 + dw[..., 2]
        cc_gloss_s = _disney_unpack(params)[5]
        acc_s = 0.1 * (1.0 - cc_gloss_s) + 0.001 * cc_gloss_s
        a2c = jnp.clip(acc_s * acc_s, 1e-6, 1.0 - 1e-4)
        ch2 = jnp.clip((1.0 - a2c ** (1.0 - u1)) / (1.0 - a2c), 0.0, 1.0)
        ch = jnp.sqrt(ch2)
        shc = jnp.sqrt(jnp.maximum(1.0 - ch2, 1e-14))
        phic = 2 * PI * u2
        wh_cc = jnp.concatenate(
            [(shc * jnp.cos(phic))[..., None],
             (shc * jnp.sin(phic))[..., None],
             ch[..., None] * sgn], -1)
        wi_cc = geom.reflect(wo, wh_cc)
        wi_dis = jnp.where(
            (u_lobe < dc1)[..., None], wi_diff,
            jnp.where((u_lobe < dc2)[..., None], wi_ggx,
                      jnp.where((u_lobe < dc3)[..., None], wi_cc,
                                jnp.where(can_rt[..., None], wi_rt,
                                          wi_ggx))))
        wi = jnp.where(is_disney[..., None], wi_dis, wi)
    # hair: full Chiang-model importance sampling (hair.cpp:389)
    if params.hair_h is not None:
        from pbrt_tpu.materials import hair as hairmod
        is_hair = t == ir.MAT_HAIR
        if u3 is None:
            from pbrt_tpu.core import rng as _rng
            u3v = _rng.uniform_float(_rng.hash_combine(
                (u1 * 16777216.0).astype(jnp.uint32),
                (u2 * 16777216.0).astype(jnp.uint32)))
        else:
            u3v = u3
        u_h = jnp.stack([u_lobe, u1, u2, u3v], -1)
        wi_hair, _, _ = hairmod.hair_sample(
            wo, params.hair_h, params.kd, u_h, eta=params.eta,
            beta_m=params.rough_u, beta_n=params.rough_v,
            alpha=params.sigma * (PI / 180.0))
        wi = jnp.where(is_hair[..., None], wi_hair, wi)
    else:
        is_hair = jnp.zeros_like(t, bool)
    # fourier: invert the baked cell CDFs (FourierBSDF::Sample_f,
    # reflection.cpp:491-573); the matching density lives in pdf_f
    if params.fourier_id is not None:
        from pbrt_tpu.materials import fourier as fouriermod
        is_four = t == ir.MAT_FOURIER
        if params.fourier_a0 is not None:
            wi_four = wi_diff
            for gi in range(params.fourier_grid.shape[0]):
                wi_g = fouriermod.sample_grid_cr(
                    params.fourier_a0[gi], params.fourier_lum[gi],
                    wo, u_lobe, u1, u2)
                wi_four = jnp.where((params.fourier_id == gi)[..., None],
                                    wi_g, wi_four)
        else:   # no CDFs bound: two-sided cosine fallback
            wi_four = jnp.where((u_lobe < 0.5)[..., None], wi_diff,
                                wi_diff * jnp.asarray([1.0, 1.0, -1.0]))
        wi = jnp.where(is_four[..., None], wi_four, wi)
    else:
        is_four = jnp.zeros_like(t, bool)

    # delta lobes
    is_none = t == ir.MAT_NONE
    entering = cos_theta(wo) > 0
    has_mirror = _present(fam, ir.MAT_MIRROR, ir.MAT_GLASS,
                          ir.MAT_SUBSURFACE, ir.MAT_KDSUBSURFACE)
    has_glass = _present(fam, ir.MAT_GLASS)
    if has_mirror:
        wi_mirror = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], -1)
        wi = jnp.where(is_mirror[..., None], wi_mirror, wi)
    if has_glass:
        # smooth glass: Fresnel-weighted reflect/transmit
        F = fresnel_dielectric(cos_theta(wo), 1.0, params.eta)
        eta_ratio = jnp.where(entering, 1.0 / params.eta, params.eta)
        n_up = jnp.concatenate([jnp.zeros_like(sgn), jnp.zeros_like(sgn),
                                sgn], -1)
        can_refract, wi_t = geom.refract(wo, n_up, eta_ratio)
        do_reflect = (u_lobe < F) | ~can_refract
        wi_glass = jnp.where(do_reflect[..., None], wi_mirror, wi_t)
        wi = jnp.where(is_glass[..., None], wi_glass, wi)
    else:
        do_reflect = jnp.zeros_like(u_lobe, bool)
    # null "interface" material: pass straight through unchanged
    # (reference: nullptr material boundary skip, path.cpp:115-120)
    wi = jnp.where(is_none[..., None], -wo, wi)
    wi = geom.normalize(wi)

    # pdf+f for non-delta
    f = eval_f(params, wo, wi)
    pdf = pdf_f(params, wo, wi)

    # delta overrides
    abs_ci = jnp.maximum(abs_cos_theta(wi), 1e-9)
    if has_mirror:
        f_mirror = params.kr / abs_ci[..., None]
        f = jnp.where(is_mirror[..., None], f_mirror, f)
        pdf = jnp.where(is_mirror, 1.0, pdf)
    if has_glass:
        # glass: reflect f = F kr/|cos|; transmit (1-F) kt eta_ratio^2/|cos|
        f_glass_r = (F / abs_ci)[..., None] * params.kr
        f_glass_t = (((1.0 - F) * eta_ratio * eta_ratio)
                     / abs_ci)[..., None] * params.kt
        f_glass = jnp.where(do_reflect[..., None], f_glass_r, f_glass_t)
        pdf_glass = jnp.where(do_reflect, jnp.where(can_refract, F, 1.0),
                              1.0 - F)
        f = jnp.where(is_glass[..., None], f_glass, f)
        pdf = jnp.where(is_glass, pdf_glass, pdf)
    f = jnp.where(is_none[..., None], 1.0 / abs_ci[..., None], f)
    pdf = jnp.where(is_none, 1.0, pdf)

    # uber passthrough override (after every other lobe); the (1-p_tr)
    # lobe-selection factor for the surface lobes lives in pdf_f
    if _present(fam, ir.MAT_UBER):
        wi = jnp.where(pick_pass[..., None], geom.normalize(-wo), wi)
        abs_ci = jnp.maximum(abs_cos_theta(wi), 1e-9)
        f = jnp.where(pick_pass[..., None],
                      transp / (abs_ci[..., None]
                                * jnp.maximum(p_tr, 1e-6)[..., None]), f)
        pdf = jnp.where(pick_pass, 1.0, pdf)

    transmitted = (is_glass & ~do_reflect) |         ((is_rglass | is_disney | is_hair | is_four)
         & ~same_hemisphere(wo, wi)) |         (is_transl & ~same_hemisphere(wo, wi)) | pick_pass
    # etaScale update: eta^2 entering, 1/eta^2 exiting (path.cpp:150-156)
    eta_fac = jnp.where(transmitted & (is_glass | is_rglass | is_disney),
                        jnp.where(entering, params.eta ** 2,
                                  1.0 / params.eta ** 2), 1.0)
    return wi, f, pdf, is_delta | pick_pass, transmitted, eta_fac
