"""Monte-Carlo sampling utilities (reference: src/core/sampling.{h,cpp}).

Distribution1D/2D become CDF tensors sampled by `searchsorted`; the warping
functions are straight formula ports that broadcast over batches.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import geometry as geom

PI = float(np.pi)
INV_PI = float(1.0 / np.pi)
INV_2PI = float(0.5 / np.pi)
INV_4PI = float(0.25 / np.pi)


# ---------------------------------------------------------------------------
# Distribution1D (reference: sampling.h:55-120)
# ---------------------------------------------------------------------------

def build_distribution_1d(f):
    """f: [..., n] nonneg function values -> (cdf [..., n+1], func_int [...]).

    cdf[..., i] = P(X < i/n); func_int = mean of f (== integral over [0,1)
    with uniform spacing), matching the reference's funcInt.
    """
    f = jnp.asarray(f)
    n = f.shape[-1]
    c = jnp.cumsum(f, axis=-1) / n
    func_int = c[..., -1]
    zeros = jnp.zeros(f.shape[:-1] + (1,), f.dtype)
    safe = jnp.where(func_int[..., None] > 0, func_int[..., None], 1.0)
    cdf = jnp.concatenate([zeros, c / safe], axis=-1)
    # degenerate: uniform cdf
    uniform = jnp.linspace(0.0, 1.0, n + 1, dtype=f.dtype)
    cdf = jnp.where(func_int[..., None] > 0, cdf, uniform)
    return cdf, func_int


def sample_distribution_1d_continuous(cdf, func_int, func, u):
    """Sample x in [0,1) ~ func; returns (x, pdf, offset).

    cdf: [n+1], func: [n], u: [...] uniforms.  (reference:
    Distribution1D::SampleContinuous, sampling.h:77)
    """
    n = func.shape[-1]
    offset = jnp.clip(jnp.searchsorted(cdf, u, side="right") - 1, 0, n - 1)
    c0 = jnp.take(cdf, offset)
    c1 = jnp.take(cdf, offset + 1)
    du = jnp.where(c1 > c0, (u - c0) / jnp.maximum(c1 - c0, 1e-20), 0.0)
    x = (offset.astype(u.dtype) + du) / n
    fo = jnp.take(func, offset)
    pdf = jnp.where(func_int > 0, fo / jnp.maximum(func_int, 1e-20), 0.0)
    return x, pdf, offset


def sample_distribution_1d_discrete(cdf, func_int, func, u):
    """Sample an index ~ func; returns (idx, pmf)."""
    n = func.shape[-1]
    idx = jnp.clip(jnp.searchsorted(cdf, u, side="right") - 1, 0, n - 1)
    pmf = jnp.take(func, idx) / jnp.maximum(func_int * n, 1e-20)
    return idx, pmf


def pdf_distribution_1d_discrete(func, func_int, idx):
    n = func.shape[-1]
    return jnp.take(func, idx) / jnp.maximum(func_int * n, 1e-20)


# ---------------------------------------------------------------------------
# Distribution2D (reference: sampling.h:123-165) — for env-map importance
# ---------------------------------------------------------------------------

class Distribution2D:
    """Host-built 2D piecewise-constant distribution over [0,1)^2.

    Holds jnp tensors: conditional cdfs [nv, nu+1], marginal cdf [nv+1].
    """

    def __init__(self, f):
        f = jnp.asarray(f)  # [nv, nu]
        self.nv, self.nu = f.shape
        self.func = f
        self.cond_cdf, self.cond_int = build_distribution_1d(f)  # [nv, nu+1], [nv]
        self.marg_cdf, self.marg_int = build_distribution_1d(self.cond_int)

    def sample(self, u1, u2):
        """Returns ((u, v), pdf)."""
        v, pdf_v, iv = sample_distribution_1d_continuous(
            self.marg_cdf, self.marg_int, self.cond_int, u2)
        cdf_row = self.cond_cdf[iv]           # [..., nu+1]
        func_row = self.func[iv]              # [..., nu]
        int_row = self.cond_int[iv]
        n = self.nu
        off = jnp.clip(
            jnp.sum((cdf_row <= u1[..., None]).astype(jnp.int32), -1) - 1, 0, n - 1)
        c0 = jnp.take_along_axis(cdf_row, off[..., None], -1)[..., 0]
        c1 = jnp.take_along_axis(cdf_row, off[..., None] + 1, -1)[..., 0]
        du = jnp.where(c1 > c0, (u1 - c0) / jnp.maximum(c1 - c0, 1e-20), 0.0)
        u = (off.astype(u1.dtype) + du) / n
        fo = jnp.take_along_axis(func_row, off[..., None], -1)[..., 0]
        pdf_u = jnp.where(int_row > 0, fo / jnp.maximum(int_row, 1e-20), 0.0)
        return (u, v), pdf_u * pdf_v

    def pdf(self, u, v):
        iu = jnp.clip((u * self.nu).astype(jnp.int32), 0, self.nu - 1)
        iv = jnp.clip((v * self.nv).astype(jnp.int32), 0, self.nv - 1)
        return self.func[iv, iu] / jnp.maximum(self.marg_int, 1e-20)


# ---------------------------------------------------------------------------
# warps (reference: sampling.cpp)
# ---------------------------------------------------------------------------

def uniform_sample_hemisphere(u1, u2):
    z = u1
    r = jnp.sqrt(jnp.maximum(1e-14, 1.0 - z * z))
    phi = 2 * PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)


def uniform_sample_sphere(u1, u2):
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(1e-14, 1.0 - z * z))
    phi = 2 * PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)


def concentric_sample_disk(u1, u2):
    """Shirley-Chiu concentric map (reference: sampling.cpp:113)."""
    ox = 2.0 * u1 - 1.0
    oy = 2.0 * u2 - 1.0
    zero = (ox == 0.0) & (oy == 0.0)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    theta = jnp.where(use_x,
                      (PI / 4.0) * (oy / jnp.where(ox == 0, 1.0, ox)),
                      (PI / 2.0) - (PI / 4.0) * (ox / jnp.where(oy == 0, 1.0, oy)))
    x = jnp.where(zero, 0.0, r * jnp.cos(theta))
    y = jnp.where(zero, 0.0, r * jnp.sin(theta))
    return jnp.stack([x, y], -1)


def cosine_sample_hemisphere(u1, u2):
    d = concentric_sample_disk(u1, u2)
    z = jnp.sqrt(jnp.maximum(1e-14, 1.0 - d[..., 0] ** 2 - d[..., 1] ** 2))
    return jnp.stack([d[..., 0], d[..., 1], z], -1)


def cosine_hemisphere_pdf(cos_theta):
    return cos_theta * INV_PI


def uniform_cone_pdf(cos_theta_max):
    return 1.0 / (2 * PI * jnp.maximum(1.0 - cos_theta_max, 1e-9))


def uniform_sample_cone(u1, u2, cos_theta_max):
    cos_t = (1.0 - u1) + u1 * cos_theta_max
    sin_t = jnp.sqrt(jnp.maximum(1e-14, 1.0 - cos_t * cos_t))
    phi = 2 * PI * u2
    return geom.spherical_direction(sin_t, cos_t, phi)


def uniform_sample_triangle(u1, u2):
    """Barycentric (b0, b1) (reference: sampling.cpp:186)."""
    su0 = jnp.sqrt(jnp.maximum(u1, 1e-14))
    return jnp.stack([1.0 - su0, u2 * su0], -1)


# ---------------------------------------------------------------------------
# MIS heuristics (reference: sampling.h:167-171)
# ---------------------------------------------------------------------------

def balance_heuristic(nf, f_pdf, ng, g_pdf):
    return (nf * f_pdf) / jnp.maximum(nf * f_pdf + ng * g_pdf, 1e-20)


def power_heuristic(nf, f_pdf, ng, g_pdf):
    f = nf * f_pdf
    g = ng * g_pdf
    return (f * f) / jnp.maximum(f * f + g * g, 1e-20)
