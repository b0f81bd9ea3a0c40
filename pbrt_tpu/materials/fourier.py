"""FourierBSDF (measured/layered materials) — reference:
materials/fourier.cpp (SCATFUN v1 layerlab files, Jakob et al. 2014) and
core/reflection.cpp FourierBSDF::f (Catmull-Rom x Fourier evaluation).

TPU-first redesign: the reference evaluates a ragged Fourier series per
(muI, muO) spline cell at every shading point — pointer-chasing into
variable-length coefficient runs, which maps terribly onto a vector
machine.  Here the whole table is **baked once at scene compile** into a
regular (muI, muO, dPhi) lattice (numpy, exact Fourier summation at the
lattice nodes); runtime evaluation is one trilinear gather from a dense
[NM, NM, NP, 3] grid.  Smooth measured BSDFs lose nothing measurable at
64^3 resolution, and the hot path stays gather+FMA only.
"""
from __future__ import annotations

import struct

import numpy as np
import jax.numpy as jnp

HEADER = b"SCATFUN\x01"


def read_bsdf(filename):
    """Parse a SCATFUN v1 .bsdf file -> dict (fourier.cpp:105-214)."""
    with open(filename, "rb") as f:
        if f.read(8) != HEADER:
            raise ValueError(f"{filename}: not a SCATFUN v1 file")
        (flags, n_mu, n_coeffs, m_max, n_channels, n_bases, _, _, _,
         ) = struct.unpack("<9i", f.read(36))
        (eta,) = struct.unpack("<f", f.read(4))
        f.read(16)  # alpha[2] + unused[2]
        if flags != 1 or n_channels not in (1, 3) or n_bases != 1:
            raise ValueError(f"{filename}: unsupported BSDF variant")
        mu = np.frombuffer(f.read(4 * n_mu), "<f4")
        cdf = np.frombuffer(f.read(4 * n_mu * n_mu),
                            "<f4").reshape(n_mu, n_mu)
        off_len = np.frombuffer(f.read(4 * n_mu * n_mu * 2),
                                "<i4").reshape(n_mu, n_mu, 2)
        a = np.frombuffer(f.read(4 * n_coeffs), "<f4")
    return dict(mu=mu.astype(np.float64), cdf=cdf,
                a_offset=off_len[..., 0], m=off_len[..., 1],
                a=a.astype(np.float64), m_max=m_max,
                n_channels=n_channels, eta=float(eta))


def write_bsdf(filename, mu, coeffs, n_channels=1, eta=1.0):
    """Write a SCATFUN file (for tests/tools; inverse of read_bsdf).
    coeffs: nested [n_mu][n_mu] lists of [m*n_channels] arrays."""
    n_mu = len(mu)
    flat, offsets, lengths = [], np.zeros((n_mu, n_mu), np.int32), \
        np.zeros((n_mu, n_mu), np.int32)
    for i in range(n_mu):
        for o in range(n_mu):
            c = np.asarray(coeffs[i][o], np.float32).reshape(-1)
            offsets[i, o] = len(flat)
            lengths[i, o] = len(c) // n_channels
            flat.extend(c.tolist())
    flat = np.asarray(flat, np.float32)
    m_max = int(lengths.max())
    with open(filename, "wb") as f:
        f.write(HEADER)
        f.write(struct.pack("<9i", 1, n_mu, len(flat), m_max, n_channels,
                            1, 0, 0, 0))
        f.write(struct.pack("<f", eta))
        f.write(struct.pack("<4f", 0.0, 0.0, 0.0, 0.0))
        f.write(np.asarray(mu, np.float32).tobytes())
        f.write(np.zeros((n_mu, n_mu), np.float32).tobytes())  # cdf
        ol = np.stack([offsets, lengths], -1).astype("<i4")
        f.write(ol.tobytes())
        f.write(flat.tobytes())


def _catmull_rom_weights(nodes, x):
    """The reference's CatmullRomWeights (interpolation.cpp:47): 4
    weights over nodes[offset..offset+3] (offset may be -1 with a zero
    first weight; callers clamp the index)."""
    n = len(nodes)
    if x < nodes[0] or x > nodes[-1]:
        return None
    i = int(np.clip(np.searchsorted(nodes, x, side="right") - 1,
                    0, n - 2))
    x0, x1 = nodes[i], nodes[i + 1]
    t = (x - x0) / (x1 - x0) if x1 > x0 else 0.0
    t2, t3 = t * t, t * t * t
    w = np.zeros(4)
    w[1] = 2 * t3 - 3 * t2 + 1
    w[2] = -2 * t3 + 3 * t2
    if i > 0:
        w0 = (t3 - 2 * t2 + t) * (x1 - x0) / (x1 - nodes[i - 1])
        w[0] = -w0
        w[2] += w0
    else:
        w0 = t3 - 2 * t2 + t
        w[0] = 0.0
        w[1] -= w0
        w[2] += w0
    if i + 2 < n:
        w3 = (t3 - t2) * (x1 - x0) / (nodes[i + 2] - x0)
        w[1] -= w3
        w[3] = w3
    else:
        w3 = t3 - t2
        w[1] -= w3
        w[2] += w3
        w[3] = 0.0
    return i - 1, w


def _ak(tab, mu_i, mu_o):
    """Spline-weighted Fourier coefficients at (muI, muO) — the inner
    accumulation of FourierBSDF::f (reflection.cpp:380-404).
    Returns [m_max, n_channels]."""
    nc = tab["n_channels"]
    wi = _catmull_rom_weights(tab["mu"], mu_i)
    wo = _catmull_rom_weights(tab["mu"], mu_o)
    ak = np.zeros((tab["m_max"], nc))
    if wi is None or wo is None:
        return ak
    oi, wgt_i = wi
    oo, wgt_o = wo
    n = len(tab["mu"])
    for a in range(4):
        if wgt_i[a] == 0:
            continue
        ii = np.clip(oi + a, 0, n - 1)
        for b in range(4):
            w = wgt_o[b] * wgt_i[a]
            if w == 0:
                continue
            jj = np.clip(oo + b, 0, n - 1)
            m = tab["m"][ii, jj]
            if m == 0:
                continue
            off = tab["a_offset"][ii, jj]
            c = tab["a"][off:off + m * nc].reshape(nc, m)
            ak[:m] += w * c.T
    return ak


def bake_grid(tab, n_mu=64, n_phi=64):
    """Compile-time bake: regular lattice over (muI, muO, phi in [0,pi])
    of the **BSDF value f** (the stored series divided by |muI|,
    reflection.cpp:428 scale).  Returns grid [NM,NM,NP,3] float32."""
    mu_axis = np.linspace(-1.0, 1.0, n_mu)
    phi_axis = np.linspace(0.0, np.pi, n_phi)
    nc = tab["n_channels"]
    cosmat = np.cos(np.outer(phi_axis, np.arange(tab["m_max"])))
    grid = np.zeros((n_mu, n_mu, n_phi, nc), np.float32)
    for i, mi in enumerate(mu_axis):
        for o, mo in enumerate(mu_axis):
            grid[i, o] = np.maximum(cosmat @ _ak(tab, mi, mo), 0.0)
    grid /= np.maximum(np.abs(mu_axis)[:, None, None, None], 1e-3)
    if nc == 1:
        grid = np.repeat(grid, 3, axis=-1)
    else:
        # stored channels are (Y, R, B); G from the luminance identity
        # (reflection.cpp:412-415)
        y, r, b = grid[..., 0], grid[..., 1], grid[..., 2]
        g = 1.39829 * y - 0.100913 * b - 0.297375 * r
        grid = np.stack([r, g, b], -1)
    return np.maximum(grid, 0.0)


def bake_sampling(grid):
    """Compile-time bake of importance-sampling CDFs from the value
    lattice (reference: FourierBSDF::Sample_f inverts precomputed
    Catmull-Rom CDFs, reflection.cpp:491-573 + SampleFourier).

    Cells live between lattice points: (NM-1) muI x (NM-1) muO x (NP-1)
    dphi, weighted by corner-averaged luminance * |muI| (an f*cos
    importance) plus a tiny floor so the pdf is nonzero wherever f is.
    Returns (cdf_mu [NMo-1, NMi], cdf_phi [NMo-1, NMi-1, NP]) — each a
    CDF with leading 0, i.e. sized cells+1 along the last axis."""
    lum = grid.astype(np.float64) @ np.asarray([0.2126, 0.7152, 0.0722])
    nm, _, npphi = lum.shape
    mu_axis = np.linspace(-1.0, 1.0, nm)
    # corner-average to cells, weight by |mu_i| at the cell center
    c = 0.25 * (lum[:-1, :-1, :] + lum[1:, :-1, :]
                + lum[:-1, 1:, :] + lum[1:, 1:, :])
    c = 0.5 * (c[:, :, :-1] + c[:, :, 1:])          # [NMi-1, NMo-1, NPc]
    mu_c = 0.5 * (mu_axis[:-1] + mu_axis[1:])
    w = c * np.abs(mu_c)[:, None, None]
    w = w + max(w.max(), 1e-9) * 1e-5               # coverage floor
    w = np.transpose(w, (1, 0, 2))                  # [NMo-1, NMi-1, NPc]
    m = w.sum(-1)                                   # [NMo-1, NMi-1]
    cdf_mu = np.zeros((m.shape[0], m.shape[1] + 1))
    cdf_mu[:, 1:] = np.cumsum(m, -1) / m.sum(-1, keepdims=True)
    cdf_phi = np.zeros(w.shape[:2] + (w.shape[2] + 1,))
    cdf_phi[..., 1:] = np.cumsum(w, -1) / w.sum(-1, keepdims=True)
    return cdf_mu.astype(np.float32), cdf_phi.astype(np.float32)


def _mu_cell(x, n_cells):
    """Cell index of x in the uniform [-1,1] lattice with n_cells."""
    t = (x + 1.0) * 0.5 * n_cells
    return jnp.clip(t.astype(jnp.int32), 0, n_cells - 1)


def sample_grid(cdf_mu, cdf_phi, wo, u_sign, u1, u2):
    """Draw wi from the baked cell CDFs; pdf comes from pdf_grid (the
    density is piecewise-constant per cell, so the pair is exactly
    consistent).  u_sign picks the azimuth mirror side."""
    n_mu = cdf_mu.shape[1] - 1                      # muI cells
    n_phi = cdf_phi.shape[2] - 1
    o = _mu_cell(wo[..., 2], cdf_mu.shape[0])
    row_mu = cdf_mu[o]                              # [B, n_mu+1]
    i = jnp.clip(jnp.sum((row_mu <= u1[..., None]).astype(jnp.int32), -1)
                 - 1, 0, n_mu - 1)
    c0 = jnp.take_along_axis(row_mu, i[..., None], 1)[..., 0]
    c1 = jnp.take_along_axis(row_mu, i[..., None] + 1, 1)[..., 0]
    fi = jnp.clip((u1 - c0) / jnp.maximum(c1 - c0, 1e-12), 0.0, 0.999999)
    mu_i = -1.0 + (i.astype(u1.dtype) + fi) * (2.0 / n_mu)
    row_phi = cdf_phi[o, i]                         # [B, n_phi+1]
    p = jnp.clip(jnp.sum((row_phi <= u2[..., None]).astype(jnp.int32), -1)
                 - 1, 0, n_phi - 1)
    p0 = jnp.take_along_axis(row_phi, p[..., None], 1)[..., 0]
    p1 = jnp.take_along_axis(row_phi, p[..., None] + 1, 1)[..., 0]
    fp = jnp.clip((u2 - p0) / jnp.maximum(p1 - p0, 1e-12), 0.0, 0.999999)
    dphi = (p.astype(u2.dtype) + fp) * (jnp.pi / n_phi)
    sgn = jnp.where(u_sign < 0.5, 1.0, -1.0)
    # mu_i parameterizes -wi (eval_grid convention)
    phi_w = jnp.arctan2(wo[..., 1], wo[..., 0]) + sgn * dphi
    sin_i = jnp.sqrt(jnp.maximum(1.0 - mu_i * mu_i, 0.0))
    neg_wi = jnp.stack([sin_i * jnp.cos(phi_w), sin_i * jnp.sin(phi_w),
                        mu_i], -1)
    return -neg_wi


def pdf_grid(cdf_mu, cdf_phi, wo, wi):
    """Solid-angle density of sample_grid at (wo, wi): cell probability
    over the cell measure dmu*dphi (dw = dmu dphi exactly), halved for
    the azimuth mirror choice."""
    n_mu = cdf_mu.shape[1] - 1
    n_phi = cdf_phi.shape[2] - 1
    o = _mu_cell(wo[..., 2], cdf_mu.shape[0])
    mu_i = -wi[..., 2]
    i = _mu_cell(mu_i, n_mu)
    xi, yi = -wi[..., 0], -wi[..., 1]
    xo, yo = wo[..., 0], wo[..., 1]
    li = jnp.sqrt(xi * xi + yi * yi)
    lo = jnp.sqrt(xo * xo + yo * yo)
    cos_dphi = jnp.where((li > 1e-9) & (lo > 1e-9),
                         jnp.clip((xi * xo + yi * yo)
                                  / jnp.maximum(li * lo, 1e-9), -1, 1),
                         1.0)
    dphi = jnp.arccos(cos_dphi)
    p = jnp.clip((dphi / jnp.pi * n_phi).astype(jnp.int32), 0, n_phi - 1)
    row_mu = cdf_mu[o]
    pr_i = (jnp.take_along_axis(row_mu, i[..., None] + 1, 1)
            - jnp.take_along_axis(row_mu, i[..., None], 1))[..., 0]
    row_phi = cdf_phi[o, i]
    pr_p = (jnp.take_along_axis(row_phi, p[..., None] + 1, 1)
            - jnp.take_along_axis(row_phi, p[..., None], 1))[..., 0]
    dmu = 2.0 / n_mu
    dph = jnp.pi / n_phi
    return 0.5 * pr_i * pr_p / (dmu * dph)


def eval_grid(grid, wo, wi):
    """Trilinear lookup f(wo, wi) -> RGB [B,3] (jnp, batched).

    Axes: muI = cos_theta(-wi), muO = cos_theta(wo), phi = azimuth
    difference of (-wi, wo) — matching FourierBSDF::f conventions."""
    nm, _, npphi, _ = grid.shape
    mu_i = -wi[..., 2]
    mu_o = wo[..., 2]
    # cos dPhi between -wi and wo in the tangent plane
    xi, yi = -wi[..., 0], -wi[..., 1]
    xo, yo = wo[..., 0], wo[..., 1]
    li = jnp.sqrt(xi * xi + yi * yi)
    lo = jnp.sqrt(xo * xo + yo * yo)
    cos_dphi = jnp.where((li > 1e-9) & (lo > 1e-9),
                         jnp.clip((xi * xo + yi * yo)
                                  / jnp.maximum(li * lo, 1e-9), -1, 1),
                         1.0)
    phi = jnp.arccos(cos_dphi)

    def axis_lookup(x, lo_v, hi_v, n):
        t = (x - lo_v) / (hi_v - lo_v) * (n - 1)
        t = jnp.clip(t, 0.0, n - 1 - 1e-4)
        i0 = jnp.floor(t).astype(jnp.int32)
        return i0, t - i0

    i0, fi = axis_lookup(mu_i, -1.0, 1.0, nm)
    o0, fo = axis_lookup(mu_o, -1.0, 1.0, nm)
    p0, fp = axis_lookup(phi, 0.0, np.pi, npphi)
    out = 0.0
    for di in (0, 1):
        for do in (0, 1):
            for dp in (0, 1):
                w = (jnp.where(di, fi, 1 - fi)
                     * jnp.where(do, fo, 1 - fo)
                     * jnp.where(dp, fp, 1 - fp))
                out = out + w[..., None] * grid[i0 + di, o0 + do, p0 + dp]
    return out


# ---------------------------------------------------------------------------
# Catmull-Rom CDF inversion sampling (VERDICT r4 item 6)
# ---------------------------------------------------------------------------
# The reference importance-samples its measured BSDFs by analytically
# integrating the Catmull-Rom interpolant and inverting per segment
# with a Newton/bisection hybrid (SampleCatmullRom2D + the Fourier phi
# inversion, interpolation.cpp:172-300 / reflection.cpp:491-573).  The
# piecewise-constant cell CDFs used before diverge from that density at
# coarse grids; the functions below are the vectorized twin of the
# reference's spline inversion over the baked lattice: sampling density
# == the Catmull-Rom interpolant of the lattice marginals, exact
# per-segment integral, fixed-iteration Newton+bisection (TPU: no
# data-dependent loop trip counts).

_CR_NEWTON_ITERS = 12


def _cr_derivs(F):
    """Per-cell endpoint derivatives of the CR interpolant on a UNIFORM
    lattice, pbrt's finite differences (interpolation.cpp:266-276).
    F [..., N] -> (d0, d1) each [..., N-1] (scaled by cell width)."""
    interior = (F[..., 2:] - F[..., :-2]) * 0.5
    edge0 = (F[..., 1:2] - F[..., 0:1])
    edge1 = (F[..., -1:] - F[..., -2:-1])
    d0 = jnp.concatenate([edge0, interior], -1)
    d1 = jnp.concatenate([interior, edge1], -1)
    return d0, d1


def _cr_cell_integrals(F):
    """Exact integral of the CR spline over each cell, in cell-width
    units (IntegrateCatmullRom, interpolation.cpp:260-283)."""
    f0, f1 = F[..., :-1], F[..., 1:]
    d0, d1 = _cr_derivs(F)
    return (d0 - d1) * (1.0 / 12.0) + (f0 + f1) * 0.5


def _cr_sample_1d(F, u):
    """Draw x ~ CR-interpolant(F) over the uniform [0, N-1] lattice.

    F [B, N] non-negative node values; u [B] uniforms.  Returns
    (x [B] in [0, N-1] cell units, fhat [B] interpolant value at x,
    total [B] integral in cell units).  pdf per cell-unit = fhat/total;
    callers rescale by the physical cell width.  The inversion is the
    reference's Newton-with-bisection-bracket (interpolation.cpp:
    219-256) run a FIXED _CR_NEWTON_ITERS times (vectorized)."""
    I = jnp.maximum(_cr_cell_integrals(F), 0.0)
    cdf = jnp.cumsum(jnp.concatenate(
        [jnp.zeros_like(I[..., :1]), I], -1), -1)      # [B, N]
    total = jnp.maximum(cdf[..., -1], 1e-12)
    up = u * total
    idx = jnp.clip(jnp.sum((cdf <= up[..., None]).astype(jnp.int32), -1)
                   - 1, 0, F.shape[-1] - 2)
    take = lambda A, i: jnp.take_along_axis(A, i[..., None], -1)[..., 0]
    f0 = take(F, idx)
    f1 = take(F, idx + 1)
    d0a, d1a = _cr_derivs(F)
    d0 = take(d0a, idx)
    d1 = take(d1a, idx)
    uu = up - take(cdf, idx)                           # in cell units

    # initial guess: invert the linear interpolant
    lin = jnp.where(jnp.abs(f0 - f1) > 1e-12,
                    (f0 - jnp.sqrt(jnp.maximum(
                        f0 * f0 + 2.0 * uu * (f1 - f0), 0.0)))
                    / jnp.where(jnp.abs(f0 - f1) > 1e-12, f0 - f1, 1.0),
                    uu / jnp.maximum(f0, 1e-12))
    t = jnp.clip(lin, 0.0, 1.0)
    a = jnp.zeros_like(t)
    b = jnp.ones_like(t)
    fhat = f0
    for _ in range(_CR_NEWTON_ITERS):
        t = jnp.where((t >= a) & (t <= b), t, 0.5 * (a + b))
        Fhat = t * (f0 + t * (0.5 * d0 + t * (
            (1.0 / 3.0) * (-2.0 * d0 - d1) + f1 - f0
            + t * (0.25 * (d0 + d1) + 0.5 * (f0 - f1)))))
        fhat = f0 + t * (d0 + t * (-2.0 * d0 - d1 + 3.0 * (f1 - f0)
                                   + t * (d0 + d1 + 2.0 * (f0 - f1))))
        below = Fhat - uu < 0
        a = jnp.where(below, t, a)
        b = jnp.where(below, b, t)
        t = t - (Fhat - uu) / jnp.where(jnp.abs(fhat) > 1e-12, fhat, 1.0)
    t = jnp.clip(jnp.where(jnp.isfinite(t), t, 0.5), 0.0, 1.0)
    x = idx.astype(F.dtype) + t
    return x, jnp.maximum(fhat, 0.0), total


def _cr_eval_1d(F, x):
    """CR interpolant value + per-cell-unit integral total at x [B]
    (cell units) — the pdf-side twin of _cr_sample_1d."""
    N = F.shape[-1]
    idx = jnp.clip(x.astype(jnp.int32), 0, N - 2)
    t = jnp.clip(x - idx.astype(F.dtype), 0.0, 1.0)
    take = lambda A, i: jnp.take_along_axis(A, i[..., None], -1)[..., 0]
    f0 = take(F, idx)
    f1 = take(F, idx + 1)
    d0a, d1a = _cr_derivs(F)
    d0 = take(d0a, idx)
    d1 = take(d1a, idx)
    fhat = f0 + t * (d0 + t * (-2.0 * d0 - d1 + 3.0 * (f1 - f0)
                               + t * (d0 + d1 + 2.0 * (f0 - f1))))
    I = jnp.maximum(_cr_cell_integrals(F), 0.0)
    total = jnp.maximum(jnp.sum(I, -1), 1e-12)
    return jnp.maximum(fhat, 0.0), total


def _cr_weights_uniform(x, n):
    """Vectorized CatmullRomWeights (interpolation.cpp:47) on the
    uniform [0, n-1] lattice: returns (offset [B] = idx-1, may be -1,
    and w [B,4]) such that sum_k w[k] * F[clip(offset+k, 0, n-1)]
    interpolates F at x — out-of-range taps always carry weight 0, so
    clipping their index is safe."""
    idx = jnp.clip(x.astype(jnp.int32), 0, n - 2)
    t = jnp.clip(x - idx.astype(x.dtype), 0.0, 1.0)
    t2, t3 = t * t, t * t * t
    w1 = 2 * t3 - 3 * t2 + 1
    w2 = -2 * t3 + 3 * t2
    w0t = t3 - 2 * t2 + t
    w3t = t3 - t2
    first = idx == 0
    last = idx + 2 >= n
    w0 = jnp.where(first, 0.0, -0.5 * w0t)
    w1f = (w1 - jnp.where(first, w0t, 0.0)
           - jnp.where(last, w3t, 0.5 * w3t))
    w2f = (w2 + jnp.where(first, w0t, 0.5 * w0t)
           + jnp.where(last, w3t, 0.0))
    w3 = jnp.where(last, 0.0, 0.5 * w3t)
    w = jnp.stack([w0, w1f, w2f, w3], -1)
    return idx - 1, w


def _cr_taps(off, n):
    """Clipped 4-tap indices for a _cr_weights_uniform offset."""
    return jnp.clip(off[..., None] + jnp.arange(4), 0, n - 1)


def bake_cr_tables(grid):
    """Compile-time marginals for the CR sampler: a0 [NMi, NMo] =
    phi-average luminance x |mu_i| (the f*cos importance; the stored
    lattice is f = series/|muI|, so multiplying back recovers the
    series the reference's file CDFs integrate) and lum [NMi, NMo, NP]
    luminance lattice for the phi conditional."""
    lum = grid.astype(np.float64) @ np.asarray([0.2126, 0.7152, 0.0722])
    nm = lum.shape[0]
    mu_axis = np.linspace(-1.0, 1.0, nm)
    a0 = lum.mean(-1) * np.abs(mu_axis)[:, None]
    a0 = a0 + max(a0.max(), 1e-9) * 1e-5               # coverage floor
    return (a0.astype(np.float32),
            np.maximum(lum, lum.max() * 1e-6).astype(np.float32))


def sample_grid_cr(a0, lum, wo, u_sign, u1, u2):
    """Draw wi from the Catmull-Rom interpolated lattice marginals
    (SampleCatmullRom2D twin).  a0 [NMi, NMo]; lum [NMi, NMo, NP].
    Returns wi [B,3]; density from pdf_grid_cr (consistent pair)."""
    nm = a0.shape[0]
    npphi = lum.shape[2]
    # muO spline weights at wo.z
    xo = (wo[..., 2] + 1.0) * 0.5 * (nm - 1)
    o_off, o_w = _cr_weights_uniform(xo, nm)
    # conditional muI node values: CR-combine 4 muO rows
    rows = a0.T[_cr_taps(o_off, nm)]                   # [B,4,NMi]
    F_mu = jnp.einsum('bk,bkn->bn', o_w, rows)
    F_mu = jnp.maximum(F_mu, 0.0)
    x_mu, _, _ = _cr_sample_1d(F_mu, u1)
    mu_i = -1.0 + x_mu * (2.0 / (nm - 1))
    # phi conditional: CR in both mu axes -> [B, NP]
    i_off, i_w = _cr_weights_uniform(x_mu, nm)
    lum_oi = lum.transpose(1, 0, 2)                    # [NMo, NMi, NP]
    rows2 = lum_oi[_cr_taps(o_off, nm)[..., :, None],
                   _cr_taps(i_off, nm)[..., None, :]]
    G_phi = jnp.einsum('bk,bl,bklp->bp', o_w, i_w,
                       jnp.maximum(rows2, 0.0))
    G_phi = jnp.maximum(G_phi, 0.0)
    x_phi, _, _ = _cr_sample_1d(G_phi, u2)
    dphi = x_phi * (np.pi / (npphi - 1))
    sgn = jnp.where(u_sign < 0.5, 1.0, -1.0)
    phi_w = jnp.arctan2(wo[..., 1], wo[..., 0]) + sgn * dphi
    sin_i = jnp.sqrt(jnp.maximum(1.0 - mu_i * mu_i, 0.0))
    neg_wi = jnp.stack([sin_i * jnp.cos(phi_w), sin_i * jnp.sin(phi_w),
                        mu_i], -1)
    return -neg_wi


def pdf_grid_cr(a0, lum, wo, wi):
    """Solid-angle density of sample_grid_cr at (wo, wi): the CR
    interpolant values over their integrals (per-axis pdfs in mu/phi
    measure; dw = dmu dphi), halved for the azimuth mirror."""
    nm = a0.shape[0]
    npphi = lum.shape[2]
    xo = (wo[..., 2] + 1.0) * 0.5 * (nm - 1)
    o_off, o_w = _cr_weights_uniform(xo, nm)
    rows = a0.T[_cr_taps(o_off, nm)]
    F_mu = jnp.maximum(jnp.einsum('bk,bkn->bn', o_w, rows), 0.0)
    mu_i = -wi[..., 2]
    x_mu = (mu_i + 1.0) * 0.5 * (nm - 1)
    f_mu, tot_mu = _cr_eval_1d(F_mu, x_mu)
    h_mu = 2.0 / (nm - 1)
    pdf_mu = f_mu / (tot_mu * h_mu)
    # phi
    xi_, yi_ = -wi[..., 0], -wi[..., 1]
    xo_, yo_ = wo[..., 0], wo[..., 1]
    li = jnp.sqrt(xi_ * xi_ + yi_ * yi_)
    lo = jnp.sqrt(xo_ * xo_ + yo_ * yo_)
    cos_dphi = jnp.where((li > 1e-9) & (lo > 1e-9),
                         jnp.clip((xi_ * xo_ + yi_ * yo_)
                                  / jnp.maximum(li * lo, 1e-9), -1, 1),
                         1.0)
    dphi = jnp.arccos(cos_dphi)
    i_off, i_w = _cr_weights_uniform(x_mu, nm)
    lum_oi = lum.transpose(1, 0, 2)
    rows2 = lum_oi[_cr_taps(o_off, nm)[..., :, None],
                   _cr_taps(i_off, nm)[..., None, :]]
    G_phi = jnp.maximum(
        jnp.einsum('bk,bl,bklp->bp', o_w, i_w,
                   jnp.maximum(rows2, 0.0)), 0.0)
    x_phi = dphi / np.pi * (npphi - 1)
    f_phi, tot_phi = _cr_eval_1d(G_phi, x_phi)
    h_phi = np.pi / (npphi - 1)
    pdf_phi = f_phi / (tot_phi * h_phi)
    return 0.5 * jnp.maximum(pdf_mu, 0.0) * jnp.maximum(pdf_phi, 0.0)
