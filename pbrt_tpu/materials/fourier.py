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
