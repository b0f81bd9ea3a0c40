"""Spectral film: [H,W,31] accumulator + filter-weighted scatter-add splats.

Reference layer: src/core/film.{h,cpp} + src/filters/*.  The reference's
FilmTile/AtomicFloat merge machinery (film.cpp:124-154) collapses to a single
`scatter-add` over the sample batch; the filter is discretized into the same
16x16 quadrant table the reference precomputes (film.cpp:50-80), and each
sample splats to its (2R)^2-pixel footprint with gathered filter weights.

The fork's spectral `.dat` output (ISET format: text header "W H 31" + "v3" +
float64 band-sequential data, film.cpp:180-309) lives in film/io.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from pbrt_tpu.core import spectrum as spec

FILTER_TABLE_WIDTH = 16
INF_LUMINANCE = 1e30


# ---------------------------------------------------------------------------
# filters (reference: src/filters/{box,triangle,gaussian,mitchell,sinc}.cpp)
# ---------------------------------------------------------------------------

def filter_eval(name, x, y, rx, ry, params):
    """Evaluate filter kernel at offsets (x,y) from sample center (numpy)."""
    ax, ay = np.abs(x), np.abs(y)
    if name == "box":
        return np.where((ax <= rx) & (ay <= ry), 1.0, 0.0)
    if name == "triangle":
        return np.maximum(0.0, rx - ax) * np.maximum(0.0, ry - ay)
    if name == "gaussian":
        alpha = params.get("alpha", 2.0)
        def g(d, r):
            return np.maximum(0.0, np.exp(-alpha * d * d)
                              - np.exp(-alpha * r * r))
        return g(x, rx) * g(y, ry)
    if name == "mitchell":
        B = params.get("B", 1.0 / 3.0)
        C = params.get("C", 1.0 / 3.0)

        def m1d(v):
            v = np.abs(2.0 * v)
            out = np.where(
                v > 1,
                ((-B - 6 * C) * v ** 3 + (6 * B + 30 * C) * v * v
                 + (-12 * B - 48 * C) * v + (8 * B + 24 * C)) * (1.0 / 6.0),
                ((12 - 9 * B - 6 * C) * v ** 3
                 + (-18 + 12 * B + 6 * C) * v * v + (6 - 2 * B)) * (1.0 / 6.0))
            return np.where(v > 2, 0.0, out)
        return m1d(x / rx) * m1d(y / ry)
    if name == "sinc":
        tau = params.get("tau", 3.0)

        def ws(v, r):
            v = np.abs(v)
            s = np.where(v < 1e-5, 1.0, np.sin(np.pi * v) / np.maximum(np.pi * v, 1e-9))
            lanczos = np.where(v < 1e-5, 1.0,
                               np.sin(np.pi * v / tau) / np.maximum(np.pi * v / tau, 1e-9))
            return np.where(v > r, 0.0, s * lanczos)
        return ws(x, rx) * ws(y, ry)
    raise ValueError(f"unknown filter {name}")


@struct.dataclass
class Film:
    """Device film state."""
    weighted: jnp.ndarray    # [H,W,31] sum of filter-weighted radiance
    weight: jnp.ndarray      # [H,W] sum of filter weights
    raw: jnp.ndarray         # [H,W,31] unweighted per-pixel L sum — the
    #                          fork's Pixel::L for ISET .dat (film.h:63,89)
    splat: jnp.ndarray       # [H,W,31] unweighted splats (BDPT/MLT/SPPM)
    filter_table: jnp.ndarray  # [16,16] quadrant table
    radius: jnp.ndarray      # [2] filter radius (x, y)
    height: int = struct.field(pytree_node=False, default=0)
    width: int = struct.field(pytree_node=False, default=0)
    footprint: int = struct.field(pytree_node=False, default=1)
    # pbrt-exact boundary semantics: the reference CLAMPS the filter
    # table index (film.h:141-147), so a sample at distance exactly
    # `radius` from a pixel center still contributes with the edge-table
    # weight — with a box filter, a sample whose jitter is exactly 0.0
    # lands FULL weight in two pixels.  Production leaves this off (the
    # footprint stays minimal so the aligned fast path applies; the
    # Owen-scrambled samplers never emit exact-0 jitter), matched-RNG
    # parity renders turn it on (raw Sobol' emits 0.0 at sample 0).
    pbrt_boundary: bool = struct.field(pytree_node=False, default=False)


def make_film(width, height, filter_name="box", radius=None,
              pbrt_boundary=False, **filter_params):
    if radius is None:
        radius = {"box": (0.5, 0.5), "triangle": (2.0, 2.0),
                  "gaussian": (2.0, 2.0), "mitchell": (2.0, 2.0),
                  "sinc": (4.0, 4.0)}[filter_name]
    rx, ry = radius
    # quadrant filter table like the reference (film.cpp:50-80)
    ox = (np.arange(FILTER_TABLE_WIDTH) + 0.5) * rx / FILTER_TABLE_WIDTH
    oy = (np.arange(FILTER_TABLE_WIDTH) + 0.5) * ry / FILTER_TABLE_WIDTH
    X, Y = np.meshgrid(ox, oy, indexing="xy")
    table = filter_eval(filter_name, X, Y, rx, ry, filter_params)
    if pbrt_boundary:
        # widest possible pbrt footprint: Floor(pd+r)+1 - Ceil(pd-r)
        footprint = int(np.floor(2 * max(rx, ry))) + 1
    else:
        footprint = int(np.ceil(2 * max(rx, ry)))
    footprint = max(footprint, 1)
    return Film(
        weighted=jnp.zeros((height, width, spec.N_SPECTRAL_SAMPLES)),
        weight=jnp.zeros((height, width)),
        raw=jnp.zeros((height, width, spec.N_SPECTRAL_SAMPLES)),
        splat=jnp.zeros((height, width, spec.N_SPECTRAL_SAMPLES)),
        filter_table=jnp.asarray(table, jnp.float32),
        radius=jnp.asarray([rx, ry], jnp.float32),
        height=height, width=width, footprint=footprint,
        pbrt_boundary=pbrt_boundary)


def add_samples(film: Film, pfilm, L, ray_weight=None, aligned_base=None):
    """Splat a batch of samples.

    pfilm: [B,2] continuous film coords (x, y); L: [B,31]; ray_weight [B].
    Discrete-continuous convention matches the reference (film.h:123-163):
    sample at continuous p affects pixels within `radius` of p - 0.5.

    aligned_base: traced scalar pixel id of lane 0, promising lane i maps
    to pixel aligned_base+i (the render driver's contiguous full chunks).
    With a footprint-1 filter (radius <= 0.5, where a sample can only
    affect its own pixel) the scatter-add — a serial per-row loop on
    TPU — becomes a dynamic-slice add.
    """
    if ray_weight is None:
        ray_weight = jnp.ones(pfilm.shape[0])
    rx, ry = film.radius[0], film.radius[1]
    if aligned_base is not None and film.footprint == 1:
        return _add_samples_aligned(film, pfilm, L, ray_weight,
                                    aligned_base)
    pd = pfilm - 0.5
    x0 = jnp.ceil(pd[:, 0] - rx).astype(jnp.int32)
    y0 = jnp.ceil(pd[:, 1] - ry).astype(jnp.int32)
    F = film.footprint
    W, H = film.width, film.height
    weighted, weight = film.weighted, film.weight
    inv_rx = FILTER_TABLE_WIDTH / rx
    inv_ry = FILTER_TABLE_WIDTH / ry
    Lw = L * ray_weight[:, None]
    for dy in range(F):
        for dx in range(F):
            px = x0 + dx
            py = y0 + dy
            fx = jnp.abs(px.astype(jnp.float32) - pd[:, 0]) * inv_rx
            fy = jnp.abs(py.astype(jnp.float32) - pd[:, 1]) * inv_ry
            ix = jnp.minimum(fx.astype(jnp.int32), FILTER_TABLE_WIDTH - 1)
            iy = jnp.minimum(fy.astype(jnp.int32), FILTER_TABLE_WIDTH - 1)
            fw = film.filter_table[iy, ix]
            inb = (px >= 0) & (px < W) & (py >= 0) & (py < H)
            if film.pbrt_boundary:
                # reference semantics: pixel set is Ceil(pd-r)..Floor(pd+r)
                # inclusive, table index clamped (film.h:130-147)
                inb = inb & (px.astype(jnp.float32) <= pd[:, 0] + rx) & \
                    (py.astype(jnp.float32) <= pd[:, 1] + ry)
            else:
                inb = inb & (fx < FILTER_TABLE_WIDTH) & \
                    (fy < FILTER_TABLE_WIDTH)
            fw = jnp.where(inb, fw, 0.0)
            pxs = jnp.clip(px, 0, W - 1)
            pys = jnp.clip(py, 0, H - 1)
            weighted = weighted.at[pys, pxs].add(Lw * fw[:, None])
            weight = weight.at[pys, pxs].add(fw * ray_weight)
    # unweighted box accumulation (fork's spectral pixel.L path)
    bx = jnp.clip(pfilm[:, 0].astype(jnp.int32), 0, W - 1)
    by = jnp.clip(pfilm[:, 1].astype(jnp.int32), 0, H - 1)
    raw = film.raw.at[by, bx].add(Lw)
    return film.replace(weighted=weighted, weight=weight, raw=raw)


def _add_samples_aligned(film: Film, pfilm, L, ray_weight, base):
    """Footprint-1 contiguous-chunk splat: lane i -> pixel base+i, so the
    update is a dynamic-slice add on the flattened film (see add_samples).
    The filter weight is still evaluated exactly (a sample whose own
    pixel center lies outside a radius<0.5 kernel gets fw=0, matching
    the general path)."""
    import jax
    from pbrt_tpu.ops import fetch
    B = pfilm.shape[0]
    NS = L.shape[1]
    rx, ry = film.radius[0], film.radius[1]
    pd = pfilm - 0.5
    # own-pixel tap: the lane's pixel index comes from its id, which the
    # caller promises is base + lane
    px = (jnp.asarray(base, jnp.int32)
          + jnp.arange(B, dtype=jnp.int32)) % film.width
    py = (jnp.asarray(base, jnp.int32)
          + jnp.arange(B, dtype=jnp.int32)) // film.width
    fx = jnp.abs(px.astype(jnp.float32) - pd[:, 0]) * \
        (FILTER_TABLE_WIDTH / rx)
    fy = jnp.abs(py.astype(jnp.float32) - pd[:, 1]) * \
        (FILTER_TABLE_WIDTH / ry)
    ix = jnp.minimum(fx.astype(jnp.int32), FILTER_TABLE_WIDTH - 1)
    iy = jnp.minimum(fy.astype(jnp.int32), FILTER_TABLE_WIDTH - 1)
    fw = fetch.fetch_rows(
        film.filter_table.reshape(-1, 1),
        iy * FILTER_TABLE_WIDTH + ix,
        max_rows=FILTER_TABLE_WIDTH * FILTER_TABLE_WIDTH)[:, 0]
    fw = jnp.where((fx < FILTER_TABLE_WIDTH) & (fy < FILTER_TABLE_WIDTH),
                   fw, 0.0)
    Lw = L * ray_weight[:, None]
    b0 = jnp.asarray(base, jnp.int32)
    HW = film.height * film.width

    def sladd(canvas, upd):
        flat = canvas.reshape((HW,) + canvas.shape[2:])
        seg = jax.lax.dynamic_slice(
            flat, (b0,) + (0,) * (upd.ndim - 1), upd.shape) + upd
        return jax.lax.dynamic_update_slice(
            flat, seg, (b0,) + (0,) * (upd.ndim - 1)).reshape(canvas.shape)

    return film.replace(
        weighted=sladd(film.weighted, Lw * fw[:, None]),
        weight=sladd(film.weight, fw * ray_weight),
        raw=sladd(film.raw, Lw))


def add_splats(film: Film, pfilm, L):
    """AddSplat path (film.cpp:154) for light-tracing integrators."""
    px = jnp.clip(pfilm[:, 0].astype(jnp.int32), 0, film.width - 1)
    py = jnp.clip(pfilm[:, 1].astype(jnp.int32), 0, film.height - 1)
    inb = ((pfilm[:, 0] >= 0) & (pfilm[:, 0] < film.width)
           & (pfilm[:, 1] >= 0) & (pfilm[:, 1] < film.height))
    Lm = jnp.where(inb[:, None], L, 0.0)
    return film.replace(splat=film.splat.at[py, px].add(Lm))


def develop_spectral(film: Film, splat_scale=1.0):
    """Final per-pixel spectra [H,W,31] (reference: film.cpp WriteImage)."""
    w = jnp.maximum(film.weight, 1e-12)[..., None]
    return film.weighted / w + splat_scale * film.splat


def develop_rgb(film: Film, splat_scale=1.0):
    return spec.to_rgb(develop_spectral(film, splat_scale))
