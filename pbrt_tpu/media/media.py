"""Participating media: homogeneous (closed-form) + density grid
(delta/ratio tracking).

Reference: src/core/medium.{h,cpp} (HenyeyGreenstein), src/media/
homogeneous.cpp (per-channel exponential distance sampling with spectral
MIS weight), src/media/grid.cpp (GridDensityMedium: trilinear density,
delta tracking for Sample :62-88, ratio tracking for Tr :89+, majorant
via invMaxDensity).

TPU design: the medium is a pytree (MediumData); delta/ratio tracking run
as fixed-iteration `fori`-style unrolled loops with live masks (the
reference's unbounded while loops have geometrically-decaying live
probability, so a fixed cap with survival accounting converges), keeping
everything static-shape and differentiable.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import rng as prng
from pbrt_tpu.core import spectrum as spec

MEDIUM_NONE = 0
MEDIUM_HOMOGENEOUS = 1
MEDIUM_GRID = 2

#: fixed cap on tracking iterations (expected steps ~ optical depth)
MAX_TRACK_STEPS = 64


@struct.dataclass
class MediumData:
    sigma_a: jnp.ndarray       # [31]
    sigma_s: jnp.ndarray       # [31]
    g: jnp.ndarray             # [] HG asymmetry
    # grid medium
    density: jnp.ndarray       # [nz,ny,nx] (1,1,1 for homogeneous)
    world_to_medium: jnp.ndarray  # [4,4] world -> unit-cube medium space
    inv_max_density: jnp.ndarray  # []
    kind: int = struct.field(pytree_node=False, default=MEDIUM_NONE)


def make_homogeneous(sigma_a, sigma_s, g=0.0):
    return MediumData(
        sigma_a=jnp.asarray(sigma_a, jnp.float32),
        sigma_s=jnp.asarray(sigma_s, jnp.float32),
        g=jnp.float32(g),
        density=jnp.ones((1, 1, 1), jnp.float32),
        world_to_medium=jnp.eye(4, dtype=jnp.float32),
        inv_max_density=jnp.float32(1.0),
        kind=MEDIUM_HOMOGENEOUS)


def make_grid(sigma_a, sigma_s, g, density, medium_to_world):
    d = np.asarray(density, np.float32)
    return MediumData(
        sigma_a=jnp.asarray(sigma_a, jnp.float32),
        sigma_s=jnp.asarray(sigma_s, jnp.float32),
        g=jnp.float32(g),
        density=jnp.asarray(d),
        world_to_medium=jnp.asarray(
            np.linalg.inv(np.asarray(medium_to_world, np.float64))
            .astype(np.float32)),
        inv_max_density=jnp.float32(1.0 / max(float(d.max()), 1e-9)),
        kind=MEDIUM_GRID)


def no_medium():
    return MediumData(sigma_a=jnp.zeros(31), sigma_s=jnp.zeros(31),
                      g=jnp.float32(0.0),
                      density=jnp.ones((1, 1, 1), jnp.float32),
                      world_to_medium=jnp.eye(4, dtype=jnp.float32),
                      inv_max_density=jnp.float32(1.0),
                      kind=MEDIUM_NONE)


# ---------------------------------------------------------------------------
# Henyey-Greenstein phase function (medium.h:50-86)
# ---------------------------------------------------------------------------

def hg_p(g, cos_theta):
    denom = 1 + g * g + 2 * g * cos_theta
    return (1 - g * g) / (4 * jnp.pi * denom *
                          jnp.sqrt(jnp.maximum(denom, 1e-9)))


def hg_sample(g, wo, u1, u2):
    """Sample direction ~ HG around -wo; returns (wi, pdf)."""
    g = jnp.broadcast_to(g, u1.shape)
    sq = (1 - g * g) / jnp.maximum(1 - g + 2 * g * u1, 1e-6)
    cos_t = jnp.where(jnp.abs(g) < 1e-3, 1 - 2 * u1,
                      (1 + g * g - sq * sq) / jnp.maximum(2 * g,
                                                          jnp.where(g >= 0, 1e-6, -1e-6)))
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1 - cos_t * cos_t))
    phi = 2 * jnp.pi * u2
    v1, v2 = geom.coordinate_system(-wo)
    wi = (sin_t * jnp.cos(phi))[:, None] * v1 + \
         (sin_t * jnp.sin(phi))[:, None] * v2 + cos_t[:, None] * (-wo)
    return geom.normalize(wi), hg_p(g, cos_t)


# ---------------------------------------------------------------------------
# density lookup (grid.cpp:46 trilinear)
# ---------------------------------------------------------------------------

def density_at(med: MediumData, p_world):
    """Trilinear density in medium space (unit cube)."""
    m = med.world_to_medium
    pm = p_world @ m[:3, :3].T + m[:3, 3]
    nz, ny, nx = med.density.shape
    g = jnp.stack([pm[..., 0] * nx - 0.5, pm[..., 1] * ny - 0.5,
                   pm[..., 2] * nz - 0.5], -1)
    gi = jnp.floor(g).astype(jnp.int32)
    f = g - gi

    def D(ix, iy, iz):
        inb = ((ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
               & (iz >= 0) & (iz < nz))
        v = med.density[jnp.clip(iz, 0, nz - 1), jnp.clip(iy, 0, ny - 1),
                        jnp.clip(ix, 0, nx - 1)]
        return jnp.where(inb, v, 0.0)

    ix, iy, iz = gi[..., 0], gi[..., 1], gi[..., 2]
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    d00 = D(ix, iy, iz) * (1 - fx) + D(ix + 1, iy, iz) * fx
    d10 = D(ix, iy + 1, iz) * (1 - fx) + D(ix + 1, iy + 1, iz) * fx
    d01 = D(ix, iy, iz + 1) * (1 - fx) + D(ix + 1, iy, iz + 1) * fx
    d11 = D(ix, iy + 1, iz + 1) * (1 - fx) + D(ix + 1, iy + 1, iz + 1) * fx
    d0 = d00 * (1 - fy) + d10 * fy
    d1 = d01 * (1 - fy) + d11 * fy
    inside = jnp.all((pm >= 0.0) & (pm <= 1.0), -1)
    return jnp.where(inside, d0 * (1 - fz) + d1 * fz, 0.0)


def _grid_span(med, o, d, tmax):
    """Ray parameter interval inside the grid's unit cube."""
    m = med.world_to_medium
    om = o @ m[:3, :3].T + m[:3, 3]
    dm = d @ m[:3, :3].T
    inv = 1.0 / jnp.where(jnp.abs(dm) > 1e-12, dm, 1e-12)
    t0 = (0.0 - om) * inv
    t1 = (1.0 - om) * inv
    tlo = jnp.max(jnp.minimum(t0, t1), -1)
    thi = jnp.min(jnp.maximum(t0, t1), -1)
    tlo = jnp.maximum(tlo, 0.0)
    thi = jnp.minimum(thi, tmax)
    return tlo, thi, thi > tlo


# ---------------------------------------------------------------------------
# distance sampling + transmittance
# ---------------------------------------------------------------------------

def sample_distance(med: MediumData, o, d, tmax, pixel_id, sample_idx,
                    dim_salt):
    """Sample a medium interaction along [0, tmax).

    Returns (t_m [B], interacted [B], weight [B,31]): `weight` multiplies
    beta — sigma_s/pdf at a medium event, Tr-ratio at surface events.
    Homogeneous: per-channel exponential with spectral MIS
    (homogeneous.cpp:44+).  Grid: delta tracking with scalar sigma_t
    (grid.cpp:62-88; requires spectrally uniform sigma_t like the
    reference).
    """
    B = o.shape[0]
    NS = spec.N_SPECTRAL_SAMPLES
    sigma_t = med.sigma_a + med.sigma_s
    if med.kind == MEDIUM_HOMOGENEOUS:
        u_ch = prng.uniform_float(pixel_id, sample_idx, prng._u32(dim_salt))
        u_t = prng.uniform_float(pixel_id, sample_idx,
                                 prng._u32(dim_salt + 1))
        ch = jnp.minimum((u_ch * NS).astype(jnp.int32), NS - 1)
        st_ch = jnp.maximum(sigma_t[ch], 1e-9)
        t_m = -jnp.log(jnp.maximum(1.0 - u_t, 1e-9)) / st_ch
        interacted = t_m < tmax
        t = jnp.minimum(t_m, tmax)
        tr = jnp.exp(-sigma_t[None, :] * t[:, None])
        # pdf averaged over channels (spectral MIS, homogeneous.cpp:78+)
        pdf_m = jnp.mean(sigma_t[None, :] * tr, -1)
        pdf_s = jnp.mean(tr, -1)
        w_med = tr * med.sigma_s[None, :] / jnp.maximum(pdf_m, 1e-12)[:, None]
        w_surf = tr / jnp.maximum(pdf_s, 1e-12)[:, None]
        weight = jnp.where(interacted[:, None], w_med, w_surf)
        return t, interacted, weight
    if med.kind == MEDIUM_GRID:
        st_scalar = jnp.maximum(jnp.max(sigma_t), 1e-9)
        tlo, thi, in_grid = _grid_span(med, o, d, tmax)
        t = tlo
        live = in_grid
        interacted = jnp.zeros(B, bool)
        for k in range(MAX_TRACK_STEPS):
            u1 = prng.uniform_float(pixel_id, sample_idx,
                                    prng._u32(dim_salt + 2 * k))
            u2 = prng.uniform_float(pixel_id, sample_idx,
                                    prng._u32(dim_salt + 2 * k + 1))
            t_new = t - jnp.log(jnp.maximum(1 - u1, 1e-9)) * \
                med.inv_max_density / st_scalar
            esc = t_new >= thi
            p = o + t_new[:, None] * d
            dens = density_at(med, p)
            real = u2 < dens * med.inv_max_density
            interacted = interacted | (live & ~esc & real)
            t = jnp.where(live & ~esc, t_new, t)
            live = live & ~esc & ~real
        t_out = jnp.where(interacted, t, tmax)
        # delta tracking weight: sigma_s/sigma_t at an event; 1 otherwise
        w_med = (med.sigma_s / st_scalar)[None, :]
        weight = jnp.where(interacted[:, None], w_med,
                           jnp.ones((B, NS)))
        return t_out, interacted, weight
    return tmax, jnp.zeros(B, bool), jnp.ones((B, NS))


def sample_distance_lanes(sigma_a, sigma_s, tmax, pixel_id, sample_idx,
                          dim_salt):
    """Per-lane homogeneous free-flight sampling (sigma_* [B,31], one
    medium per lane — the per-primitive MediumInterface path).  Vacuum
    lanes (all-zero sigma) never interact and carry weight 1.  Same
    spectral-MIS estimator as sample_distance's homogeneous branch
    (homogeneous.cpp:44+)."""
    NS = spec.N_SPECTRAL_SAMPLES
    sigma_t = sigma_a + sigma_s
    u_ch = prng.uniform_float(pixel_id, sample_idx, prng._u32(dim_salt))
    u_t = prng.uniform_float(pixel_id, sample_idx,
                             prng._u32(dim_salt + 1))
    ch = jnp.minimum((u_ch * NS).astype(jnp.int32), NS - 1)
    st_ch = jnp.maximum(
        jnp.take_along_axis(sigma_t, ch[:, None], 1)[:, 0], 1e-9)
    t_m = -jnp.log(jnp.maximum(1.0 - u_t, 1e-9)) / st_ch
    vacuum = jnp.max(sigma_t, -1) <= 1e-12
    interacted = (t_m < tmax) & ~vacuum
    t = jnp.where(vacuum, tmax, jnp.minimum(t_m, tmax))
    tr = jnp.exp(-sigma_t * t[:, None])
    pdf_m = jnp.mean(sigma_t * tr, -1)
    pdf_s = jnp.mean(tr, -1)
    w_med = tr * sigma_s / jnp.maximum(pdf_m, 1e-12)[:, None]
    w_surf = tr / jnp.maximum(pdf_s, 1e-12)[:, None]
    weight = jnp.where(interacted[:, None], w_med, w_surf)
    weight = jnp.where(vacuum[:, None], 1.0, weight)
    return t, interacted, weight


def transmittance_lanes(sigma_t, tmax):
    """Per-lane homogeneous Tr = exp(-sigma_t * d) (sigma_t [B,31])."""
    seg = jnp.maximum(jnp.where(jnp.isfinite(tmax), tmax, 0.0), 0.0)
    return jnp.exp(-sigma_t * seg[:, None])


def transmittance(med: MediumData, o, d, tmax, pixel_id, sample_idx,
                  dim_salt):
    """Tr along a (shadow) segment.  Homogeneous: exp(-sigma_t d);
    grid: ratio tracking (grid.cpp:89+)."""
    B = o.shape[0]
    NS = spec.N_SPECTRAL_SAMPLES
    sigma_t = med.sigma_a + med.sigma_s
    if med.kind == MEDIUM_NONE:
        return jnp.ones((B, NS))
    if med.kind == MEDIUM_HOMOGENEOUS:
        seg = jnp.maximum(jnp.where(jnp.isfinite(tmax), tmax, 0.0), 0.0)
        return jnp.exp(-sigma_t[None, :] * seg[:, None])
    st_scalar = jnp.maximum(jnp.max(sigma_t), 1e-9)
    tlo, thi, in_grid = _grid_span(med, o, d, tmax)
    tr = jnp.ones(B)
    t = tlo
    live = in_grid
    for k in range(MAX_TRACK_STEPS):
        u1 = prng.uniform_float(pixel_id, sample_idx,
                                prng._u32(dim_salt + 1000 + 2 * k))
        t_new = t - jnp.log(jnp.maximum(1 - u1, 1e-9)) * \
            med.inv_max_density / st_scalar
        esc = t_new >= thi
        dens = density_at(med, o + t_new[:, None] * d)
        ratio = 1.0 - dens * med.inv_max_density
        tr = jnp.where(live & ~esc, tr * jnp.maximum(ratio, 0.0), tr)
        t = jnp.where(live & ~esc, t_new, t)
        live = live & ~esc & (tr > 1e-5)
    return jnp.broadcast_to(tr[:, None], (B, NS))


# ---------------------------------------------------------------------------
# per-lane grid media (the per-primitive MediumInterface path)
# ---------------------------------------------------------------------------
# The functions below key every lane into the SCENE's padded medium
# table (SceneData.med_density [K,DZ,DY,DX] + med_w2m + med_dims +
# med_inv_maxd) so a smoke grid can be BOUND to a shape's interface like
# the reference binds GridDensityMedium through MediumInterface
# (api.cpp pbrtMediumInterface + scene.cpp:57-81 IntersectTr composing
# per-segment GridDensityMedium::Tr).  Tracking loops are statically
# unrolled; scenes without grid media never trace this code
# (SceneData.has_grid_media gates the call sites).

#: tracking steps for the per-lane walks (majorant flights per
#: sub-segment; expected use ~ optical depth of ONE interface span)
LANE_TRACK_STEPS = 32


def _to_medium_lanes(w2m_b, o, d):
    """Transform rays into each lane's medium unit-cube space.
    w2m_b [B,4,4] per-lane world->medium matrices."""
    om = jnp.einsum('bij,bj->bi', w2m_b[:, :3, :3], o) + w2m_b[:, :3, 3]
    dm = jnp.einsum('bij,bj->bi', w2m_b[:, :3, :3], d)
    return om, dm


def _grid_span_m(om, dm, tmax):
    """Ray interval inside the unit cube, medium-space inputs."""
    inv = 1.0 / jnp.where(jnp.abs(dm) > 1e-12, dm, 1e-12)
    t0 = (0.0 - om) * inv
    t1 = (1.0 - om) * inv
    tlo = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), 0.0)
    thi = jnp.minimum(jnp.min(jnp.maximum(t0, t1), -1), tmax)
    return tlo, thi, thi > tlo


def density_at_lanes(density, dims, mk, p_med):
    """Trilinear density per lane (grid.cpp:46 GridDensityMedium::D).

    density [K, DZ, DY, DX] padded row-major grids; dims [K,3]
    (nz,ny,nx) actual extents; mk [B] per-lane medium index; p_med
    [B,3] medium-space points.  Out-of-extent taps contribute 0 (the
    reference's D() bounds check)."""
    K, DZ, DY, DX = density.shape
    flat = density.reshape(K, DZ * DY * DX)
    dims_b = dims[mk]                                    # [B,3]
    gx = p_med[:, 0] * dims_b[:, 2].astype(jnp.float32) - 0.5
    gy = p_med[:, 1] * dims_b[:, 1].astype(jnp.float32) - 0.5
    gz = p_med[:, 2] * dims_b[:, 0].astype(jnp.float32) - 0.5
    ix = jnp.floor(gx); iy = jnp.floor(gy); iz = jnp.floor(gz)
    fx = gx - ix; fy = gy - iy; fz = gz - iz
    ix = ix.astype(jnp.int32); iy = iy.astype(jnp.int32)
    iz = iz.astype(jnp.int32)
    acc = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                jx, jy, jz = ix + dx, iy + dy, iz + dz
                inb = ((jx >= 0) & (jy >= 0) & (jz >= 0)
                       & (jx < dims_b[:, 2]) & (jy < dims_b[:, 1])
                       & (jz < dims_b[:, 0]))
                w = (jnp.where(dx, fx, 1 - fx)
                     * jnp.where(dy, fy, 1 - fy)
                     * jnp.where(dz, fz, 1 - fz))
                idx = (jnp.clip(jz, 0, DZ - 1) * DY
                       + jnp.clip(jy, 0, DY - 1)) * DX \
                    + jnp.clip(jx, 0, DX - 1)
                acc = acc + jnp.where(inb, w * flat[mk, idx], 0.0)
    return acc


def sample_distance_grid_lanes(density, dims, w2m_b, inv_maxd_b,
                               st_scalar_b, o, d, tmax, mk,
                               pixel_id, sample_idx, dim_salt):
    """Per-lane delta tracking (grid.cpp:62-88) against each lane's own
    grid.  st_scalar_b [B]: the lane medium's scalar majorant sigma_t
    (max over bands — the reference requires spectrally uniform sigma_t
    for grids, grid.h:67-77).  Returns (t [B], interacted [B])."""
    import jax as _jax
    om, dm = _to_medium_lanes(w2m_b, o, d)
    tlo, thi, in_grid = _grid_span_m(om, dm, tmax)
    st = jnp.maximum(st_scalar_b, 1e-9)
    imd = jnp.maximum(inv_maxd_b, 1e-12)

    def body(k, state):
        t, live, interacted = state
        u1 = prng.uniform_float(pixel_id, sample_idx,
                                prng._u32(dim_salt) + 2 * k.astype(jnp.uint32))
        u2 = prng.uniform_float(pixel_id, sample_idx,
                                prng._u32(dim_salt) + 2 * k.astype(jnp.uint32) + 1)
        t_new = t - jnp.log(jnp.maximum(1 - u1, 1e-9)) * imd / st
        esc = t_new >= thi
        dens = density_at_lanes(density, dims, mk,
                                om + t_new[:, None] * dm)
        real = u2 < dens * imd
        interacted = interacted | (live & ~esc & real)
        t = jnp.where(live & ~esc, t_new, t)
        live = live & ~esc & ~real
        return (t, live, interacted)

    t, _, interacted = _jax.lax.fori_loop(
        0, LANE_TRACK_STEPS, body,
        (tlo, in_grid, jnp.zeros(o.shape[0], bool)))
    return jnp.where(interacted, t, tmax), interacted


def ratio_tr_lanes(density, dims, w2m_b, inv_maxd_b, st_scalar_b,
                   o, d, tmax, mk, pixel_id, sample_idx, dim_salt):
    """Per-lane ratio tracking Tr (grid.cpp:89+) against each lane's own
    grid.  Returns scalar Tr [B] (spectrally uniform by construction)."""
    import jax as _jax
    om, dm = _to_medium_lanes(w2m_b, o, d)
    tlo, thi, in_grid = _grid_span_m(om, dm, tmax)
    st = jnp.maximum(st_scalar_b, 1e-9)
    imd = jnp.maximum(inv_maxd_b, 1e-12)

    def body(k, state):
        tr, t, live = state
        u1 = prng.uniform_float(pixel_id, sample_idx,
                                prng._u32(dim_salt) + 2 * k.astype(jnp.uint32))
        t_new = t - jnp.log(jnp.maximum(1 - u1, 1e-9)) * imd / st
        esc = t_new >= thi
        dens = density_at_lanes(density, dims, mk,
                                om + t_new[:, None] * dm)
        ratio = 1.0 - dens * imd
        tr = jnp.where(live & ~esc, tr * jnp.maximum(ratio, 0.0), tr)
        t = jnp.where(live & ~esc, t_new, t)
        live = live & ~esc & (tr > 1e-5)
        return (tr, t, live)

    tr, _, _ = _jax.lax.fori_loop(
        0, LANE_TRACK_STEPS, body,
        (jnp.ones(o.shape[0]), tlo, in_grid))
    return tr
