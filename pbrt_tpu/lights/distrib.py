"""Light-selection distributions (reference: src/core/lightdistrib.{h,cpp}).

Strategies:
  uniform — equal probability (UniformLightDistribution)
  power   — proportional to emitted power (PowerLightDistribution)
  spatial — per-voxel distributions over a dense grid
            (SpatialLightDistribution, lightdistrib.cpp:96-113; the
            reference builds up to 64 voxels per axis lazily into a
            lock-free hash — here the grid is dense and built eagerly at
            scene compile, sized G^3 with G<=16, weights estimated like
            the reference from power/distance^2 at voxel centers)

Device representation: CDF tensors sampled with searchsorted; attached to
SceneData at build time so any integrator can switch strategy statically.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.scene import ir

GRID = 8


def estimate_light_power(builder, scene_np):
    """Host-side per-light power estimates (Light::Power).

    Returns [L] numpy.  point/spot: 4pi I (cone-reduced for spot);
    area: pi L A; distant/infinite: pi L R^2-scale."""
    lights = builder.lights or [dict(type=ir.LIGHT_POINT,
                                     L=np.zeros(31), params=np.zeros(4))]
    wr = float(scene_np["world_radius"])
    out = np.zeros(len(lights))
    for i, l in enumerate(lights):
        lum = float(np.mean(l["L"]))
        t = l["type"]
        if t == ir.LIGHT_POINT:
            out[i] = 4 * np.pi * lum
        elif t == ir.LIGHT_SPOT:
            cos_t = float(l["params"][0])
            out[i] = 2 * np.pi * (1 - cos_t) * lum
        elif t == ir.LIGHT_AREA:
            out[i] = np.pi * lum * float(scene_np["light_area"][i])
        elif t == ir.LIGHT_DISTANT:
            out[i] = np.pi * wr * wr * lum
        elif t == ir.LIGHT_INFINITE:
            out[i] = 4 * np.pi * np.pi * wr * wr * lum
        else:
            out[i] = lum
    return np.maximum(out, 1e-12)


def build_distributions(builder, world_lo, world_hi, light_area,
                        world_radius):
    """Returns (power_cdf [L+1], power_pmf [L], spatial_cdf [G^3, L+1],
    spatial_pmf [G^3, L]) as numpy arrays."""
    scene_np = dict(world_radius=world_radius, light_area=light_area)
    power = estimate_light_power(builder, scene_np)
    L = len(power)
    pmf = power / power.sum()
    cdf = np.zeros(L + 1)
    cdf[1:] = np.cumsum(pmf)

    # spatial: weight = power / max(dist(voxel, light)^2, extent^2)
    lights = builder.lights or [dict(type=ir.LIGHT_POINT,
                                     pos=np.zeros(3), L=np.zeros(31))]
    lo = np.asarray(world_lo, np.float64)
    hi = np.asarray(world_hi, np.float64)
    ext = max(float(np.linalg.norm(hi - lo)), 1e-6)
    g = np.arange(GRID) + 0.5
    X, Y, Z = np.meshgrid(lo[0] + (hi[0] - lo[0]) * g / GRID,
                          lo[1] + (hi[1] - lo[1]) * g / GRID,
                          lo[2] + (hi[2] - lo[2]) * g / GRID,
                          indexing="ij")
    centers = np.stack([X, Y, Z], -1).reshape(-1, 3)    # [G^3, 3]
    w = np.zeros((centers.shape[0], L))
    for i, l in enumerate(lights):
        t = l["type"]
        if t in (ir.LIGHT_DISTANT, ir.LIGHT_INFINITE):
            w[:, i] = power[i] / (ext * ext)
        else:
            if t == ir.LIGHT_AREA:
                # use the emissive geometry's centroid as the proxy point
                pos = _area_light_centroid(builder, i)
            else:
                pos = np.asarray(l["pos"], np.float64)
            d2 = np.sum((centers - pos[None, :]) ** 2, -1)
            w[:, i] = power[i] / np.maximum(d2, (ext / GRID) ** 2)
    w = np.maximum(w, 1e-12 * w.max() if w.max() > 0 else 1e-12)
    spat_pmf = w / w.sum(-1, keepdims=True)
    spat_cdf = np.zeros((centers.shape[0], L + 1))
    spat_cdf[:, 1:] = np.cumsum(spat_pmf, -1)
    return (cdf.astype(np.float32), pmf.astype(np.float32),
            spat_cdf.astype(np.float32), spat_pmf.astype(np.float32))


def _area_light_centroid(builder, light_idx):
    tris = builder._mesh_light_tris.get(light_idx)
    soa = builder._concat()
    if tris:
        v = soa["tri_v"][np.asarray(tris)]
        return v.reshape(-1, 3).mean(0)
    # sphere light: its quadric origin
    cand = np.nonzero((soa["prim_light"] == light_idx)
                      & (soa["prim_type"] == ir.PRIM_SPHERE))[0]
    if len(cand):
        qi = int(soa["quad_refs"][cand[0]])
        return np.asarray(builder.quads[qi][0][:3, 3], np.float64)
    return np.zeros(3)


# ---------------------------------------------------------------------------
# device-side selection
# ---------------------------------------------------------------------------

def select_light(scene: ir.SceneData, strategy, p, u):
    """Pick a light per lane; returns (l [B], sel_pdf [B])."""
    nl = max(scene.n_lights, 1)
    if strategy == "uniform" or nl == 1:
        l = jnp.minimum((u * nl).astype(jnp.int32), nl - 1)
        return l, jnp.full_like(u, 1.0 / nl)
    if strategy == "power":
        cdf = scene.light_power_cdf
        l = jnp.clip(jnp.searchsorted(cdf, u, side="right") - 1, 0, nl - 1)
        return l, scene.light_power_pmf[l]
    # spatial
    vox = _voxel_of(scene, p)
    cdf = scene.light_spatial_cdf[vox]                     # [B, L+1]
    l = jnp.clip(jnp.sum((cdf <= u[:, None]).astype(jnp.int32), -1) - 1,
                 0, nl - 1)
    pmf = jnp.take_along_axis(scene.light_spatial_pmf[vox],
                              l[:, None], 1)[:, 0]
    return l, pmf


def selection_pdf(scene: ir.SceneData, strategy, p, l):
    """Probability the strategy at point p would pick light l (for MIS at
    path-hit vertices)."""
    nl = max(scene.n_lights, 1)
    if strategy == "all":
        # UniformSampleAllLights: every light is sampled each bounce
        # (selection probability 1; integrator.cpp:54)
        return jnp.ones(p.shape[:-1])
    if strategy == "uniform" or nl == 1:
        return jnp.full(p.shape[:-1], 1.0 / nl)
    lc = jnp.clip(l, 0, nl - 1)
    if strategy == "power":
        return scene.light_power_pmf[lc]
    vox = _voxel_of(scene, p)
    return jnp.take_along_axis(scene.light_spatial_pmf[vox],
                               lc[:, None], 1)[:, 0]


def _voxel_of(scene, p):
    rel = (p - scene.world_lo) / jnp.maximum(
        scene.world_hi - scene.world_lo, 1e-9)
    q = jnp.clip((rel * GRID).astype(jnp.int32), 0, GRID - 1)
    return (q[:, 0] * GRID + q[:, 1]) * GRID + q[:, 2]
