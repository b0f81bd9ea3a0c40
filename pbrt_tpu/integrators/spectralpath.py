"""Spectral path integrator with chromatic-aberration bands (fork feature:
src/integrators/spectralpath.cpp).

The reference traces `numCABands` camera rays per sample, each tagged with a
band-center wavelength so lens cameras refract them differently, then
stitches each returned spectrum's band-slice into the pixel spectrum
(spectralpath.cpp:233-318).  Here each band is a masked wavefront trace:
rays carry their band wavelength (lens cameras use it for dispersion), and
`wavelength_mask` confines transport to the band's bins — the band loop is
unrolled so XLA sees `numCABands` independent ray batches.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.integrators import path as pathmod


def band_slices(num_bands):
    """Split the 31 bins into contiguous band slices (reference
    spectralpath.cpp:252-318 divides nSpectralSamples among bands)."""
    edges = np.linspace(0, spec.N_SPECTRAL_SAMPLES, num_bands + 1)
    out = []
    for i in range(num_bands):
        lo, hi = int(edges[i]), int(edges[i + 1])
        centers = spec.BIN_CENTERS[lo:hi]
        out.append((lo, hi, float(np.mean(centers))))
    return out


def make_trace_spectral(num_ca_bands=4, camera=None, generate_rays=None,
                        width=None, height=None):
    """Returns a trace_fn compatible with path.render.

    When the camera's ray generation is wavelength-dependent (lens
    cameras with chromatic aberration / spectral IoR), pass camera +
    generate_rays + film size: each band *regenerates* its camera rays at
    the band-center wavelength (the reference's per-CA-band GenerateRay,
    spectralpath.cpp:252-318).  Projective cameras reuse the given rays.
    """
    bands = band_slices(num_ca_bands)

    def trace(scene, ray, pixel_id, sample_idx, cfg, max_depth=5, **kw):
        B = ray.o.shape[0]
        NS = spec.N_SPECTRAL_SAMPLES
        L = jnp.zeros((B, NS))
        for lo, hi, lam in bands:
            mask = jnp.zeros((NS,)).at[lo:hi].set(1.0)
            if camera is not None and generate_rays is not None:
                # rebuild this band's rays at its wavelength (dispersion):
                # the counter-based sampler reproduces the pixel/lens dims
                from pbrt_tpu.samplers.samplers import sample_dim
                ix = (pixel_id % width).astype(jnp.float32)
                iy = (pixel_id // width).astype(jnp.float32)
                jx = sample_dim(cfg, pixel_id, sample_idx,
                                pathmod.DIM_PIXEL_X)
                jy = sample_dim(cfg, pixel_id, sample_idx,
                                pathmod.DIM_PIXEL_Y)
                pfilm = jnp.stack([ix + jx, iy + jy], -1)
                ulens = jnp.stack(
                    [sample_dim(cfg, pixel_id, sample_idx,
                                pathmod.DIM_LENS_U),
                     sample_dim(cfg, pixel_id, sample_idx,
                                pathmod.DIM_LENS_V)], -1)
                band_ray, w = generate_rays(
                    camera, pfilm, ulens, width=width, height=height,
                    wavelength=lam)
                band_ray = band_ray.replace(
                    tmax=jnp.where(ray.tmax > 0, band_ray.tmax, -1.0))
            else:
                band_ray = ray.replace(wavelength=jnp.full(B, lam))
            Lb = pathmod.trace_paths(
                scene, band_ray, pixel_id, sample_idx, cfg,
                max_depth=max_depth,
                wavelength_mask=jnp.broadcast_to(mask, (B, NS)), **kw)
            # stitch only this band's slice (spectralpath.cpp:310-316)
            L = L + Lb * mask[None, :]
        return L

    return trace
