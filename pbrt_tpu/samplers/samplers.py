"""Stateless counter-based samplers.

Reference layer: src/samplers/* + src/core/sampler.{h,cpp}.  The reference's
stateful Sampler objects (per-tile Clone(seed), pregenerated dim arrays,
GlobalSampler index remapping) become one pure function

    sample(cfg, pixel_id, sample_idx, dim) -> [B] floats in [0,1)

so every sample value is reproducible under any sharding or batch order —
the TPU-native equivalent of pbrt's deterministic per-tile seeding
(integrator.cpp:248-249).

Types:
  independent  — PCG-hash white noise (reference: samplers/random.cpp)
  stratified   — jittered strata over sample index (samplers/stratified.cpp)
  sobol        — Owen-scrambled padded Sobol': per-dim matrices, per-pixel
                 scramble (samplers/sobol.cpp + lowdiscrepancy.h; Owen
                 scrambling upgrades pbrt's plain Sobol')
  halton       — per-pixel scrambled Halton (samplers/halton.cpp)
  zerotwo      — xor-scrambled (0,2)-sequence pairs (samplers/zerotwosequence.cpp)
  maxmin       — maximized-minimal-distance pixel samples from the
                 reference's CMaxMinDist generator matrices
                 (samplers/maxmin.cpp, lowdiscrepancy.cpp:249), the
                 per-pixel Fisher-Yates shuffle replaced by a stateless
                 keyed index bijection; higher dims pad with the
                 scrambled (0,2)-sequence like the reference
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from pbrt_tpu.core import lds, rng

_U32 = jnp.uint32

SAMPLER_TYPES = ("independent", "random", "stratified", "sobol", "halton",
                 "zerotwosequence", "maxmindist")


class SamplerConfig(NamedTuple):
    kind: str = "sobol"
    seed: int = 0
    spp: int = 16          # samples per pixel (stratified needs it)


def sample_dim(cfg: SamplerConfig, pixel_id, sample_idx, dim: int):
    """pixel_id, sample_idx: uint32 [B]; dim: static python int."""
    pixel_id = jnp.asarray(pixel_id).astype(_U32)
    sample_idx = jnp.asarray(sample_idx).astype(_U32)
    seed = rng._u32(cfg.seed)
    kind = cfg.kind
    if kind in ("independent", "random"):
        return rng.uniform_float(pixel_id, sample_idx, _U32(dim), seed)
    if kind == "stratified":
        # jittered strata along each dim, decorrelated by random permutation
        n = _U32(max(cfg.spp, 1))
        perm = rng.hash_combine(pixel_id, _U32(dim), seed) % n
        stratum = (sample_idx + perm) % n
        jitter = rng.uniform_float(pixel_id, sample_idx, _U32(dim),
                                   seed ^ _U32(0x5bd1e995))
        return jnp.minimum((stratum.astype(jnp.float32) + jitter)
                           / jnp.float32(max(cfg.spp, 1)), rng.ONE_MINUS_EPS)
    if kind == "sobol":
        scramble = rng.hash_combine(pixel_id, _U32(dim), seed)
        return lds.sobol_sample(sample_idx, dim % lds.N_SOBOL_DIMS,
                                scramble_seed=scramble)
    if kind == "maxmindist":
        # reference maxmin.cpp StartPixel: the pixel-sample 2D pair is
        # (i/spp, CMaxMinDist[log2 spp] generator matrix at i), Shuffled
        # per pixel; remaining dims are VanDerCorput/Sobol2D with per-
        # pixel scrambles.  The Fisher-Yates shuffle becomes a stateless
        # per-pixel index bijection (rotation + xor within the pow2).
        spp = max(cfg.spp, 1)
        log2 = (spp - 1).bit_length()
        n = _U32(spp)
        h = rng.hash_combine(pixel_id, seed ^ _U32(0x9d7a3c1b))
        idx = (sample_idx + h) % n
        if spp == (1 << log2):
            idx = (idx ^ (h >> _U32(7))) & _U32(spp - 1)
        if dim == 0:
            return jnp.minimum(idx.astype(jnp.float32) / jnp.float32(spp),
                               rng.ONE_MINUS_EPS)
        if dim == 1:
            return lds.generator_matrix_sample(idx, lds.maxmin_matrix(log2))
        sx = rng.hash_combine(pixel_id, _U32(dim // 2), seed)
        sy = rng.hash_combine(pixel_id, _U32(dim // 2),
                              seed ^ _U32(0x94d049a9))
        x, y = lds.sample_02(sample_idx, sx, sy)
        return x if dim % 2 == 0 else y
    if kind == "halton":
        perm_seed = rng.hash_combine(pixel_id, seed)
        return lds.halton_sample(sample_idx, dim % 256, perm_seed=perm_seed)
    if kind == "zerotwosequence":
        sx = rng.hash_combine(pixel_id, _U32(dim // 2), seed)
        sy = rng.hash_combine(pixel_id, _U32(dim // 2), seed ^ _U32(0x94d049a9))
        x, y = lds.sample_02(sample_idx, sx, sy)
        return x if dim % 2 == 0 else y
    raise ValueError(f"unknown sampler {kind}")


def sample_2d(cfg, pixel_id, sample_idx, dim):
    return (sample_dim(cfg, pixel_id, sample_idx, dim),
            sample_dim(cfg, pixel_id, sample_idx, dim + 1))
