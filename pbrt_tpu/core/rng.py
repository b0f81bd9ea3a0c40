"""Counter-based RNG primitives.

The reference uses a stateful PCG32 stream per tile (src/core/rng.h:61-78,
cloned per tile in integrator.cpp:248).  On TPU, statefulness is replaced by
pure counter-based hashing: every random number is a function of
(pixel, sample_index, dimension, bounce), so results are identical under any
sharding — the TPU-native version of pbrt's deterministic tile seeding.

All ops are uint32 (TPU has no fast 64-bit integer path).
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32
ONE_MINUS_EPS = jnp.float32(0.99999994)  # reference: pbrt.h OneMinusEpsilon


def _u32(x):
    if isinstance(x, int):
        return _U32(x & 0xFFFFFFFF)
    return jnp.asarray(x).astype(_U32)


def pcg_hash(x):
    """PCG output permutation on a 32-bit state (O'Neill, pcg-random.org)."""
    x = _u32(x)
    state = x * _U32(747796405) + _U32(2891336453)
    word = ((state >> ((state >> _U32(28)) + _U32(4))) ^ state) * _U32(277803737)
    return (word >> _U32(22)) ^ word


def hash_combine(*xs):
    """Mix several uint32 counters into one well-distributed uint32."""
    h = _u32(0x9E3779B9)
    for x in xs:
        h = pcg_hash(h ^ _u32(x))
    return h


def uniform_u32(*counters):
    return hash_combine(*counters)


def uniform_float(*counters):
    """U[0,1) from counters; 24 mantissa bits (reference rng.h UniformFloat)."""
    bits = hash_combine(*counters)
    return jnp.minimum((bits >> _U32(8)).astype(jnp.float32) * (1.0 / 16777216.0),
                       ONE_MINUS_EPS)


def uniform_float2(*counters):
    """Two decorrelated U[0,1) from one counter set."""
    h = hash_combine(*counters)
    u1 = jnp.minimum((h >> _U32(8)).astype(jnp.float32) / 16777216.0,
                     ONE_MINUS_EPS)
    h2 = pcg_hash(h ^ _U32(0x68bc21eb))
    u2 = jnp.minimum((h2 >> _U32(8)).astype(jnp.float32) / 16777216.0,
                     ONE_MINUS_EPS)
    return u1, u2


def laine_karras_permutation(x, seed):
    """Owen-scramble hash over reversed bits (Laine & Karras 2011 /
    Burley 2020) — used for Owen-scrambled Sobol'."""
    x = _u32(x)
    seed = _u32(seed)
    x = x + seed
    x = x ^ (x * _U32(0x6c50b47c))
    x = x ^ (x * _U32(0xb82f1e52))
    x = x ^ (x * _U32(0xc7afe638))
    x = x ^ (x * _U32(0x8d22f6e6))
    return x


def reverse_bits32(x):
    x = _u32(x)
    x = ((x >> _U32(1)) & _U32(0x55555555)) | ((x & _U32(0x55555555)) << _U32(1))
    x = ((x >> _U32(2)) & _U32(0x33333333)) | ((x & _U32(0x33333333)) << _U32(2))
    x = ((x >> _U32(4)) & _U32(0x0F0F0F0F)) | ((x & _U32(0x0F0F0F0F)) << _U32(4))
    x = ((x >> _U32(8)) & _U32(0x00FF00FF)) | ((x & _U32(0x00FF00FF)) << _U32(8))
    return (x >> _U32(16)) | (x << _U32(16))


def owen_scramble(x_bits, seed):
    """Owen-scramble a 32-bit radical-inverse value (bits already reversed)."""
    x = reverse_bits32(x_bits)
    x = laine_karras_permutation(x, seed)
    return reverse_bits32(x)
