"""Low-discrepancy sequences as pure counter-based functions.

The reference's Sobol'/Halton machinery (src/core/lowdiscrepancy.{h,cpp} +
27k lines of sobolmatrices data) becomes: a [1024, 30] uint32 direction-number
table (Joe-Kuo, generated into pbrt_tpu/data/sobol_matrices.npy — not copied
from the reference) plus vectorized radical-inverse evaluation.  Every sample
value is a pure function of (index, dimension[, seed]) so the samplers are
stateless and shard-invariant (reference contrast: GlobalSampler index
remapping, src/core/sampler.h:105-126).
"""

from __future__ import annotations

import os
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import rng as _rng

_U32 = jnp.uint32
_DATA = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data")

SOBOL_BITS = 30
_SOBOL_NP = np.load(os.path.join(_DATA, "sobol_matrices.npy"))  # [1024, 30]
N_SOBOL_DIMS = _SOBOL_NP.shape[0]


def _sobol_table():
    return jnp.asarray(_SOBOL_NP)


def sobol_u32(index, dim):
    """Sobol' sample bits: XOR of direction numbers selected by index bits.

    index: uint32 array [...]; dim: int or int array broadcastable to index.
    Returns uint32 in [0, 2^30).
    """
    v = _sobol_table()[jnp.asarray(dim)]  # [..., 30]
    index = jnp.asarray(index).astype(_U32)
    x = jnp.zeros(jnp.broadcast_shapes(index.shape, v.shape[:-1]), dtype=_U32)
    for j in range(SOBOL_BITS):
        bit = (index >> _U32(j)) & _U32(1)
        x = x ^ (v[..., j] * bit)
    return x


def sobol_sample(index, dim, scramble_seed=None):
    """Sobol' float in [0,1).  scramble_seed: None (plain), or uint32 array
    for Owen scrambling (Laine-Karras hash, decorrelates pixels)."""
    x = sobol_u32(index, dim) << _U32(32 - SOBOL_BITS)  # to 32-bit fixed point
    if scramble_seed is not None:
        x = _rng.owen_scramble(x, scramble_seed)
    f = x.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)  # /2^32
    return jnp.minimum(f, _rng.ONE_MINUS_EPS)


# ---------------------------------------------------------------------------
# radical inverse (Halton)
# ---------------------------------------------------------------------------

def _primes(n):
    sieve = np.ones(20000, dtype=bool)
    sieve[:2] = False
    for i in range(2, 142):
        if sieve[i]:
            sieve[i * i::i] = False
    p = np.nonzero(sieve)[0]
    return p[:n]

#: first 1024 primes (reference uses 1000, lowdiscrepancy.cpp PrimeTableSize)
PRIMES = _primes(1024)


def radical_inverse_base2(index):
    """Base-2 radical inverse = reversed bits as a fraction."""
    bits = _rng.reverse_bits32(index)
    return jnp.minimum(bits.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10),
                       _rng.ONE_MINUS_EPS)


def radical_inverse(index, base, n_digits=20, perm_seed=None):
    """Radical inverse of ``index`` in prime ``base`` with optional
    per-digit scrambling via a hash keyed on (seed, digit_pos, digit).

    base: static python int.  Digit permutations use the Cranley-Patterson-free
    hash approach rather than precomputed tables (reference:
    lowdiscrepancy.h ScrambledRadicalInverse).
    """
    index = jnp.asarray(index).astype(_U32)
    base_u = _U32(base)
    inv_base = jnp.float32(1.0 / base)
    out = jnp.zeros(index.shape, dtype=jnp.float32)
    factor = jnp.float32(1.0)
    for d in range(n_digits):
        digit = index % base_u
        if perm_seed is not None:
            # digit permutation: hash(seed, d) defines a permutation via
            # modular affine map with multiplier coprime to base
            h = _rng.hash_combine(perm_seed, _U32(d))
            digit = (digit + h % base_u) % base_u
        factor = factor * inv_base
        out = out + digit.astype(jnp.float32) * factor
        index = index // base_u
    return jnp.minimum(out, _rng.ONE_MINUS_EPS)


def halton_sample(index, dim, perm_seed=None):
    """Halton point coordinate for static python-int ``dim``."""
    base = int(PRIMES[dim])
    if base == 2 and perm_seed is None:
        return radical_inverse_base2(jnp.asarray(index).astype(_U32))
    seed = None if perm_seed is None else _rng.hash_combine(perm_seed, _U32(dim))
    return radical_inverse(index, base, perm_seed=seed)


# ---------------------------------------------------------------------------
# (0,2)-sequence (van der Corput + Sobol' dim-2) with xor scrambling
# (reference: lowdiscrepancy.h Sample02/VanDerCorput, zerotwosequence sampler)
# ---------------------------------------------------------------------------

def sample_02(index, scramble_x, scramble_y):
    """2D (0,2)-sequence point with xor-scrambles (uint32 each axis)."""
    x_bits = _rng.reverse_bits32(jnp.asarray(index).astype(_U32)) ^ _rng._u32(scramble_x)
    y = sobol_u32(index, 1) << _U32(2)
    y_bits = y ^ _rng._u32(scramble_y)
    inv = jnp.float32(2.3283064365386963e-10)
    return (jnp.minimum(x_bits.astype(jnp.float32) * inv, _rng.ONE_MINUS_EPS),
            jnp.minimum(y_bits.astype(jnp.float32) * inv, _rng.ONE_MINUS_EPS))
