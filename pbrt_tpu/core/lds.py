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

_MAXMIN_NP = np.load(os.path.join(_DATA, "maxmindist.npz"))["C"]  # [17,32]


def maxmin_matrix(log2_spp):
    """CMaxMinDist generator matrix for 2^log2_spp samples (data constants
    from the reference, lowdiscrepancy.cpp:249 / Gruenschloss & Keller's
    maximized-minimal-distance (0,2) constructions)."""
    return _MAXMIN_NP[min(max(log2_spp, 0), 16)]


def generator_matrix_sample(index, matrix_rows, scramble=None):
    """SampleGeneratorMatrix (lowdiscrepancy.h:MultiplyGenerator): XOR of
    matrix rows selected by the index bits; matrix_rows is a static
    numpy [32] uint32 row list."""
    idx = jnp.asarray(index).astype(_U32)
    v = jnp.zeros_like(idx)
    for b in range(32):
        row = int(matrix_rows[b])
        if row == 0:
            continue
        v = jnp.where((idx >> _U32(b)) & _U32(1) > 0, v ^ _U32(row), v)
    if scramble is not None:
        v = v ^ _rng._u32(scramble)
    inv = jnp.float32(2.3283064365386963e-10)
    return jnp.minimum(v.astype(jnp.float32) * inv, _rng.ONE_MINUS_EPS)


def sample_02(index, scramble_x, scramble_y):
    """2D (0,2)-sequence point with xor-scrambles (uint32 each axis)."""
    x_bits = _rng.reverse_bits32(jnp.asarray(index).astype(_U32)) ^ _rng._u32(scramble_x)
    y = sobol_u32(index, 1) << _U32(2)
    y_bits = y ^ _rng._u32(scramble_y)
    inv = jnp.float32(2.3283064365386963e-10)
    return (jnp.minimum(x_bits.astype(jnp.float32) * inv, _rng.ONE_MINUS_EPS),
            jnp.minimum(y_bits.astype(jnp.float32) * inv, _rng.ONE_MINUS_EPS))


# ---------------------------------------------------------------------------
# Reference-exact GlobalSampler Sobol' index remapping
# (reference: lowdiscrepancy.h:229 SobolIntervalToIndex +
#  samplers/sobol.cpp:42-58 GetIndexForSample/SampleDimension)
# ---------------------------------------------------------------------------
#
# pbrt's SobolSampler enumerates, for each pixel p of a 2^m x 2^m raster,
# the indices i of the global Sobol' sequence whose first two dimensions
# land in p; the sampleNum-th such index is i = (sampleNum << 2m) | q with
# q < 2^(2m) the unique solution of a GF(2) linear system (the first two
# Sobol' dimensions form a (0,2)-net, so the map q -> top-m-bits of
# (x(i), y(i)) is invertible).  pbrt bakes the solve into VdCSobolMatrices
# tables; here the same mapping is derived at setup time by inverting the
# system with numpy bit-ops — no reference tables involved.

_GLOBAL_TABLES = {}


def _bit(x, k):
    return (x >> k) & 1


def sobol_global_tables(m, n_frame_bits=None):
    """Per-resolution tables for the pbrt GlobalSampler index map.

    Returns dict with uint32 arrays gx [m], gy [m], gf [n_frame_bits]:
      q = XOR_k(px bit k ? gx[k]) ^ XOR_k(py bit k ? gy[k])
          ^ XOR_l(frame bit l ? gf[l])
      index = (frame << 2m) | q
    Requires 2m + n_frame_bits <= 30 (our Sobol' table is 30 columns).
    """
    if n_frame_bits is None:
        n_frame_bits = SOBOL_BITS - 2 * m   # max spp = 2^this
    key = (m, n_frame_bits)
    if key in _GLOBAL_TABLES:
        return _GLOBAL_TABLES[key]
    if m == 0:
        t = dict(gx=np.zeros(1, np.uint32), gy=np.zeros(1, np.uint32),
                 gf=np.zeros(n_frame_bits, np.uint32), m=0)
        _GLOBAL_TABLES[key] = t
        return t
    nbits = 2 * m + n_frame_bits
    if nbits > SOBOL_BITS:
        raise ValueError(
            f"sobol_global_tables: 2*{m}+{n_frame_bits} > {SOBOL_BITS} "
            "index bits (raise SOBOL_BITS or lower spp/resolution)")
    # 32-bit columns of dims 0/1 (table rows are v_k << (SOBOL_BITS-1-k))
    cx = (_SOBOL_NP[0].astype(np.uint64) << 2)
    cy = (_SOBOL_NP[1].astype(np.uint64) << 2)

    def top_bits(col):
        # bit k (k=0 LSB) of the m-bit pixel coordinate = bit 32-m+k of col
        return [(int(col) >> (32 - m + k)) & 1 for k in range(m)]

    # M: rows = 2m equations (m for x, m for y), cols = 2m unknown q bits
    M = np.zeros((2 * m, 2 * m), np.uint8)
    for j in range(2 * m):
        tx = top_bits(cx[j])
        ty = top_bits(cy[j])
        for k in range(m):
            M[k, j] = tx[k]
            M[m + k, j] = ty[k]
    # invert M over GF(2)
    A = np.concatenate([M, np.eye(2 * m, dtype=np.uint8)], 1)
    for col in range(2 * m):
        piv = next(r for r in range(col, 2 * m) if A[r, col])
        A[[col, piv]] = A[[piv, col]]
        for r in range(2 * m):
            if r != col and A[r, col]:
                A[r] ^= A[col]
    Minv = A[:, 2 * m:]                      # [2m, 2m]

    def apply_minv(rhs_bits):
        q = 0
        for r in range(2 * m):
            if rhs_bits[r]:
                # q bit j gets Minv[.., r]? solve q = Minv @ rhs
                pass
        return q

    # q_j = XOR_r Minv[j, r] * rhs_r  ->  packed column tables
    col_for_rhs = np.zeros(2 * m, np.uint32)     # q pattern per rhs bit
    for r in range(2 * m):
        q = 0
        for j in range(2 * m):
            if Minv[j, r]:
                q |= 1 << j
        col_for_rhs[r] = q
    # rhs for px bit k is e_k (rows 0..m-1); for py bit k is e_{m+k}
    gx = col_for_rhs[:m].astype(np.uint32)
    gy = col_for_rhs[m:2 * m].astype(np.uint32)
    # frame bit l (index bit 2m+l) contributes top-bit pattern of its
    # columns to the rhs: rhs_r = bit r of F contribution
    gf = np.zeros(n_frame_bits, np.uint32)
    for l in range(n_frame_bits):
        j = 2 * m + l
        tx = top_bits(cx[j])
        ty = top_bits(cy[j])
        q = 0
        for r in range(m):
            if tx[r]:
                q ^= int(col_for_rhs[r])
        for r in range(m):
            if ty[r]:
                q ^= int(col_for_rhs[m + r])
        gf[l] = q
    t = dict(gx=gx, gy=gy, gf=gf, m=m)
    _GLOBAL_TABLES[key] = t
    return t


def sobol_global_index(frame, px, py, m):
    """uint32 Sobol' index of pixel-sample `frame` at pixel (px,py) on a
    2^m raster — vectorized SobolIntervalToIndex twin (derived tables)."""
    if m == 0:
        return jnp.asarray(frame).astype(_U32)
    tabs = sobol_global_tables(m)
    gx = jnp.asarray(tabs["gx"])
    gy = jnp.asarray(tabs["gy"])
    gf = jnp.asarray(tabs["gf"])
    frame = jnp.asarray(frame).astype(_U32)
    px = jnp.asarray(px).astype(_U32)
    py = jnp.asarray(py).astype(_U32)
    q = jnp.zeros(jnp.broadcast_shapes(frame.shape, px.shape), _U32)
    for k in range(m):
        q = q ^ jnp.where((px >> _U32(k)) & _U32(1), gx[k], _U32(0))
        q = q ^ jnp.where((py >> _U32(k)) & _U32(1), gy[k], _U32(0))
    for l in range(int(gf.shape[0])):
        q = q ^ jnp.where((frame >> _U32(l)) & _U32(1), gf[l], _U32(0))
    return (frame << _U32(2 * m)) | q


def sobol_sample_pbrt(index, dim):
    """Plain (unscrambled) Sobol' float exactly as the reference's
    SobolSample(index, dim) (lowdiscrepancy.h:259, scramble=0)."""
    x = sobol_u32(index, dim) << _U32(32 - SOBOL_BITS)
    f = x.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)
    return jnp.minimum(f, _rng.ONE_MINUS_EPS)
