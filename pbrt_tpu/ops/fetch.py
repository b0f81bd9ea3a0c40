"""Gather-free row fetch for small per-entity tables.

XLA lowers a TPU gather to a slow serial per-row loop (~0.6 ms per
gathered table at B=65k); for tables with few rows the same fetch runs
at MXU speed as a one-hot [B,2N] @ [2N,C] matmul over a
[bf16-hi; residual-lo] split of the table.  A DEFAULT (single-pass
bf16) matmul then reconstructs every f32 value to ~2^-17 relative
(bit-exact on CPU, where f32 matmuls are true f32) — the same trick as
the packed material fetch (materials/bsdf.py gather_materials).

The hi/lo split happens in-jit from the live arrays, so differentiable
scene overrides (integrators/diff.py apply_params) keep their gradient
path: d(hi)/dv is identity through the downcast, d(lo)/dv = 0.

Used by the light-table fetch (lights/lights.py) — the reference
instead virtual-dispatches per light object (core/light.h), which has
no wavefront analog.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# above this row count the one-hot operand outweighs the gather cost
ONE_HOT_MAX_ROWS = 64


def fetch_many(arrs, idx, max_rows=ONE_HOT_MAX_ROWS):
    """Fetch row `idx` [B] from each table in `arrs` (list of [N] or
    [N,...] arrays sharing leading dim N) with ONE fused fetch.

    Returns a list of f32 arrays shaped [B] / [B,...]; integer / bool
    columns come back as exact small floats (callers round / threshold).
    N == 1 broadcasts, small N uses the one-hot matmul, large N falls
    back to a single gather of the fused row.  max_rows raises the
    one-hot cutoff (worth it for very narrow tables, where the matmul
    is thin).
    """
    B = idx.shape[0]
    N = arrs[0].shape[0]
    cols = []
    for a in arrs:
        a2 = a.astype(jnp.float32).reshape(N, -1)
        cols.append(a2)
    table = cols[0] if len(cols) == 1 else jnp.concatenate(cols, 1)

    if N == 1:
        out = jnp.broadcast_to(table[0][None, :], (B, table.shape[1]))
    elif N <= max_rows:
        hi = table.astype(jnp.bfloat16).astype(jnp.float32)
        packed = jnp.concatenate([hi, table - hi], 0)      # [2N, C]
        m = jnp.clip(idx, 0, N - 1).astype(jnp.int32)
        idx2 = jnp.arange(2 * N, dtype=jnp.int32) % N
        oh = (m[:, None] == idx2[None, :]).astype(jnp.float32)
        out = jax.lax.dot_general(oh, packed, (((1,), (0,)), ((), ())),
                                  precision=jax.lax.Precision.DEFAULT)
    else:
        out = table[jnp.clip(idx, 0, N - 1)]

    res, off = [], 0
    for a in arrs:
        k = int(np.prod(a.shape[1:])) if a.ndim > 1 else 1
        sl = out[:, off:off + k]
        res.append(sl.reshape((B,) + a.shape[1:]) if a.ndim > 1
                   else sl[:, 0])
        off += k
    return res


def fetch_rows(table, idx, max_rows=ONE_HOT_MAX_ROWS):
    """Single-table convenience wrapper around fetch_many."""
    return fetch_many([table], idx, max_rows=max_rows)[0]
