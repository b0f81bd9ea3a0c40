"""Where does the dense-intersect kernel time go? dots vs epilogue vs overhead.

Runs stripped variants of the kernel on a synthetic 66k-tri blob scene:
  full      - the real kernel
  dots_only - 3 bf16 dots, epilogue replaced by a trivial sum
  dots1     - 1 bf16 dot only
  epi_only  - no dots; epilogue on a VMEM scratch of zeros
  empty     - kernel body does nothing (grid/DMA overhead floor)
Each also reported with all chunk-steps forced ACTIVE vs with the real
tile-level culling, to separate per-step overhead from active-step cost.
"""
import sys
sys.path.insert(0, "/root/repo")
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pbrt_tpu.ops import pallas_intersect as pdense

RAY_TILE = pdense.RAY_TILE
CHUNK = pdense.CHUNK
F32_MAX = 3.4e38


def make_scene(seed=0, n=66000):
    rs = np.random.RandomState(seed)
    ncl = 256
    centers = rs.rand(ncl, 3) * 20 - 10
    order = np.argsort(centers[:, 0] + 37.1 * np.floor(centers[:, 1]))
    centers = centers[order]
    per = n // ncl
    base = np.repeat(centers, per, 0) + rs.randn(ncl * per, 3) * 0.3
    v0 = base
    e1 = rs.randn(ncl * per, 3) * 0.1
    e2 = rs.randn(ncl * per, 3) * 0.1
    return pdense.build_dense_tables(v0, e1, e2)


def make_rays(seed, B=65536):
    k = jax.random.PRNGKey(seed)
    k1, _ = jax.random.split(k)
    px = jax.random.uniform(k1, (B, 2)) * 24 - 12
    o = jnp.concatenate([px[:, :1], px[:, 1:], jnp.full((B, 1), -40.0)], 1)
    tgt = jnp.concatenate([px * 0.8, jnp.zeros((B, 1))], 1)
    d = tgt - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def variant_kernel(mode):
    def _kernel(cl_ref, na_ref, r16_ref, tmax_ref, w_ref, cb_ref,
                t_ref, prim_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        c = cl_ref[i, j]
        active = j < na_ref[i]

        @pl.when(j == 0)
        def _():
            t_ref[:] = tmax_ref[:]
            prim_ref[:] = jnp.full_like(prim_ref, -1)

        if mode == "empty":
            return
        r = r16_ref[0]
        t_best = t_ref[0, 0]
        d = r[:, 0:3]
        oc = r[:, 6:9]
        inv_d = 1.0 / jnp.where(jnp.abs(d) > 1e-20, d, 1e-20)
        lo = cb_ref[c, 0:3]
        hi = cb_ref[c, 4:7]
        t0 = (lo[None, :] - oc) * inv_d
        t1 = (hi[None, :] - oc) * inv_d
        tnear = jnp.max(jnp.minimum(t0, t1), axis=1)
        tfar = jnp.min(jnp.maximum(t0, t1), axis=1)
        box_hit = (tnear <= tfar * 1.0001 + 1e-5) & (tnear < t_best) & \
                  (tfar > 0) & (t_best > 0)

        @pl.when(active & jnp.any(box_hit))
        def _():
            dn = (((1,), (0,)), ((), ()))
            if mode in ("full", "dots_only", "dots1"):
                r_hi = r.astype(jnp.bfloat16)
                r_lo = (r - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                w_hi = w_ref[0]
                w_lo = w_ref[1]
                out = jax.lax.dot_general(r_hi, w_hi, dn,
                                          preferred_element_type=jnp.float32)
                if mode != "dots1":
                    out += jax.lax.dot_general(r_hi, w_lo, dn,
                                               preferred_element_type=jnp.float32)
                    out += jax.lax.dot_general(r_lo, w_hi, dn,
                                               preferred_element_type=jnp.float32)
            else:  # epi_only
                ii = jax.lax.broadcasted_iota(
                    jnp.int32, (RAY_TILE, 5 * CHUNK), 1)
                out = tnear[:, None] + ii.astype(jnp.float32) * 1e-9
            if mode in ("dots_only", "dots1"):
                t_ref[0, 0, :] = jnp.minimum(t_best, jnp.min(out, axis=1))
                return
            s0 = out[:, 0 * CHUNK:1 * CHUNK]
            s1 = out[:, 1 * CHUNK:2 * CHUNK]
            s2 = out[:, 2 * CHUNK:3 * CHUNK]
            num = out[:, 3 * CHUNK:4 * CHUNK]
            nd = out[:, 4 * CHUNK:5 * CHUNK]
            i0 = s0.view(jnp.int32)
            i1 = s1.view(jnp.int32)
            i2 = s2.view(jnp.int32)
            inside = ((i0 ^ i1) | (i0 ^ i2)) >= 0
            t = num / nd
            tb = jnp.where(box_hit, t_best, -F32_MAX)
            hit = inside & (t > 1e-4) & (t < tb[:, None])
            lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            key = (t.view(jnp.int32) & jnp.int32(~0x1FF)) | lane
            BIG = jnp.int32(0x7F7FFFFF)
            kmin = jnp.min(jnp.where(hit, key, BIG), axis=1)
            upd = kmin < BIG
            t_new = (kmin & jnp.int32(~0x1FF)).view(jnp.float32)
            k = kmin & jnp.int32(0x1FF)
            t_ref[0, 0, :] = jnp.where(upd, t_new, t_best)
            prim_ref[0, 0, :] = jnp.where(
                upd, c.astype(jnp.int32) * CHUNK + k, prim_ref[0, 0, :])
    return _kernel


@partial(jax.jit, static_argnames=("mode", "n_pad", "force_active"))
def run(r16, tmax, W, cb, n_pad, mode, force_active):
    B = r16.shape[0]
    n_tiles = B // RAY_TILE
    n_chunks = n_pad // CHUNK
    r16 = r16.reshape(n_tiles, RAY_TILE, 16)
    tmax_t = tmax.reshape(n_tiles, RAY_TILE)
    tmax2 = tmax.reshape(n_tiles, 1, RAY_TILE)
    if force_active:
        chunk_list = jnp.tile(jnp.arange(n_chunks, dtype=jnp.int32)[None],
                              (n_tiles, 1))
        n_active = jnp.full((n_tiles,), n_chunks, jnp.int32)
    else:
        chunk_list, n_active = pdense._tile_chunk_lists(r16, tmax_t, cb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((1, RAY_TILE, 16), lambda i, j, cl, na: (i, 0, 0)),
            pl.BlockSpec((1, 1, RAY_TILE), lambda i, j, cl, na: (i, 0, 0)),
            pl.BlockSpec((2, 16, 5 * CHUNK),
                         lambda i, j, cl, na: (0, 0, cl[i, j])),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, RAY_TILE), lambda i, j, cl, na: (i, 0, 0)),
            pl.BlockSpec((1, 1, RAY_TILE), lambda i, j, cl, na: (i, 0, 0)),
        ],
    )
    t_out, prim_out = pl.pallas_call(
        variant_kernel(mode),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 1, RAY_TILE), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, RAY_TILE), jnp.int32),
        ],
    )(chunk_list, n_active, r16, tmax2, W, cb)
    return t_out.sum() + prim_out.sum()


def main():
    tab = make_scene()
    W = jnp.asarray(tab["W"])
    cb = jnp.asarray(tab["chunk_bounds"])
    center = jnp.asarray(tab["center"])
    n_pad = tab["n_pad"]
    B = 65536
    print("chunks:", n_pad // CHUNK, "tiles:", B // RAY_TILE)

    for force in (False, True):
        for mode in ("real", "empty", "epi_only", "dots1", "dots_only",
                     "full"):
            if mode == "real" and force:
                continue

            def go(seed):
                o, d = make_rays(seed)
                r16 = pdense.ray_vectors(o, d, center)
                tmax = jnp.full((B,), 1e30, jnp.float32)
                if mode == "real":
                    t, prim = pdense.dense_intersect(r16, tmax, W, cb, n_pad)
                    return t.sum() + prim.sum()
                return run(r16, tmax, W, cb, n_pad, mode, force)
            print(f"compiling {mode} force={force}", flush=True)
            go(0).block_until_ready()
            ITERS = 10
            t0 = time.time()
            for s in range(1, ITERS + 1):
                r = float(go(s))   # full sync each iter
            dt = (time.time() - t0) / ITERS
            tag = "all-active" if force else "culled    "
            print(f"{tag} {mode:10s}: {dt*1e3:7.1f} ms/batch  "
                  f"({B/dt/1e6:6.2f} M rays/s)")


if __name__ == "__main__":
    main()
