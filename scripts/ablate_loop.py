"""Ablate the chunk-loop kernel's per-step cost on the cornell scene.

Modes: full | nodot (cond always skips: loop+box+DMA floor) |
noepi (dot runs, epilogue replaced by a trivial reduce).
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

from pbrt_tpu.models import flagship
from pbrt_tpu.ops import intersect as isect
from pbrt_tpu.ops import pallas_intersect as pd

CHUNK = pd.CHUNK
RAY_TILE = pd.RAY_TILE
F32_MAX = pd.F32_MAX
LANE_MASK = pd.LANE_MASK

scene, _ = flagship.cornell(tessellate=True)
B = 131072
rs = np.random.RandomState(0)
o = jnp.asarray(rs.rand(B, 3) * 4.6 + 0.2, jnp.float32)
d = rs.randn(B, 3)
d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
tmax = jnp.full((B,), 1e30, jnp.float32)
r16 = pd.ray_vectors(o, d, scene.dense_center)
order = isect._coherence_order(scene, o, d, tmax)
r16 = r16[order]


def make(mode):
    def kern(cl_ref, na_ref, r16_ref, tmax_ref, w_hbm, cb_ref,
             t_ref, prim_ref, wbuf, sems):
        i = pl.program_id(0)
        na = na_ref[i]
        r = r16_ref[0]
        r_hi = r.astype(jnp.bfloat16)
        r_lo = (r - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        r48 = jnp.concatenate([r_hi, r_lo, r_hi], axis=1)
        oc0 = r[:, 6][None, :]
        oc1 = r[:, 7][None, :]
        oc2 = r[:, 8][None, :]
        iv0 = r[:, 9][None, :]
        iv1 = r[:, 10][None, :]
        iv2 = r[:, 11][None, :]
        anyhit = r[:, 12][None, :] > 0.5

        vmem_mode = mode.startswith("vmem")

        def dma(slot, j):
            c = cl_ref[i, j]
            return pltpu.make_async_copy(
                w_hbm.at[:, pl.ds(c * (4 * CHUNK), 4 * CHUNK)],
                wbuf.at[slot], sems.at[slot])

        if not vmem_mode:
            @pl.when(na > 0)
            def _():
                dma(0, 0).start()

        def body(j, carry):
            t_best, prim = carry
            c = cl_ref[i, j]

            if not vmem_mode:
                @pl.when(j + 1 < na)
                def _():
                    dma((j + 1) % 2, j + 1).start()
                dma(j % 2, j).wait()

            ta0 = (cb_ref[c, 0] - oc0) * iv0
            tb0 = (cb_ref[c, 4] - oc0) * iv0
            ta1 = (cb_ref[c, 1] - oc1) * iv1
            tb1 = (cb_ref[c, 5] - oc1) * iv1
            ta2 = (cb_ref[c, 2] - oc2) * iv2
            tb2 = (cb_ref[c, 6] - oc2) * iv2
            tnear = jnp.maximum(jnp.maximum(jnp.minimum(ta0, tb0),
                                            jnp.minimum(ta1, tb1)),
                                jnp.minimum(ta2, tb2))
            tfar = jnp.minimum(jnp.minimum(jnp.maximum(ta0, tb0),
                                           jnp.maximum(ta1, tb1)),
                               jnp.maximum(ta2, tb2))
            box_hit = (tnear <= tfar * 1.0001 + 1e-5) & (tnear < t_best) & \
                      (tfar > 0) & (t_best > 0)

            def do_dot(args):
                t_best, prim = args
                w = (w_hbm[:, pl.ds(c * (4 * CHUNK), 4 * CHUNK)]
                     if vmem_mode else wbuf[j % 2])
                dn = (((1,), (0,)), ((), ()))
                out = jax.lax.dot_general(
                    r48, w, dn, preferred_element_type=jnp.float32)
                if mode == "noepi":
                    s = jnp.min(out, axis=1)[None, :]
                    return (jnp.minimum(t_best, jnp.abs(s) + 1e30), prim)
                s1 = out[:, 0 * CHUNK:1 * CHUNK]
                s2 = out[:, 1 * CHUNK:2 * CHUNK]
                num = out[:, 2 * CHUNK:3 * CHUNK]
                nd = out[:, 3 * CHUNK:4 * CHUNK]
                s0 = nd - s1 - s2
                i0 = s0.view(jnp.int32)
                i1 = s1.view(jnp.int32)
                i2 = s2.view(jnp.int32)
                inside = ((i0 ^ i1) | (i0 ^ i2)) >= 0
                t = num * pl.reciprocal(nd, approx=True)
                tb = jnp.where(box_hit, t_best, -F32_MAX)
                hit = inside & (t > 1e-4) & (t < tb[0][:, None])
                lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
                key = (t.view(jnp.int32) & jnp.int32(~LANE_MASK)) | lane
                BIG = jnp.int32(0x7F7FFFFF)
                kmin = jnp.min(jnp.where(hit, key, BIG), axis=1)[None, :]
                upd = kmin < BIG
                t_new = (kmin & jnp.int32(~LANE_MASK)).view(jnp.float32)
                kk = kmin & jnp.int32(LANE_MASK)
                t_new = jnp.where(anyhit, -1.0, t_new)
                return (jnp.where(upd, t_new, t_best),
                        jnp.where(upd, c * CHUNK + kk, prim))

            if mode.endswith("nocond"):
                return do_dot((t_best, prim))
            pred = jnp.any(box_hit) if mode != "nodot" else (na < 0)
            return jax.lax.cond(pred, do_dot, lambda a: a, (t_best, prim))

        t_init = tmax_ref[0]
        prim_init = jnp.full(t_init.shape, -1, jnp.int32)
        t_best, prim = jax.lax.fori_loop(0, na, body, (t_init, prim_init))
        t_ref[0] = t_best
        prim_ref[0] = prim

    @jax.jit
    def run(r16, tmax):
        n_tiles = B // RAY_TILE
        r16t = r16.reshape(n_tiles, RAY_TILE, 16)
        tmax_t = tmax.reshape(n_tiles, RAY_TILE)
        tmax2 = tmax.reshape(n_tiles, 1, RAY_TILE)
        cl, na, _ = pd._tile_chunk_lists(r16t, tmax_t, scene.dense_cb)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, RAY_TILE, 16), lambda i, cl, na: (i, 0, 0)),
                pl.BlockSpec((1, 1, RAY_TILE), lambda i, cl, na: (i, 0, 0)),
                pl.BlockSpec(memory_space=(pltpu.VMEM if mode.startswith("vmem")
                                           else pltpu.ANY)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, RAY_TILE), lambda i, cl, na: (i, 0, 0)),
                pl.BlockSpec((1, 1, RAY_TILE), lambda i, cl, na: (i, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 48, 4 * CHUNK), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        t, p = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles, 1, RAY_TILE), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, 1, RAY_TILE), jnp.int32),
            ],
        )(cl, na, r16t, tmax2, scene.dense_w, scene.dense_cb)
        return t.sum(), (p >= 0).sum()

    return run


def timed(fn, *a, n=16):
    jax.block_until_ready(fn(*a))
    t0 = time.time()
    out = [fn(*a) for _ in range(n)]
    jax.block_until_ready(out)
    return (time.time() - t0) / n


n_tiles = B // RAY_TILE
r16t = r16.reshape(n_tiles, RAY_TILE, 16)
tmt = tmax.reshape(n_tiles, RAY_TILE)
_, na, _ = pd._tile_chunk_lists(r16t, tmt, scene.dense_cb)
steps = int(jnp.sum(na))
print(f"tiles {n_tiles}, total steps {steps} "
      f"({steps/n_tiles:.2f} chunks/tile)")
for mode in ("full", "vmem", "vmem_nocond"):
    dt = timed(make(mode), r16, tmax)
    print(f"{mode:6s}: {dt*1e3:8.2f} ms  ({dt/steps*1e6:6.2f} us/step)")
