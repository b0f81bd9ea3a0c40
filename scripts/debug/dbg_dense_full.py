"""Instrumented copy of _kernel_loop: same merged while_loop machinery,
but ALSO dumps each tile's dot `out` and epilogue intermediates.
Run on the failing case's first grid step (tiles 0-3, rays 0-2047...
actually TPG tiles)."""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import pbrt_tpu.ops.pallas_intersect as pd

CH = pd.CHUNK
PICK = pd.PICK
T = pd.RAY_TILE
TPG = pd.TPG
PC = PICK * CH
F32_MAX = pd.F32_MAX
LANE_MASK = pd.LANE_MASK
LANE_BITS_CHUNK = pd.LANE_BITS_CHUNK

rs = np.random.RandomState(0)
n_tris, n_rays = 600, 2048
v0 = rs.rand(n_tris, 3) * 10 - 5
e1 = rs.randn(n_tris, 3) * 0.4
e2 = rs.randn(n_tris, 3) * 0.4
tab = pd.build_dense_tables(v0, e1, e2)

o = np.tile(np.array([[0.0, 0.0, -20.0]]), (n_rays, 1))
px = rs.rand(n_rays, 2) * 12 - 6
tgt = np.concatenate([px, np.zeros((n_rays, 1))], 1)
d = tgt - o
d = d / np.linalg.norm(d, axis=-1, keepdims=True)
tmax = np.full(n_rays, 1e30, np.float32)

r16 = jnp.asarray(np.asarray(jax.device_get(pd.ray_vectors(
    jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
    jnp.asarray(tab["center"])))))


def kernel(cl_ref, na_ref, nl_ref, r48_ref, meta_ref, w_hbm, cb_ref,
           t_ref, prim_ref, dump_ref, wbuf, sems):
    tpg = r48_ref.shape[0]
    Tl = r48_ref.shape[1]
    base = pl.program_id(0) * tpg
    lane = jax.lax.broadcasted_iota(jnp.int32, (Tl, PC), 1)
    BIG = jnp.int32(0x7F7FFFFF)
    dn = (((1,), (0,)), ((), ()))

    t_ref[:] = meta_ref[:, 0:1]
    prim_ref[:] = jnp.full_like(prim_ref, -1)

    offs = [jnp.int32(0)]
    for t in range(tpg):
        offs.append(offs[-1] + na_ref[base + t])
    total = offs[-1]

    def tt_of(k):
        tt = jnp.int32(0)
        for t in range(1, tpg):
            tt = tt + (k >= offs[t]).astype(jnp.int32)
        return tt

    def sel_by_tt(tt, vals):
        out = vals[0]
        for t in range(1, tpg):
            out = jax.lax.select(tt == t, vals[t], out)
        return out

    def entry(k, s):
        tt = tt_of(k)
        j = k - sel_by_tt(tt, offs[:tpg])
        idx = j * PICK + s
        word = cl_ref[idx >> 1, base + tt]
        return jax.lax.select((idx & 1) == 0, word & 0xFFFF,
                              (word >> 16) & 0xFFFF)

    def dma(slot, k, s, sec):
        c = entry(k, s)
        return pltpu.make_async_copy(
            w_hbm.at[sec, :, pl.ds(c * CH, CH)],
            wbuf.at[slot, :, pl.ds(sec * PC + s * CH, CH)],
            sems.at[slot, sec * PICK + s])

    def dma_item(k):
        slot = k % 2
        return [dma(slot, k, s, sec)
                for sec in range(4) for s in range(PICK)]

    @pl.when(total > 0)
    def _():
        for cp in dma_item(jnp.int32(0)):
            cp.start()

    def body(state):
        k, tt_cur, t_best, prim = state
        tt = tt_of(k)
        changed = tt != tt_cur

        @pl.when(changed)
        def _():
            t_ref[tt_cur] = t_best
            prim_ref[tt_cur] = prim
        t_best = jnp.where(changed, meta_ref[tt, 0:1], t_best)
        prim = jnp.where(changed, -1, prim)
        anyhit = meta_ref[tt, 1:2] > 0.5

        @pl.when(k + 1 < total)
        def _():
            for cp in dma_item(k + 1):
                cp.start()
        for cp in dma_item(k):
            cp.wait()

        r48 = r48_ref[tt]
        out = jax.lax.dot_general(r48, wbuf[k % 2], dn,
                                  preferred_element_type=jnp.float32)

        s1 = out[:, 0 * PC:1 * PC]
        s2 = out[:, 1 * PC:2 * PC]
        num = out[:, 2 * PC:3 * PC]
        s0 = out[:, 3 * PC:4 * PC]
        nd = s0 + s1 + s2
        i0 = s0.view(jnp.int32)
        i1 = s1.view(jnp.int32)
        i2 = s2.view(jnp.int32)
        inside = ((i0 ^ i1) | (i0 ^ i2)) >= 0
        rcp = pl.reciprocal(nd, approx=True)
        rcp = rcp * (2.0 - nd * rcp)
        t = num * rcp
        tb = jnp.where(t_best > 0, t_best, -F32_MAX)
        hit = inside & (t > 1e-4) & (t < tb[0][:, None])
        # DUMP compact per-lane hit/t map for this tile's first group
        dump_ref[tt] = jnp.where(hit, t, -1.0).astype(jnp.bfloat16)
        key = (t.view(jnp.int32) & jnp.int32(~LANE_MASK)) | lane
        kmin = jnp.min(jnp.where(hit, key, BIG), axis=1)[None, :]
        upd = kmin < BIG
        t_new = (kmin & jnp.int32(~LANE_MASK)).view(jnp.float32)
        kk = kmin & jnp.int32(LANE_MASK)
        t_new = jnp.where(anyhit, -1.0, t_new)
        s_win = kk >> LANE_BITS_CHUNK
        c_win = jnp.full_like(kk, entry(k, 0))
        for s in range(1, PICK):
            c_win = jnp.where(s_win == s, entry(k, s), c_win)
        t_best = jnp.where(upd, t_new, t_best)
        prim = jnp.where(upd, c_win * CH + (kk & (CH - 1)), prim)
        return (k + 1, tt, t_best, prim)

    def cond(state):
        return state[0] < total

    tt0 = tt_of(jnp.int32(0))
    state0 = (jnp.int32(0), tt0, meta_ref[tt0, 0:1],
              jnp.full((1, Tl), -1, jnp.int32))
    k_end, tt_last, t_best, prim = jax.lax.while_loop(cond, body, state0)

    @pl.when(total > 0)
    def _():
        t_ref[tt_last] = t_best
        prim_ref[tt_last] = prim


B = n_rays
step_rays = T * TPG
n_tiles = B // T
r16t = r16.reshape(n_tiles, T, 16)
tmax_t = jnp.asarray(tmax).reshape(n_tiles, T)
r_hi = r16.astype(jnp.bfloat16)
r_lo = (r16 - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
r48t = jnp.concatenate([r_hi, r_lo, r_hi], -1).reshape(n_tiles, T, 48)
meta = jnp.stack([tmax_t, r16t[:, :, 12]], 1)
chunk_list, n_active, near_list = pd._tile_chunk_lists(
    r16t, tmax_t, jnp.asarray(tab["chunk_bounds"]))
C = chunk_list.shape[1]
G = (C + PICK - 1) // PICK
CP = G * PICK + (G * PICK) % 2
if CP != C:
    chunk_list = jnp.concatenate(
        [chunk_list, jnp.repeat(chunk_list[:, -1:], CP - C, 1)], 1)
cl_packed = (chunk_list[:, 0::2] | (chunk_list[:, 1::2] << 16)).T
n_groups = (n_active + PICK - 1) // PICK
near_g = near_list[:, ::PICK]
if near_g.shape[1] < G:
    near_g = jnp.concatenate(
        [near_g, jnp.full((n_tiles, G - near_g.shape[1]), F32_MAX)], 1)
near_g = near_g.T
W = jnp.asarray(tab["W"])

grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=3,
    grid=(n_tiles // TPG,),
    in_specs=[
        pl.BlockSpec((TPG, T, 48), lambda i, cl, na, nl: (i, 0, 0)),
        pl.BlockSpec((TPG, 2, T), lambda i, cl, na, nl: (i, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ],
    out_specs=[
        pl.BlockSpec((TPG, 1, T), lambda i, cl, na, nl: (i, 0, 0)),
        pl.BlockSpec((TPG, 1, T), lambda i, cl, na, nl: (i, 0, 0)),
        pl.BlockSpec((TPG, T, PC), lambda i, cl, na, nl: (i, 0, 0)),
    ],
    scratch_shapes=[
        pltpu.VMEM((2, 48, PC * 4), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((2, 4 * PICK)),
    ],
)
t_out, prim_out, dump = pl.pallas_call(
    kernel, grid_spec=grid_spec,
    out_shape=[
        jax.ShapeDtypeStruct((n_tiles, 1, T), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, 1, T), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, T, PC), jnp.bfloat16),
    ],
)(cl_packed, n_groups, near_g, r48t, meta, W,
  jnp.asarray(tab["chunk_bounds"]))

t_out = np.asarray(t_out).reshape(-1)
prim_out = np.asarray(prim_out).reshape(-1)
dump = np.asarray(dump)
cl_np = np.asarray(chunk_list)

# XLA truth per tile: recompute hit/t map from the XLA dot
print("n_active:", np.asarray(n_active)[:8], "cl:", cl_np[:4, :4])
tm0 = np.full(T, 1e30, np.float32)
for tile in range(4):
    picks = [int(cl_np[tile, s]) for s in range(PICK)]
    cols = jnp.concatenate(
        [W[sec, :, c * CH:(c + 1) * CH]
         for sec in range(4) for c in picks], -1)
    out_x = np.asarray(jax.lax.dot_general(
        r48t[tile], cols, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    s1 = out_x[:, 0*PC:1*PC]; s2 = out_x[:, 1*PC:2*PC]
    num = out_x[:, 2*PC:3*PC]; s0 = out_x[:, 3*PC:4*PC]
    nd = s0 + s1 + s2
    ii = [x.view(np.int32) for x in (s0, s1, s2)]
    inside = ((ii[0] ^ ii[1]) | (ii[0] ^ ii[2])) >= 0
    with np.errstate(divide="ignore", invalid="ignore"):
        t_x = num / nd
    hit_x = inside & (t_x > 1e-4) & np.isfinite(t_x) & (t_x < 1e30)
    dmap = dump[tile].astype(np.float32)
    hit_k = dmap > 0
    dis = hit_k != hit_x
    print(f"tile {tile} picks {picks}: hit-map disagreements {dis.sum()}"
          f" of {dis.size}; kernel-only {(hit_k & ~hit_x).sum()}"
          f" xla-only {(~hit_k & hit_x).sum()}")
    if dis.sum():
        r_i, l_i = np.nonzero(dis)
        print("  first few (ray,lane):", list(zip(r_i[:6], l_i[:6])))
        for rr, ll in zip(r_i[:3], l_i[:3]):
            print(f"   ray {rr+tile*T} lane {ll}: kernel t={dmap[rr,ll]:.3f}"
                  f" xla hit={hit_x[rr,ll]} t={t_x[rr,ll]:.4f}"
                  f" s=[{s0[rr,ll]:.3e},{s1[rr,ll]:.3e},{s2[rr,ll]:.3e}]")
# compare kernel outputs to brute for the notorious rays
def brute1(ray_id):
    best_t, best_p = 1e30, -1
    for i in range(n_tris):
        pvec = np.cross(d[ray_id], e2[i])
        det = (e1[i] * pvec).sum()
        if abs(det) < 1e-9:
            continue
        inv = 1.0 / det
        tvec = o[ray_id] - v0[i]
        b1 = (tvec * pvec).sum() * inv
        qvec = np.cross(tvec, e1[i])
        b2 = (d[ray_id] * qvec).sum() * inv
        tt = (e2[i] * qvec).sum() * inv
        if b1 >= -1e-7 and b2 >= -1e-7 and b1 + b2 <= 1 + 1e-7 \
                and 1e-4 < tt < best_t:
            best_t, best_p = tt, i
    return best_t, best_p

for ray in [235, 328, 380, 481, 490]:
    bt, bp = brute1(ray)
    print(f"ray {ray}: kernel t={t_out[ray]:.4f} prim={prim_out[ray]} "
          f"brute t={bt:.4f} prim={bp}")
