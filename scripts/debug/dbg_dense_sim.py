"""Numpy simulation of dense_intersect_loop's exact semantics (bf16x2
dot emulated with ml_dtypes) for the failing check_dense_tpu case.

Stages toggleable to localize the TPU mismatch:
  --no-early-exit   visit every group
  --no-quant        skip the 13-bit lane-id t quantization
"""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import ml_dtypes

import jax.numpy as jnp
from pbrt_tpu.ops import pallas_intersect as pdense

def brute(v0, e1, e2, o, d, tmax):
    import numpy as np
    t_best = tmax.copy()
    prim = np.full(o.shape[0], -1, np.int64)
    for i in range(v0.shape[0]):
        pvec = np.cross(d, e2[i])
        det = (e1[i] * pvec).sum(-1)
        ok = np.abs(det) > 1e-9
        inv = np.where(ok, 1.0 / np.where(det == 0, 1, det), 0.0)
        tvec = o - v0[i]
        b1 = (tvec * pvec).sum(-1) * inv
        qvec = np.cross(tvec, e1[i])
        b2 = (d * qvec).sum(-1) * inv
        t = (e2[i] * qvec).sum(-1) * inv
        h = ok & (b1 >= -1e-7) & (b2 >= -1e-7) & (b1 + b2 <= 1 + 1e-7) & (t > 1e-4)
        upd = h & (t < t_best)
        t_best = np.where(upd, t, t_best)
        prim = np.where(upd, i, prim)
    return t_best, prim


BF = ml_dtypes.bfloat16
CH = pdense.CHUNK
PICK = pdense.PICK
T = pdense.RAY_TILE
LANE_MASK = pdense.LANE_MASK
LANE_BITS_CHUNK = pdense.LANE_BITS_CHUNK
F32_MAX = np.float32(3.4028235e38)

early_exit = "--no-early-exit" not in sys.argv
quant = "--no-quant" not in sys.argv

rs = np.random.RandomState(0)
n_tris, n_rays = 600, 2048
v0 = rs.rand(n_tris, 3) * 10 - 5
e1 = rs.randn(n_tris, 3) * 0.4
e2 = rs.randn(n_tris, 3) * 0.4
tab = pdense.build_dense_tables(v0, e1, e2)

o = np.tile(np.array([[0.0, 0.0, -20.0]]), (n_rays, 1))
px = rs.rand(n_rays, 2) * 12 - 6
tgt = np.concatenate([px, np.zeros((n_rays, 1))], 1)
d = tgt - o
d = d / np.linalg.norm(d, axis=-1, keepdims=True)
tmax = np.full(n_rays, 1e30, np.float32)

# ray_vectors in pure numpy (the TPU is busy with other diagnostics)
_o = o.astype(np.float32)
_d = d.astype(np.float32)
_oc = _o - tab["center"][None, :]
_m = np.cross(_oc, _d)
_inv = 1.0 / np.where(np.abs(_d) > 1e-20, _d, 1e-20)
B_ = _o.shape[0]
r16 = np.concatenate([_d, _m, _oc, _inv, np.zeros((B_, 3), np.float32),
                      np.ones((B_, 1), np.float32)], -1).astype(np.float32)

W = np.asarray(tab["W"]).astype(np.float32)     # [4,48,Pp] (bf16 vals)
cb = np.asarray(tab["chunk_bounds"])            # [C,8]
C = cb.shape[0]

# ---- r48 operand (bf16 emulation) ----
r_hi = r16.astype(BF).astype(np.float32)
r_lo = (r16 - r_hi).astype(BF).astype(np.float32)
r48 = np.concatenate([r_hi, r_lo, r_hi], -1)    # [B,48] f32-of-bf16

n_tiles = n_rays // T
t_out = np.array(tmax)
prim_out = np.full(n_rays, -1, np.int64)

for tile in range(n_tiles):
    sl = slice(tile * T, (tile + 1) * T)
    r = r16[sl]
    tm = tmax[sl]
    # slab test (same as _queue_kernel)
    tnear = np.full((C, T), -F32_MAX)
    tfar = np.full((C, T), F32_MAX)
    for ax in range(3):
        lo = cb[:, ax][:, None]
        hi = cb[:, 4 + ax][:, None]
        oca = r[:, 6 + ax][None, :]
        inva = r[:, 9 + ax][None, :]
        t0 = (lo - oca) * inva
        t1 = (hi - oca) * inva
        tnear = np.maximum(tnear, np.minimum(t0, t1))
        tfar = np.minimum(tfar, np.maximum(t0, t1))
    hit = (tnear <= tfar * 1.0001 + 1e-5) & (tfar > 0) \
        & (tnear < tm[None, :]) & (tm[None, :] > 0)
    hits_c = hit.any(1)
    nears_c = np.where(hit, np.maximum(tnear, 0.0), F32_MAX).min(1)
    key = np.where(hits_c, nears_c, F32_MAX)
    order = np.argsort(key, kind="stable")
    n_active = int(hits_c.sum())
    chunk_list = order.astype(np.int64)
    G = (n_active + PICK - 1) // PICK
    near_g = [key[chunk_list[j * PICK]] for j in range(G)]

    t_best = tm.copy()
    prim = np.full(T, -1, np.int64)
    visited = 0
    for j in range(G):
        if early_exit and t_best.max() <= near_g[j]:
            break
        visited += 1
        picks = [int(chunk_list[min(j * PICK + s, C - 1)])
                 for s in range(PICK)]
        # assemble [48, PICK*4*CH] section-major operand
        cols = np.concatenate(
            [W[sec, :, c * CH:(c + 1) * CH]
             for sec in range(4) for c in picks], -1)
        out = (r48[sl].astype(np.float64) @ cols.astype(np.float64)) \
            .astype(np.float32)
        PC = PICK * CH
        s1 = out[:, 0 * PC:1 * PC]
        s2 = out[:, 1 * PC:2 * PC]
        num = out[:, 2 * PC:3 * PC]
        s0 = out[:, 3 * PC:4 * PC]
        nd = s0 + s1 + s2
        ii = [x.view(np.int32) for x in (s0, s1, s2)]
        inside = ((ii[0] ^ ii[1]) | (ii[0] ^ ii[2])) >= 0
        with np.errstate(divide="ignore", invalid="ignore"):
            t = num / nd
        tb = np.where(t_best > 0, t_best, -F32_MAX)
        h = inside & (t > 1e-4) & (t < tb[:, None]) & np.isfinite(t)
        lane = np.arange(PC, dtype=np.int32)[None, :]
        if quant:
            k = (t.astype(np.float32).view(np.int32)
                 & np.int32(~LANE_MASK)) | lane
        else:
            k = t.astype(np.float32).view(np.int32)
        kmin = np.where(h, k, 0x7F7FFFFF).min(1)
        upd = kmin < 0x7F7FFFFF
        if quant:
            t_new = (kmin & np.int32(~LANE_MASK)).view(np.float32)
            kk = kmin & LANE_MASK
            s_win = kk >> LANE_BITS_CHUNK
            c_win = np.array([picks[s] for s in s_win])
            p_new = c_win * CH + (kk & (CH - 1))
        else:
            t_new = kmin.view(np.float32)
            p_new = np.where(h, np.arange(PC)[None, :], 0).max(1)
            am = np.where(h, t, np.inf).argmin(1)
            p_new = np.array([picks[a // CH] * CH + a % CH for a in am])
        t_best = np.where(upd, t_new, t_best)
        prim = np.where(upd, p_new, prim)
    t_out[sl] = t_best
    prim_out[sl] = prim

t_ref, prim_ref = brute(v0, e1, e2, o, d, tmax.astype(np.float64))
hit = prim_out >= 0
hit_ref = prim_ref >= 0
dis = hit != hit_ref
print(f"SIM (early_exit={early_exit} quant={quant}) "
      f"mismatch: {dis.sum()}/{n_rays} "
      f"(sim-only {(hit & ~hit_ref).sum()} ref-only {(~hit & hit_ref).sum()})")
both = hit & hit_ref
rel = np.abs(t_out[both] - t_ref[both]) / np.maximum(t_ref[both], 1e-6)
print("both-hit median rel:", np.median(rel), "max:", rel.max())
print("mismatch rays:", np.nonzero(dis)[0][:20])
