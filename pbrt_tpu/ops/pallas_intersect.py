"""MXU-native ray-triangle intersection (Pallas kernel).

This is the TPU-first redesign of the reference's hot loop (BVH traversal +
Moller-Trumbore, bvh.cpp:662 / triangle.cpp:188): instead of a divergent
pointer chase, intersection is expressed as **dense matrix multiplies** using
Pluecker coordinates, which the MXU executes directly:

  per-ray 16-vector  r = [d, (o-c) x d, (o-c), 1/d, pad, 1]   (c = center)
  per-tri constants  4 columns: 2 edge Pluecker forms (the third follows
                     from s0+s1+s2 = n.d), plane numerator and n.d
  out = r @ W        -> ray hits tri iff the 3 sides share a sign
  t   = num / nd

Columns share a per-triangle scale (sign-invariant); a single K=48 bf16
MXU pass [r_hi|r_lo|r_hi] @ [w_hi;w_hi;w_lo] reaches ~f32 accuracy, and
shared-edge sign consistency keeps the test watertight where fp32
Moller-Trumbore can leak.

Hierarchy is recovered *without divergence* by chunking: triangles stay in
BVH-leaf order, so each 512-triangle chunk is spatially tight.  A sparse
1-D work queue of (ray-tile, chunk) pairs that survive whole-tile AABB
culling (rays pre-sorted by origin/octant for tile coherence) drives the
grid, with per-ray AABB + shrinking-t_best refinement inside the kernel;
the worst case degrades to dense brute force rather than pointer chasing.

The octant-threaded BVH loop (ops/intersect.py) remains the fallback for
very large scenes.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os
RAY_TILE = int(_os.environ.get("PBRT_TPU_RAY_TILE", "512"))
CHUNK = int(_os.environ.get("PBRT_TPU_CHUNK", "256"))    # tris per chunk
# chunks visited per loop iteration: the dot stays PICK*4*CHUNK = 4096
# columns wide, but its PICK chunks are chosen INDEPENDENTLY from the
# tile's front-to-back list — finer chunks cull better (on killeroo
# bounce batches 4x256 needs ~1.7x fewer full-width steps than 1x1024,
# measured in /tmp/exp_na_chunk) while the loop/DMA/early-exit machinery
# still amortizes over a full-width step.
PICK = int(_os.environ.get("PBRT_TPU_PICK", str(max(1, 1024 // CHUNK))))
# low mantissa bits of t hold the winner's (pick, lane) id
LANE_BITS = (CHUNK * PICK - 1).bit_length()
LANE_MASK = (1 << LANE_BITS) - 1
LANE_BITS_CHUNK = (CHUNK - 1).bit_length()   # lane-within-chunk bits
# NOTE(perf, measured on v5e): finer culling only pays when the loop
# machinery still amortizes over a full-width step.  Two earlier
# variants LOST: (a) four GATED 256-tri sub-dots per chunk (lax.cond
# serialization), (b) one dot gated by the OR of four sub-chunk slab
# tests (4x the [T,3]-shaped slab math).  The PICK design wins instead:
# each iteration runs PICK unconditional 4*CHUNK-wide dots+epilogues on
# independently CHOSEN fine chunks — same per-iteration width and one
# early-exit/DMA-wait, but each ray tests far fewer irrelevant tris.
F32_MAX = 3.4e38     # python float: jnp scalars would be captured kernel consts
# ablation knob: disable the front-to-back early exit in the loop kernel
EARLY_EXIT = _os.environ.get("PBRT_TPU_EARLY_EXIT", "1") != "0"


# ---------------------------------------------------------------------------
# host precompute
# ---------------------------------------------------------------------------

def build_dense_tables(v0, e1, e2):
    """Per-triangle Pluecker/plane tables + per-chunk AABBs.

    v0,e1,e2: [P,3] float arrays (BVH-leaf order, so chunks are spatially
    tight).  Returns dict with W [48, 4*Pp] bf16 (chunk-interleaved
    s1|s2|num|nd, rows = [w_hi; w_hi; w_lo]), chunk_bounds [C,8],
    center [3], n_pad.
    """
    v0 = np.asarray(v0, np.float64)
    e1 = np.asarray(e1, np.float64)
    e2 = np.asarray(e2, np.float64)
    P = v0.shape[0]
    Pp = max(((P + CHUNK - 1) // CHUNK) * CHUNK, CHUNK)
    center = v0.mean(0) if P else np.zeros(3)

    # 4 sections per tri: s1 | s2 | num | nd.  The third edge side s0 is
    # NOT stored: the three Pluecker edge forms of a triangle satisfy
    # s0+s1+s2 = nd after a per-triangle rescale, so the kernel derives
    # s0 = nd - s1 - s2 — one fifth less MXU output, VMEM traffic and
    # table DMA.  That identity requires the three edge columns and the
    # nd column to share ONE common scale per triangle (not the per-edge
    # max-normalization used when sections were independent).
    Wsep = np.zeros((4, 16, Pp), np.float32)
    if P:
        a0, b0 = v0 - center, v0 + e1 - center
        a1, b1 = b0, v0 + e2 - center
        a2, b2 = b1, a0
        n = np.cross(e1, e2)                       # = unscaled nd column
        cols = []
        for a, b in [(a0, b0), (a1, b1), (a2, b2)]:
            cols.append(np.concatenate([np.cross(a, b), b - a], -1))
        # common per-tri scale: largest magnitude across the 3 edge
        # columns and the normal (keeps everything in healthy f32/bf16
        # range; signs and the s0+s1+s2=nd identity are scale-invariant)
        mag = np.maximum.reduce([np.abs(c).max(-1) for c in cols])
        mag = np.maximum(mag, np.abs(n).max(-1)) + 1e-30
        inv = (1.0 / mag)[:, None]
        nn = n * inv
        for s, col in enumerate(cols[1:]):         # store s1, s2 only
            col = col * inv
            Wsep[s, 0:3, :P] = col[:, :3].T
            Wsep[s, 3:6, :P] = col[:, 3:].T
        nv0 = (nn * (v0 - center)).sum(-1)
        # "num" section: r lane 15 is the constant 1, so the matmul
        # computes  nv0 - n.(o-c)  directly; t = num / nd
        Wsep[2, 6:9, :P] = -nn.T
        Wsep[2, 15, :P] = nv0
        Wsep[3, 0:3, :P] = nn.T       # nd = n.d

    # pack the 4 matrices chunk-interleaved so ONE dot per chunk suffices
    C = Pp // CHUNK
    W = np.zeros((16, 4 * Pp), np.float32)
    for c in range(C):
        for s in range(4):
            W[:, (c * 4 + s) * CHUNK:(c * 4 + s + 1) * CHUNK] = \
                Wsep[s, :, c * CHUNK:(c + 1) * CHUNK]
    # bf16x2 split, pre-stacked for a SINGLE K=48 MXU pass per chunk:
    #   [r_hi | r_lo | r_hi] @ [w_hi ; w_hi ; w_lo]
    #     = r_hi@w_hi + r_lo@w_hi + r_hi@w_lo  (~f32 accuracy)
    # One dot instead of three means `out` is written once, K rises from
    # 16 to 48 of the MXU's 128 rows, and Mosaic never materializes the
    # two partial accumulations.
    import jax.numpy as _jnp
    w_hi = np.asarray(np.asarray(W, np.float32).astype(_jnp.bfloat16))
    w_lo = np.asarray((W - w_hi.astype(np.float32)).astype(_jnp.bfloat16))
    W2 = np.concatenate([w_hi, w_hi, w_lo], 0)     # [48, 4Pp] bf16

    # chunk AABBs in centered coordinates (8-wide rows for clean VMEM tiles)
    cb = np.zeros((C, 8), np.float32)
    cb[:, 0:3] = 1e30
    cb[:, 4:7] = -1e30
    if P:
        verts = np.stack([v0 - center, v0 + e1 - center,
                          v0 + e2 - center], 1)
        for c in range(C):
            s0, s1 = c * CHUNK, min((c + 1) * CHUNK, P)
            if s0 < P:
                vv = verts[s0:s1].reshape(-1, 3)
                cb[c, 0:3] = vv.min(0) - 1e-4
                cb[c, 4:7] = vv.max(0) + 1e-4
    return dict(W=W2, chunk_bounds=cb,
                center=center.astype(np.float32), n_pad=Pp)


def ray_vectors(o, d, center, anyhit=None):
    """r16 rows for the dense kernel: [B,16] = [d, (o-c)xd, o-c, 1/d, pad, 1].

    Lane 15 is the constant 1 that pairs with the nv0 row baked into the
    "num" block of W (see build_dense_tables).  Lanes 9:12 carry 1/d for
    the in-kernel chunk AABB slab test (W rows 9:15 are zero, so the extra
    lanes never perturb the dots) — computing it here once replaces a
    [T,3] divide in every grid step.

    anyhit: optional [B] bool — lanes flagged here (shadow rays) stop at
    their FIRST accepted triangle: the kernel writes t=-1, which kills the
    lane's per-sub-chunk box test for the rest of its tile's queue.  This
    matches the reference's IntersectP semantics (scene.h:59).  Rides in
    lane 12 (a zero row of W, so it never perturbs the dots).
    """
    oc = o - center
    m = jnp.cross(oc, d)
    B = o.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(d) > 1e-20, d, 1e-20)
    flag = (jnp.zeros((B, 1), o.dtype) if anyhit is None
            else anyhit.astype(o.dtype)[:, None])
    return jnp.concatenate([d, m, oc, inv_d, flag,
                            jnp.zeros((B, 2), o.dtype),
                            jnp.ones((B, 1), o.dtype)], -1)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _kernel(wq_tile_ref, wq_chunk_ref, wq_flag_ref, r16_ref, tmax_ref,
            w_ref, cb_ref, t_ref, prim_ref):
    """One step of the flattened (tile, chunk) work queue.

    The grid is 1-D over a sparse work list of ACTIVE (ray-tile, chunk)
    pairs only (sorted by tile, front-to-back within a tile) — culled
    pairs cost zero grid steps, unlike a dense (tiles x chunks) grid
    where skipped steps still pay the per-step floor.  wq_flag: 2 = first
    step of its tile (init outputs), 1 = continuation, 0 = padding.
    """
    k = pl.program_id(0)
    c = wq_chunk_ref[k]                # chunk visited at this step (SMEM)
    flag = wq_flag_ref[k]

    @pl.when(flag == 2)
    def _():
        t_ref[:] = tmax_ref[:]
        prim_ref[:] = jnp.full_like(prim_ref, -1)

    r = r16_ref[0]                     # [T,16]
    t_best = t_ref[0, 0]               # [T]

    # ---- per-ray chunk AABB refinement against the shrinking t_best ----
    oc = r[:, 6:9]
    inv_d = r[:, 9:12]
    anyhit = r[:, 12] > 0.5
    lo = cb_ref[c, 0:3]
    hi = cb_ref[c, 4:7]
    t0 = (lo[None, :] - oc) * inv_d
    t1 = (hi[None, :] - oc) * inv_d
    tnear = jnp.max(jnp.minimum(t0, t1), axis=1)
    tfar = jnp.min(jnp.maximum(t0, t1), axis=1)
    box_hit = (tnear <= tfar * 1.0001 + 1e-5) & (tnear < t_best) & \
              (tfar > 0) & (t_best > 0)

    @pl.when((flag > 0) & jnp.any(box_hit))
    def _():
        # ONE K=48 bf16 MXU pass: [r_hi|r_lo|r_hi] @ [w_hi;w_hi;w_lo]
        # = r_hi@w_hi + r_lo@w_hi + r_hi@w_lo (~f32 accuracy, rel err
        # ~1e-5) — vs three K=16 passes this writes `out` once and uses
        # 48 of the MXU's 128 contraction rows instead of 16
        r_hi = r.astype(jnp.bfloat16)
        r_lo = (r - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        r48 = jnp.concatenate([r_hi, r_lo, r_hi], axis=1)
        dn = (((1,), (0,)), ((), ()))
        out = jax.lax.dot_general(r48, w_ref[:], dn,
                                  preferred_element_type=jnp.float32)
        # out: [T, 4*CHUNK] = s1 | s2 | num | nd.  Lean VPU epilogue:
        #  - s0 = nd - s1 - s2 (Pluecker edge forms of a closed triangle
        #    loop sum to n.d), so the third edge section is never stored
        #  - sign-consistency via integer XOR of the float bit patterns
        #  - t = num * rcp(nd) with IEEE semantics doing the guarding:
        #    padding/degenerate columns give 0*inf=NaN or inf, both of
        #    which fail the ordered t-range compares
        #  - winner lane packed into the low 10 mantissa bits of t so ONE
        #    int-min reduction yields both the min-t and its lane (t is
        #    quantized to ~1e-4 relative; the caller re-derives the
        #    winner's exact t with one fp32 MT test afterwards)
        s1 = out[:, 0 * CHUNK:1 * CHUNK]
        s2 = out[:, 1 * CHUNK:2 * CHUNK]
        num = out[:, 2 * CHUNK:3 * CHUNK]
        nd = out[:, 3 * CHUNK:4 * CHUNK]
        s0 = nd - s1 - s2
        i0 = s0.view(jnp.int32)
        i1 = s1.view(jnp.int32)
        i2 = s2.view(jnp.int32)
        inside = ((i0 ^ i1) | (i0 ^ i2)) >= 0
        # approx reciprocal (~12-bit) is fine: t is quantized to 10 lane
        # bits below anyway and the caller re-derives the winner's exact t
        t = num * pl.reciprocal(nd, approx=True)
        tb = jnp.where(box_hit, t_best, -F32_MAX)
        hit = inside & (t > 1e-4) & (t < tb[:, None])
        lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        key = (t.view(jnp.int32) & jnp.int32(~LANE_MASK)) | lane
        BIG = jnp.int32(0x7F7FFFFF)
        kmin = jnp.min(jnp.where(hit, key, BIG), axis=1)
        upd = kmin < BIG
        t_new = (kmin & jnp.int32(~LANE_MASK)).view(jnp.float32)
        k = kmin & jnp.int32(LANE_MASK)
        # any-hit lanes park at t=-1 on their first accepted hit:
        # box_hit needs t_best>0, so the lane goes dead for every later
        # chunk of its tile (IntersectP semantics, scene.h:59)
        t_new = jnp.where(anyhit, -1.0, t_new)
        t_ref[0, 0, :] = jnp.where(upd, t_new, t_best)
        prim_ref[0, 0, :] = jnp.where(upd, c.astype(jnp.int32) * CHUNK + k,
                                      prim_ref[0, 0, :])


def _kernel_loop(cl_ref, na_ref, nl_ref, r16_ref, tmax_ref, w_hbm, cb_ref,
                 t_ref, prim_ref, wbuf, sems, *, resident):
    """Chunk-loop kernel: ONE grid step per ray tile; the tile's active
    chunks (front-to-back) are visited in GROUPS of PICK chunks by an
    in-kernel while_loop with FRONT-TO-BACK EARLY EXIT: group j's
    near_list value lower-bounds every lane's slab entry t for this and
    all later groups (sorted), so once max-lane t_best <= that bound no
    remaining chunk can improve any lane and the loop stops (the
    reference's ordered traversal + shrinking tMax, bvh.cpp:662-700,
    recovered at tile granularity).  The PICK chunks of a group are
    independently chosen fine chunks — same MXU/epilogue width per
    iteration as one fat chunk, but far fewer triangles tested per ray.

    resident=True keeps the whole W table in VMEM (small scenes), so the
    group assembly copies are VMEM->VMEM; resident=False streams W slabs
    from HBM.  Either way the picks double-buffer into one contiguous
    scratch operand.  The dot is UNCONDITIONAL: an ablation showed
    lax.cond costs ~2us/step on v5e — more than the dots it skips on
    bounce workloads — so per-ray culling happens only through the
    shrinking t_best in the epilogue mask.
    """
    del resident
    i = pl.program_id(0)
    ng = na_ref[i]                       # number of ACTIVE GROUPS
    r = r16_ref[0]                       # [T,16]
    # bf16x2 split once per tile: [r_hi | r_lo | r_hi] (see build_dense_tables)
    r_hi = r.astype(jnp.bfloat16)
    r_lo = (r - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    r48 = jnp.concatenate([r_hi, r_lo, r_hi], axis=1)
    anyhit = r[:, 12][None, :] > 0.5

    def entry(j, s):
        # fine-chunk list is PACKED two u16 ids per i32 word and stored
        # TRANSPOSED [words, n_tiles] (SMEM is 1MB on v5e; an unpacked
        # [n_tiles, C] list at 256-tri chunks pads past it); the list is
        # padded so group j's picks are always in range
        idx = j * PICK + s
        word = cl_ref[idx >> 1, i]
        return jax.lax.select((idx & 1) == 0, word & 0xFFFF,
                              (word >> 16) & 0xFFFF)

    def dma(slot, j, s):
        # each pick lands CONTIGUOUSLY at cols s*(4*CHUNK): a chunk's
        # four sections are adjacent in W, so the group assembles into
        # ONE [48, PICK*4*CHUNK] operand for a single MXU pass (PICK
        # separate small dots+epilogues measured ~1.7x SLOWER than one
        # wide dot — per-dot fixed costs dominate at N=1024)
        c = entry(j, s)
        return pltpu.make_async_copy(
            w_hbm.at[:, pl.ds(c * (4 * CHUNK), 4 * CHUNK)],
            wbuf.at[slot, :, pl.ds(s * (4 * CHUNK), 4 * CHUNK)],
            sems.at[slot, s])

    @pl.when(ng > 0)
    def _():
        for s in range(PICK):
            dma(0, 0, s).start()

    BIG = jnp.int32(0x7F7FFFFF)
    dn = (((1,), (0,)), ((), ()))

    def body(state):
        j, t_best, prim = state                  # t_best/prim [1,T]

        @pl.when(j + 1 < ng)
        def _():
            for s in range(PICK):
                dma((j + 1) % 2, j + 1, s).start()
        for s in range(PICK):
            dma(j % 2, j, s).wait()

        out = jax.lax.dot_general(r48, wbuf[j % 2], dn,
                                  preferred_element_type=jnp.float32)
        # out cols are pick-major: [pick][s1|s2|num|nd][lane].  The
        # cross-section arithmetic runs on the [T, PICK, 4, CHUNK] view
        # (pure elementwise — Mosaic handles minor-dims reshapes), then
        # collapses back to [T, PICK*CHUNK] so the t_best compare and the
        # min-reduce keep the proven 2D pattern.
        T = out.shape[0]
        o4 = out.reshape(T, PICK, 4, CHUNK)
        s1 = o4[:, :, 0, :]
        s2 = o4[:, :, 1, :]
        num = o4[:, :, 2, :]
        nd = o4[:, :, 3, :]
        s0 = nd - s1 - s2
        i0 = s0.view(jnp.int32)
        i1 = s1.view(jnp.int32)
        i2 = s2.view(jnp.int32)
        # reshape the INT32 view before the >= 0 compare: Mosaic cannot
        # lower a bool minor-dims shape cast ((T,PICK,CHUNK)i1 ->
        # (T,PICK*CHUNK)i1, "infer-vector-layout: unsupported shape
        # cast"), but the i32 reshape is a no-op relayout
        inside = ((i0 ^ i1) | (i0 ^ i2)).reshape(T, PICK * CHUNK) >= 0
        t = (num * pl.reciprocal(nd, approx=True)).reshape(T, PICK * CHUNK)
        # NOTE: no per-pick AABB slab test — with an unconditional dot the
        # acceptance below (t < t_best, t_best > 0) already implies every
        # predicate the slab test checked; t_best <= 0 parks shadow
        # winners and dead lanes
        tb = jnp.where(t_best > 0, t_best, -F32_MAX)    # [1,T]
        hit = inside & (t > 1e-4) & (t < tb[0][:, None])
        # the lane id IS the (pick, in-chunk lane) pair: cols are already
        # pick-major so a flat iota encodes pick*CHUNK + lane directly
        lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        key = (t.view(jnp.int32) & jnp.int32(~LANE_MASK)) | lane
        kmin = jnp.min(jnp.where(hit, key, BIG), axis=1)[None, :]
        upd = kmin < BIG
        t_new = (kmin & jnp.int32(~LANE_MASK)).view(jnp.float32)
        k = kmin & jnp.int32(LANE_MASK)
        t_new = jnp.where(anyhit, -1.0, t_new)
        # winner's fine chunk: the pick index rides in k's high bits
        if PICK == 1:
            c_win = entry(j, 0)
        else:
            s_win = k >> LANE_BITS_CHUNK
            c_win = jnp.full_like(k, entry(j, 0))
            for s in range(1, PICK):
                c_win = jnp.where(s_win == s, entry(j, s), c_win)
        return (j + 1,
                jnp.where(upd, t_new, t_best),
                jnp.where(upd, c_win * CHUNK + (k & (CHUNK - 1)), prim))

    def cond(state):
        # continue iff some lane could still be improved by group j:
        # near_list[i, j] lower-bounds every lane's entry t for this and
        # all later groups, so max-lane t_best <= bound ends the tile.
        # Shadow lanes park at t=-1 on first hit and dead lanes start at
        # tmax=-1, so both drop out of the max automatically.
        j, t_best, _ = state
        if not EARLY_EXIT:
            return j < ng
        # & is not short-circuit: when the loop runs out (j == ng) the
        # nl read would be out of bounds — clamp (the j<ng term already
        # kills the result there).  near_g is transposed [G, n_tiles].
        jc = jnp.minimum(j, nl_ref.shape[0] - 1)
        return (j < ng) & (jnp.max(t_best) > nl_ref[jc, i])

    t_init = tmax_ref[0]                 # [1,T]
    prim_init = jnp.full(t_init.shape, -1, jnp.int32)
    j_end, t_best, prim = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t_init, prim_init))
    # the body speculatively prefetches group j+1; on early exit those
    # copies (slot j_end%2) are still in flight — drain them so the
    # semaphore/scratch state is clean for the next grid step
    @pl.when(j_end < ng)
    def _():
        for s in range(PICK):
            dma(j_end % 2, j_end, s).wait()
    t_ref[0] = t_best
    prim_ref[0] = prim


# W tables up to this size stay VMEM-resident in the loop kernel (the
# whole table is ~97KB per 1024-tri chunk; 6MB = ~63k triangles)
VMEM_RESIDENT_BYTES = 6 * 1024 * 1024


@partial(jax.jit, static_argnames=("n_pad", "interpret"))
def dense_intersect_loop(r16, tmax, W, chunk_bounds, n_pad,
                         interpret=False):
    """Chunk-loop variant of dense_intersect (same contract).

    interpret=True runs the kernel under the Pallas TPU interpreter (any
    backend) — the CI path that keeps kernel semantics testable on the
    CPU suite (tests/test_dense_kernel.py); production never sets it.
    """
    B = r16.shape[0]
    Bp = ((B + RAY_TILE - 1) // RAY_TILE) * RAY_TILE
    if Bp != B:
        r16 = jnp.pad(r16, ((0, Bp - B), (0, 0)))
        tmax = jnp.pad(tmax, (0, Bp - B), constant_values=-1.0)
    n_tiles = Bp // RAY_TILE
    r16t = r16.reshape(n_tiles, RAY_TILE, 16)
    tmax_t = tmax.reshape(n_tiles, RAY_TILE)
    tmax2 = tmax.reshape(n_tiles, 1, RAY_TILE)
    chunk_list, n_active, near_list = _tile_chunk_lists(r16t, tmax_t,
                                                        chunk_bounds)
    # group the fine-chunk list into PICK-wide loop iterations: pad the
    # list length to a multiple of 2*PICK (repeating the last column — a
    # duplicated chunk can't double-count: t updates are strictly-less),
    # count ACTIVE GROUPS, and take each group's first (nearest) entry as
    # its early-exit lower bound.  The list is packed two u16 ids per i32
    # word and TRANSPOSED [words, n_tiles]: SMEM is 1MB and an unpacked
    # [n_tiles, C] layout pads its minor dim to 128-col multiples.
    C = chunk_list.shape[1]
    G = (C + PICK - 1) // PICK
    CP = G * PICK + (G * PICK) % 2
    if CP != C:
        chunk_list = jnp.concatenate(
            [chunk_list, jnp.repeat(chunk_list[:, -1:], CP - C, 1)], 1)
    cl_packed = (chunk_list[:, 0::2]
                 | (chunk_list[:, 1::2] << 16)).T  # [CP//2, n_tiles]
    n_groups = (n_active + PICK - 1) // PICK
    near_g = near_list[:, ::PICK]
    if near_g.shape[1] < G:
        near_g = jnp.concatenate(
            [near_g, jnp.full((n_tiles, G - near_g.shape[1]), F32_MAX)], 1)
    near_g = near_g.T                              # [G, n_tiles]
    resident = (W.size * 2) <= VMEM_RESIDENT_BYTES

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,             # chunk_list, n_groups, near_g
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, RAY_TILE, 16),
                         lambda i, cl, na, nl: (i, 0, 0)),
            pl.BlockSpec((1, 1, RAY_TILE),
                         lambda i, cl, na, nl: (i, 0, 0)),
            pl.BlockSpec(memory_space=(pltpu.VMEM if resident
                                       else pltpu.ANY)),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # chunk_bounds
        ],
        out_specs=[
            pl.BlockSpec((1, 1, RAY_TILE), lambda i, cl, na, nl: (i, 0, 0)),
            pl.BlockSpec((1, 1, RAY_TILE), lambda i, cl, na, nl: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 48, PICK * 4 * CHUNK), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, PICK)),
        ],
    )
    t_out, prim_out = pl.pallas_call(
        partial(_kernel_loop, resident=resident),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 1, RAY_TILE), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, RAY_TILE), jnp.int32),
        ],
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(cl_packed, n_groups, near_g, r16t, tmax2, W, chunk_bounds)
    return t_out.reshape(-1)[:B], prim_out.reshape(-1)[:B]


def _tile_chunk_lists(r16_t, tmax_t, chunk_bounds):
    """Per-ray-tile active-chunk lists for the scalar-prefetch grid.

    r16_t [n_tiles,T,16], tmax_t [n_tiles,T], chunk_bounds [C,8].
    Returns (chunk_list [n_tiles,C] int32, n_active [n_tiles] int32):
    active chunks first, sorted front-to-back by the tile's nearest AABB
    entry (shrinks t_best fastest), then the last active index repeated
    so inactive grid steps re-fetch nothing.
    """
    # slab test vectorized over chunks with the ray axis LAST
    # ([n_tiles, C, T], 512-lane minor dim) — a lax.map over chunks with
    # [.., T, 3] math re-read the whole ray table per chunk and ran
    # lane-3-shaped ops; this fuses into a few well-shaped passes
    ray_ok = tmax_t > 0
    tnear = jnp.full(tmax_t.shape[:1] + (chunk_bounds.shape[0],
                                         tmax_t.shape[1]), -F32_MAX)
    tfar = jnp.full_like(tnear, F32_MAX)
    for ax in range(3):
        da = r16_t[..., ax]
        inva = 1.0 / jnp.where(jnp.abs(da) > 1e-20, da, 1e-20)
        oca = r16_t[..., 6 + ax][:, None, :]        # [n_tiles, 1, T]
        inva = inva[:, None, :]
        lo = chunk_bounds[None, :, ax, None]        # [1, C, 1]
        hi = chunk_bounds[None, :, 4 + ax, None]
        t0 = (lo - oca) * inva
        t1 = (hi - oca) * inva
        tnear = jnp.maximum(tnear, jnp.minimum(t0, t1))
        tfar = jnp.minimum(tfar, jnp.maximum(t0, t1))
    hit = (tnear <= tfar * 1.0001 + 1e-5) & (tfar > 0) \
        & (tnear < tmax_t[:, None, :]) & ray_ok[:, None, :]
    hits = hit.any(-1)                              # [n_tiles, C]
    nears = jnp.min(jnp.where(hit, jnp.maximum(tnear, 0.0), F32_MAX), -1)
    C = chunk_bounds.shape[0]
    sort_key = jnp.where(hits, nears, F32_MAX)
    order = jnp.argsort(sort_key, axis=1).astype(jnp.int32)
    n_active = hits.sum(-1).astype(jnp.int32)
    ranks = jnp.arange(C, dtype=jnp.int32)[None, :]
    last = jnp.take_along_axis(
        order, jnp.maximum(n_active - 1, 0)[:, None], 1)
    chunk_list = jnp.where(ranks < n_active[:, None], order, last)
    # per-entry near lower bound (sorted ascending): entry j's value is a
    # lower bound on EVERY lane's slab entry t for chunk_list[:, j] and,
    # by the sort, for all later entries too — the kernel's front-to-back
    # early exit compares max-lane t_best against it.  Inactive entries
    # read F32_MAX so the loop condition fails there regardless of na.
    near_list = jnp.take_along_axis(sort_key, order, 1)
    return chunk_list, n_active, near_list


def _work_queue(chunk_list, n_active, n_tiles, n_chunks):
    """Flatten per-tile active-chunk lists into one sparse work list.

    Returns (wq_tile, wq_chunk, wq_flag) each [S+1] int32 with
    S = n_tiles * n_chunks, tile-major (so each output block is visited in
    one contiguous run), front-to-back within a tile.  Entries past the
    total active count are padding: tile = n_tiles-1 and a constant chunk,
    so consecutive padding steps revisit the same blocks and Mosaic elides
    their copies; flag = 0 marks them dead for the kernel.
    """
    S = n_tiles * n_chunks
    ranks = jnp.arange(n_chunks, dtype=jnp.int32)[None, :]
    valid = ranks < n_active[:, None]
    offsets = jnp.cumsum(n_active) - n_active           # exclusive prefix
    pos = offsets[:, None] + ranks                      # [n_tiles, C]
    flat_pos = jnp.where(valid, pos, S).ravel()         # invalid -> slot S
    tile_ids = jnp.broadcast_to(
        jnp.arange(n_tiles, dtype=jnp.int32)[:, None], valid.shape)
    pad_chunk = chunk_list[-1, 0]
    wq_tile = jnp.full((S + 1,), n_tiles - 1, jnp.int32) \
        .at[flat_pos].set(tile_ids.ravel(), mode="drop")
    wq_chunk = jnp.broadcast_to(pad_chunk, (S + 1,)).astype(jnp.int32) \
        .at[flat_pos].set(chunk_list.ravel(), mode="drop")
    flags = jnp.where(ranks == 0, 2, 1).astype(jnp.int32)
    flags = jnp.broadcast_to(flags, valid.shape)
    wq_flag = jnp.zeros((S + 1,), jnp.int32) \
        .at[flat_pos].set(flags.ravel(), mode="drop")
    return wq_tile, wq_chunk, wq_flag


def _queue_caps(S):
    """Static grid-size buckets: smallest eighth of the dense step count
    that covers the runtime queue length (each compiles one kernel —
    same body, different grid — so finer buckets trade compile time for
    less padding; padding steps still cost the per-step floor)."""
    caps = []
    for k in range(1, 9):
        cap = max((S * k + 7) // 8, 1)
        if not caps or cap > caps[-1]:
            caps.append(cap)
    return caps


@partial(jax.jit, static_argnames=("n_pad", "interpret"))
def dense_intersect(r16, tmax, W, chunk_bounds, n_pad, interpret=False):
    """r16 [B,16], tmax [B]; W [48,4*Pp] bf16 stacked, chunk_bounds [C,8].

    Returns (t [B], prim [B]) with prim=-1 for misses.
    interpret=True: Pallas TPU interpreter (CI path, any backend).
    """
    B = r16.shape[0]
    Bp = ((B + RAY_TILE - 1) // RAY_TILE) * RAY_TILE
    if Bp != B:
        r16 = jnp.pad(r16, ((0, Bp - B), (0, 0)))
        tmax = jnp.pad(tmax, (0, Bp - B), constant_values=-1.0)
    n_tiles = Bp // RAY_TILE
    n_chunks = n_pad // CHUNK
    r16 = r16.reshape(n_tiles, RAY_TILE, 16)
    tmax_t = tmax.reshape(n_tiles, RAY_TILE)
    tmax2 = tmax.reshape(n_tiles, 1, RAY_TILE)
    chunk_list, n_active, _ = _tile_chunk_lists(r16, tmax_t, chunk_bounds)
    wq_tile, wq_chunk, wq_flag = _work_queue(chunk_list, n_active,
                                             n_tiles, n_chunks)
    total = jnp.sum(n_active)

    def make_branch(cap):
        def branch():
            wt = jax.lax.slice(wq_tile, (0,), (cap,))
            wc = jax.lax.slice(wq_chunk, (0,), (cap,))
            wf = jax.lax.slice(wq_flag, (0,), (cap,))
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,         # wq_tile, wq_chunk, wq_flag
                grid=(cap,),
                in_specs=[
                    pl.BlockSpec((1, RAY_TILE, 16),
                                 lambda k, wt, wc, wf: (wt[k], 0, 0)),
                    pl.BlockSpec((1, 1, RAY_TILE),
                                 lambda k, wt, wc, wf: (wt[k], 0, 0)),
                    pl.BlockSpec((48, 4 * CHUNK),
                                 lambda k, wt, wc, wf: (0, wc[k])),
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # chunk_bounds
                ],
                out_specs=[
                    pl.BlockSpec((1, 1, RAY_TILE),
                                 lambda k, wt, wc, wf: (wt[k], 0, 0)),
                    pl.BlockSpec((1, 1, RAY_TILE),
                                 lambda k, wt, wc, wf: (wt[k], 0, 0)),
                ],
            )
            return pl.pallas_call(
                _kernel,
                grid_spec=grid_spec,
                out_shape=[
                    jax.ShapeDtypeStruct((n_tiles, 1, RAY_TILE), jnp.float32),
                    jax.ShapeDtypeStruct((n_tiles, 1, RAY_TILE), jnp.int32),
                ],
                interpret=(pltpu.InterpretParams() if interpret else False),
            )(wt, wc, wf, r16, tmax2, W, chunk_bounds)
        return branch

    caps = _queue_caps(n_tiles * n_chunks)
    if len(caps) == 1:
        t_out, prim_out = make_branch(caps[0])()
    else:
        which = sum((total > cap).astype(jnp.int32) for cap in caps[:-1])
        t_out, prim_out = jax.lax.switch(
            which, [make_branch(cap) for cap in caps])
    # tiles with an empty queue never reach the kernel: their outputs are
    # whatever the flush left there — overwrite with the miss result
    untouched = (n_active == 0)[:, None, None]
    t_out = jnp.where(untouched, tmax2, t_out)
    prim_out = jnp.where(untouched, -1, prim_out)
    return t_out.reshape(-1)[:B], prim_out.reshape(-1)[:B]
