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
# ray tiles processed per grid step: the per-grid-step floor measured
# ~7us on v5e (block DMA latencies + step bookkeeping) — far more than a
# camera tile's ~1 group of real work — so each step loops over TPG
# tiles in-kernel and the floor amortizes TPG-fold
TPG = int(_os.environ.get("PBRT_TPU_TPG", "4"))


# ---------------------------------------------------------------------------
# host precompute
# ---------------------------------------------------------------------------

def build_dense_tables(v0, e1, e2):
    """Per-triangle Pluecker/plane tables + per-chunk AABBs.

    v0,e1,e2: [P,3] float arrays (BVH-leaf order, so chunks are spatially
    tight).  Returns dict with W [4, 48, Pp] bf16 SECTION-MAJOR
    (s1|s2|num|nd planes, rows = [w_hi; w_hi; w_lo]), chunk_bounds [C,8],
    center [3], n_pad.  Section-major means the kernel assembles its dot
    operand with sections CONTIGUOUS in the lane axis, so the epilogue
    slices the dot output with free contiguous slices — the previous
    chunk-interleaved layout forced lane-strided section extraction that
    made the VPU epilogue ~4x more expensive than its op count.
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

    # bf16x2 split, pre-stacked for a SINGLE K=48 MXU pass per group:
    #   [r_hi | r_lo | r_hi] @ [w_hi ; w_hi ; w_lo]
    #     = r_hi@w_hi + r_lo@w_hi + r_hi@w_lo  (~f32 accuracy)
    # One dot instead of three means `out` is written once, K rises from
    # 16 to 48 of the MXU's 128 contraction rows, and Mosaic never
    # materializes the two partial accumulations.  Sections stay in
    # SEPARATE planes ([4, 48, Pp]); the kernel DMAs each (section, pick)
    # slab to a section-contiguous spot of its dot operand.
    import jax.numpy as _jnp
    w_hi = np.asarray(np.asarray(Wsep, np.float32).astype(_jnp.bfloat16))
    w_lo = np.asarray((Wsep - w_hi.astype(np.float32)).astype(_jnp.bfloat16))
    W2 = np.concatenate([w_hi, w_hi, w_lo], 1)     # [4, 48, Pp] bf16

    # chunk AABBs in centered coordinates (8-wide rows for clean VMEM tiles)
    C = Pp // CHUNK
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

def _kernel_loop(cl_ref, na_ref, nl_ref, r48_ref, meta_ref, w_hbm, cb_ref,
                 t_ref, prim_ref, wbuf, sems, *, resident):
    """Chunk-loop kernel: one grid step covers TPG ray tiles (a
    fori_loop over sub-tiles — the ~7us-per-grid-step floor measured on
    v5e amortizes TPG-fold).  Each tile's active chunks (front-to-back)
    are visited in GROUPS of PICK chunks by an in-kernel while_loop with
    FRONT-TO-BACK EARLY EXIT: group j's near_list value lower-bounds
    every lane's slab entry t for this and all later groups (sorted), so
    once max-lane t_best <= that bound no remaining chunk can improve
    any lane and the loop stops (the reference's ordered traversal +
    shrinking tMax, bvh.cpp:662-700, recovered at tile granularity).
    The PICK chunks of a group are independently chosen fine chunks —
    same MXU/epilogue width per iteration as one fat chunk, but far
    fewer triangles tested per ray.

    resident=True keeps the whole W table in VMEM (small scenes), so the
    group assembly copies are VMEM->VMEM; resident=False streams W slabs
    from HBM.  Either way the picks double-buffer into one contiguous
    scratch operand.  The dot is UNCONDITIONAL: an ablation showed
    lax.cond costs ~2us/step on v5e — more than the dots it skips on
    bounce workloads — so per-ray culling happens only through the
    shrinking t_best in the epilogue mask.
    """
    del resident
    tpg = r48_ref.shape[0]
    T = r48_ref.shape[1]
    PC = PICK * CHUNK
    # hoisted out of all loops: the flat lane iota (pick*CHUNK+lane)
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, PC), 1)
    BIG = jnp.int32(0x7F7FFFFF)
    dn = (((1,), (0,)), ((), ()))

    def tile_body(tt, carry):
        i = pl.program_id(0) * tpg + tt      # global tile id
        ng = na_ref[i]                       # number of ACTIVE GROUPS
        # r48 ([T,48] bf16 = [r_hi | r_lo | r_hi]) is PREASSEMBLED by the
        # caller — building it in-kernel cost ~7us/tile in bf16 concat
        # relayouts, dwarfing the actual per-group work
        r48 = r48_ref[tt]
        anyhit = meta_ref[tt, 1:2] > 0.5     # [1,T]

        def entry(j, s):
            # fine-chunk list is PACKED two u16 ids per i32 word and
            # stored TRANSPOSED [words, n_tiles] (SMEM is 1MB on v5e; an
            # unpacked [n_tiles, C] list at 256-tri chunks pads past it);
            # the list is padded so group j's picks are always in range
            idx = j * PICK + s
            word = cl_ref[idx >> 1, i]
            return jax.lax.select((idx & 1) == 0, word & 0xFFFF,
                                  (word >> 16) & 0xFFFF)

        def dma(slot, j, s, sec):
            # W is section-major [4, 48, Pp]; each (section, pick) slab
            # lands at cols sec*PC + s*CHUNK, so the assembled operand's
            # dot output has the four sections CONTIGUOUS — the epilogue
            # slices them for free (the old chunk-interleaved layout
            # needed lane-strided extraction that tripled the VPU cost)
            c = entry(j, s)
            return pltpu.make_async_copy(
                w_hbm.at[sec, :, pl.ds(c * CHUNK, CHUNK)],
                wbuf.at[slot, :, pl.ds(sec * PC + s * CHUNK, CHUNK)],
                sems.at[slot, sec * PICK + s])

        def dma_all(slot, j):
            return [dma(slot, j, s, sec)
                    for sec in range(4) for s in range(PICK)]

        @pl.when(ng > 0)
        def _():
            for cp in dma_all(0, 0):
                cp.start()

        def body(state):
            j, t_best, prim = state              # t_best/prim [1,T]

            @pl.when(j + 1 < ng)
            def _():
                for cp in dma_all((j + 1) % 2, j + 1):
                    cp.start()
            for cp in dma_all(j % 2, j):
                cp.wait()

            out = jax.lax.dot_general(r48, wbuf[j % 2], dn,
                                      preferred_element_type=jnp.float32)
            # out cols are section-major: [s1|s2|num|nd][pick][lane] —
            # each section is ONE contiguous [T, PC] slice (no relayout)
            s1 = out[:, 0 * PC:1 * PC]
            s2 = out[:, 1 * PC:2 * PC]
            num = out[:, 2 * PC:3 * PC]
            nd = out[:, 3 * PC:4 * PC]
            s0 = nd - s1 - s2
            i0 = s0.view(jnp.int32)
            i1 = s1.view(jnp.int32)
            i2 = s2.view(jnp.int32)
            inside = ((i0 ^ i1) | (i0 ^ i2)) >= 0
            t = num * pl.reciprocal(nd, approx=True)
            # NOTE: no per-pick AABB slab test — with an unconditional
            # dot the acceptance below (t < t_best, t_best > 0) already
            # implies every predicate the slab test checked; t_best <= 0
            # parks shadow winners and dead lanes
            tb = jnp.where(t_best > 0, t_best, -F32_MAX)    # [1,T]
            hit = inside & (t > 1e-4) & (t < tb[0][:, None])
            # the lane id IS the (pick, in-chunk lane) pair (columns are
            # pick-major within a section)
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
            # near_list[j, i] lower-bounds every lane's entry t for this
            # and all later groups, so max-lane t_best <= bound ends the
            # tile.  Shadow lanes park at t=-1 on first hit and dead
            # lanes start at tmax=-1, so both drop out of the max.
            j, t_best, _ = state
            if not EARLY_EXIT:
                return j < ng
            # & is not short-circuit: when the loop runs out (j == ng)
            # the nl read would be out of bounds — clamp (the j<ng term
            # already kills the result there)
            jc = jnp.minimum(j, nl_ref.shape[0] - 1)
            return (j < ng) & (jnp.max(t_best) > nl_ref[jc, i])

        t_init = meta_ref[tt, 0:1]           # [1,T]
        prim_init = jnp.full(t_init.shape, -1, jnp.int32)
        j_end, t_best, prim = jax.lax.while_loop(
            cond, body, (jnp.int32(0), t_init, prim_init))
        # the body speculatively prefetches group j+1; on early exit
        # those copies (slot j_end%2) are still in flight — drain them so
        # the semaphore/scratch state is clean for the next sub-tile
        @pl.when(j_end < ng)
        def _():
            for cp in dma_all(j_end % 2, j_end):
                cp.wait()
        t_ref[tt] = t_best
        prim_ref[tt] = prim
        return carry

    # static unroll: a lax.fori_loop here adds per-iteration Mosaic loop
    # overhead on top of the while_loop's — measured as a ~7us/sub-tile
    # floor at ng=0
    for tt in range(tpg):
        tile_body(tt, 0)


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
    # pad to a whole number of GRID STEPS (TPG tiles each); padded tiles
    # carry tmax=-1 so their na=0 and the sub-tile loop writes misses
    step_rays = RAY_TILE * TPG
    Bp = ((B + step_rays - 1) // step_rays) * step_rays
    if Bp != B:
        r16 = jnp.pad(r16, ((0, Bp - B), (0, 0)))
        tmax = jnp.pad(tmax, (0, Bp - B), constant_values=-1.0)
    n_tiles = Bp // RAY_TILE
    r16t = r16.reshape(n_tiles, RAY_TILE, 16)
    tmax_t = tmax.reshape(n_tiles, RAY_TILE)
    # preassembled bf16x2 dot operand [r_hi | r_lo | r_hi] (one fused
    # XLA pass; building it per-tile in-kernel measured ~7us/tile)
    r_hi = r16.astype(jnp.bfloat16)
    r_lo = (r16 - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    r48t = jnp.concatenate([r_hi, r_lo, r_hi], -1) \
        .reshape(n_tiles, RAY_TILE, 48)
    # meta rows: 0 = per-ray tmax (dead lanes < 0), 1 = anyhit flag
    meta = jnp.stack([tmax_t, r16t[:, :, 12]], 1)   # [n_tiles, 2, T]
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
        grid=(n_tiles // TPG,),
        in_specs=[
            pl.BlockSpec((TPG, RAY_TILE, 48),
                         lambda i, cl, na, nl: (i, 0, 0)),
            pl.BlockSpec((TPG, 2, RAY_TILE),
                         lambda i, cl, na, nl: (i, 0, 0)),
            pl.BlockSpec(memory_space=(pltpu.VMEM if resident
                                       else pltpu.ANY)),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # chunk_bounds
        ],
        out_specs=[
            pl.BlockSpec((TPG, 1, RAY_TILE),
                         lambda i, cl, na, nl: (i, 0, 0)),
            pl.BlockSpec((TPG, 1, RAY_TILE),
                         lambda i, cl, na, nl: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 48, PICK * 4 * CHUNK), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 4 * PICK)),
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
    )(cl_packed, n_groups, near_g, r48t, meta, W, chunk_bounds)
    return t_out.reshape(-1)[:B], prim_out.reshape(-1)[:B]


def _tile_chunk_lists(r16_t, tmax_t, chunk_bounds):
    """Per-ray-tile active-chunk lists for the scalar-prefetch grid.

    r16_t [n_tiles,T,16], tmax_t [n_tiles,T], chunk_bounds [C,8].
    Returns (chunk_list [n_tiles,C] int32, n_active [n_tiles] int32):
    active chunks first, sorted front-to-back by the tile's nearest AABB
    entry (shrinks t_best fastest), then the last active index repeated
    so inactive grid steps re-fetch nothing.
    """
    # slab test with the ray axis LAST and the CHUNK axis SCANNED in
    # blocks: one [n_tiles, C, T] pass materializes ~6 x 135MB
    # intermediates to HBM (measured 7ms/call on killeroo — half the
    # intersect cost); a lax.scan over 16-chunk blocks keeps each step's
    # [n_tiles, 16, T] intermediates fused in-register and writes only
    # the [n_tiles, 16] reductions
    ray_ok = tmax_t > 0
    C = chunk_bounds.shape[0]
    CB = 16
    Cp = ((C + CB - 1) // CB) * CB
    cbp = jnp.pad(chunk_bounds, ((0, Cp - C), (0, 0)))
    oc = r16_t[..., 6:9]                            # [n_tiles, T, 3]
    da = r16_t[..., 0:3]
    inv = 1.0 / jnp.where(jnp.abs(da) > 1e-20, da, 1e-20)

    def step(_, cb_blk):                            # cb_blk [CB, 8]
        tnear = jnp.full(tmax_t.shape[:1] + (CB, tmax_t.shape[1]),
                         -F32_MAX)
        tfar = jnp.full_like(tnear, F32_MAX)
        for ax in range(3):
            oca = oc[..., ax][:, None, :]           # [n_tiles, 1, T]
            inva = inv[..., ax][:, None, :]
            lo = cb_blk[None, :, ax, None]          # [1, CB, 1]
            hi = cb_blk[None, :, 4 + ax, None]
            t0 = (lo - oca) * inva
            t1 = (hi - oca) * inva
            tnear = jnp.maximum(tnear, jnp.minimum(t0, t1))
            tfar = jnp.minimum(tfar, jnp.maximum(t0, t1))
        hit = (tnear <= tfar * 1.0001 + 1e-5) & (tfar > 0) \
            & (tnear < tmax_t[:, None, :]) & ray_ok[:, None, :]
        hits_b = hit.any(-1)                        # [n_tiles, CB]
        nears_b = jnp.min(jnp.where(hit, jnp.maximum(tnear, 0.0),
                                    F32_MAX), -1)
        return None, (hits_b, nears_b)

    _, (hits_s, nears_s) = jax.lax.scan(
        step, None, cbp.reshape(Cp // CB, CB, 8))
    hits = jnp.moveaxis(hits_s, 0, 1).reshape(-1, Cp)[:, :C]
    nears = jnp.moveaxis(nears_s, 0, 1).reshape(-1, Cp)[:, :C]
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
