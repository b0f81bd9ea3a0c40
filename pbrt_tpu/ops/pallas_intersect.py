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
# tris per chunk / chunks per loop iteration, for SMALL scenes.  The
# r4.3 sweep (docs/KERNEL_LOG.md) showed 16x128 (8192-wide groups of
# fine chunks) beats 4x256 by ~9% on killeroo and ~1% on cornell:
# finer chunks cull better and the wide group amortizes the per-group
# fixed cost.  Large scenes must coarsen the chunk so the per-tile
# chunk list stays inside SMEM — build_dense_tables picks the actual
# (chunk, pick) per scene, keeping pick*chunk = CHUNK*PICK.
CHUNK = int(_os.environ.get("PBRT_TPU_CHUNK", "128"))
PICK = int(_os.environ.get("PBRT_TPU_PICK", str(max(1, 2048 // CHUNK))))
# scenes with more than this many chunks coarsen CHUNK (packed chunk
# list is [C/2, n_tiles] i32 in SMEM; 576 keeps it ~590KB at 512 tiles)
MAX_CHUNKS = int(_os.environ.get("PBRT_TPU_MAX_CHUNKS", "576"))
# NOTE(perf, measured on v5e): finer culling only pays when the loop
# machinery still amortizes over a full-width step.  Two earlier
# variants LOST: (a) four GATED 256-tri sub-dots per chunk (lax.cond
# serialization), (b) one dot gated by the OR of four sub-chunk slab
# tests (4x the [T,3]-shaped slab math).  The PICK design wins instead:
# each iteration runs PICK unconditional 4*CHUNK-wide dots+epilogues on
# independently CHOSEN fine chunks — same per-iteration width and one
# early-exit/DMA-wait, but each ray tests far fewer irrelevant tris.
F32_MAX = 3.4e38     # python float: jnp scalars would be captured kernel consts
# ablation knob: the front-to-back early exit in the loop kernel.
# DEFAULT OFF (r4.2 A/B, docs/KERNEL_LOG.md): with the chunk-major DMA
# and finer-morton tiles the per-group exit machinery (cross-lane max +
# conditional prefetch drain/restart) costs more than the groups it
# skips on both bench scenes (killeroo 63.1->61.7ms, cornell
# 31.1->30.6ms); the queue's near-sorted order still shrinks t_best
# fastest so the epilogue's t<t_best mask does the real culling.
EARLY_EXIT = _os.environ.get("PBRT_TPU_EARLY_EXIT", "0") != "0"
# ray tiles processed per grid step: the per-grid-step floor measured
# ~7us on v5e (block DMA latencies + step bookkeeping) — far more than a
# camera tile's ~1 group of real work — so each step loops over TPG
# tiles in-kernel and the floor amortizes TPG-fold
TPG = int(_os.environ.get("PBRT_TPU_TPG", "4"))


# ---------------------------------------------------------------------------
# host precompute
# ---------------------------------------------------------------------------

def pick_chunking(P):
    """Per-scene (chunk, pick): finest chunk whose count fits SMEM,
    pick sized to keep the group width CHUNK*PICK triangles."""
    chunk = CHUNK
    while max(P, 1) > MAX_CHUNKS * chunk:
        chunk *= 2
    return chunk, max(1, (CHUNK * PICK) // chunk)


def _plucker_cols(v0, e1, e2, center):
    """The three Pluecker edge columns + the (unscaled) normal."""
    a0, b0 = v0 - center, v0 + e1 - center
    a1, b1 = b0, v0 + e2 - center
    a2, b2 = b1, a0
    n = np.cross(e1, e2)                           # = unscaled nd column
    cols = [np.concatenate([np.cross(a, b), b - a], -1)
            for a, b in [(a0, b0), (a1, b1), (a2, b2)]]
    return cols, n


def _plucker_scale(v0, e1, e2, center):
    """Common per-tri scale: largest magnitude across the 3 edge columns
    and the normal (keeps everything in healthy f32/bf16 range; signs
    and the s0+s1+s2=nd identity are scale-invariant)."""
    cols, n = _plucker_cols(v0, e1, e2, center)
    mag = np.maximum.reduce([np.abs(c).max(-1) for c in cols])
    return np.maximum(mag, np.abs(n).max(-1)) + 1e-30


def _plucker_sections(v0, e1, e2, center, inv):
    """[4,16,P] section table rows (s1|s2|num|s0) for one geometry
    snapshot, at a FIXED per-tri scale `inv` [P,1] — shared scaling is
    what lets the motion variant fit time polynomials through multiple
    snapshots of the same triangle."""
    P = v0.shape[0]
    cols, n = _plucker_cols(v0, e1, e2, center)
    W = np.zeros((4, 16, P), np.float64)
    nn = n * inv
    for s, col in enumerate(cols[1:]):             # store s1, s2 only
        col = col * inv
        W[s, 0:3] = col[:, :3].T
        W[s, 3:6] = col[:, 3:].T
    # "num" section: r lane 15 is the constant 1, so the matmul
    # computes  nv0 - n.(o-c)  directly; t = num / nd
    W[2, 6:9] = -nn.T
    W[2, 15] = (nn * (v0 - center)).sum(-1)
    c0 = cols[0] * inv                # s0 stored; nd derived in-kernel
    W[3, 0:3] = c0[:, :3].T
    W[3, 3:6] = c0[:, 3:].T
    return W


def _bf16x2_chunk_major(Wsep, Pp, chunk):
    """bf16x2 split + chunk-major layout: [4,16,Pp] f32-ish ->
    [C, 48, 4*chunk] bf16 rows [w_hi; w_hi; w_lo]."""
    import jax.numpy as _jnp
    w_hi = np.asarray(np.asarray(Wsep, np.float32).astype(_jnp.bfloat16))
    w_lo = np.asarray((np.asarray(Wsep, np.float32)
                       - w_hi.astype(np.float32)).astype(_jnp.bfloat16))
    W2 = np.concatenate([w_hi, w_hi, w_lo], 1)     # [4, 48, Pp] bf16
    C = Pp // chunk
    return np.ascontiguousarray(
        W2.reshape(4, 48, C, chunk).transpose(2, 1, 0, 3)
        .reshape(C, 48, 4 * chunk))


def build_dense_tables(v0, e1, e2, chunk=None):
    """Per-triangle Pluecker/plane tables + per-chunk AABBs.

    v0,e1,e2: [P,3] float arrays (BVH-leaf order, so chunks are spatially
    tight).  Returns dict with W [C, 48, 4*CHUNK] bf16 CHUNK-MAJOR
    (per chunk: s1|s2|num|s0 sections contiguous, rows =
    [w_hi; w_hi; w_lo]), chunk_bounds [C,8], center [3], n_pad.
    Chunk-major means one DMA per pick moves a whole chunk into the dot
    operand (4x fewer DMA issues than the section-major layout) while
    the epilogue still slices each pick's sections contiguously.
    """
    v0 = np.asarray(v0, np.float64)
    e1 = np.asarray(e1, np.float64)
    e2 = np.asarray(e2, np.float64)
    P = v0.shape[0]
    if chunk is None:
        chunk, _ = pick_chunking(P)
    Pp = max(((P + chunk - 1) // chunk) * chunk, chunk)
    center = v0.mean(0) if P else np.zeros(3)

    # 4 sections per tri: s1 | s2 | num | s0.  The plane denominator nd
    # is NOT stored: the three Pluecker edge forms of a triangle satisfy
    # s0+s1+s2 = nd after a per-triangle rescale, so the kernel derives
    # nd = s0+s1+s2 — one fifth less MXU output, VMEM traffic and table
    # DMA.  Derive the DENOMINATOR, never a sign quantity: an earlier
    # variant derived s0 = nd-s1-s2 and the bf16x2 rounding of nd/s1/s2
    # put an ABSOLUTE ~2^-17*mag error on s0, flipping the inside test's
    # sign for rays near edge 0 (found-agree fell to 0.9756 on the chip
    # smoke); stored sections only carry error RELATIVE to their own
    # magnitude, and nd's ~1e-5 relative error just perturbs t.  The
    # identity requires the three edge columns to share ONE common scale
    # per triangle (not per-edge max-normalization).
    Wsep = np.zeros((4, 16, Pp), np.float64)
    if P:
        mag = _plucker_scale(v0, e1, e2, center)
        inv = (1.0 / mag)[:, None]
        Wsep[:, :, :P] = _plucker_sections(v0, e1, e2, center, inv)

    # bf16x2 split, pre-stacked for a SINGLE K=48 MXU pass per group:
    #   [r_hi | r_lo | r_hi] @ [w_hi ; w_hi ; w_lo]
    #     = r_hi@w_hi + r_lo@w_hi + r_hi@w_lo  (~f32 accuracy)
    # One dot instead of three means `out` is written once, K rises from
    # 16 to 48 of the MXU's 128 contraction rows, and Mosaic never
    # materializes the two partial accumulations.  The table is stored
    # CHUNK-MAJOR [C, 48, 4*CHUNK]: one chunk's four sections
    # (s1|s2|num|s0, each CHUNK wide) are contiguous, so a group's PICK
    # chunks load with PICK DMAs instead of 4*PICK — on v5e the 16
    # per-group DMA issue/wait pairs of the section-major layout were a
    # measured ~2x overhead on the loop's critical path.  The epilogue
    # slices each pick's sections contiguously (see _kernel_loop).
    W2 = _bf16x2_chunk_major(Wsep, Pp, chunk)
    C = Pp // chunk

    # chunk AABBs in centered coordinates (8-wide rows for clean VMEM tiles)
    cb = np.zeros((C, 8), np.float32)
    cb[:, 0:3] = 1e30
    cb[:, 4:7] = -1e30
    if P:
        verts = np.stack([v0 - center, v0 + e1 - center,
                          v0 + e2 - center], 1)
        for c in range(C):
            s0, s1 = c * chunk, min((c + 1) * chunk, P)
            if s0 < P:
                vv = verts[s0:s1].reshape(-1, 3)
                cb[c, 0:3] = vv.min(0) - 1e-4
                cb[c, 4:7] = vv.max(0) + 1e-4
    return dict(W=W2, chunk_bounds=cb, chunk=chunk,
                center=center.astype(np.float32), n_pad=Pp)


# time nodes the motion tables are fitted through (cubic => 4 nodes,
# exact: every section entry is a polynomial of degree <= 3 in shutter
# time — edge Pluecker moments are quadratic, nv0 = n.(v0-c) is cubic)
_MOTION_NODES = np.array([0.0, 1.0 / 3.0, 2.0 / 3.0, 1.0])
N_COEF = 4


def build_dense_tables_motion(v0, e1, e2, dmotion, chunk=None):
    """Motion-blur variant of build_dense_tables (reference: the
    accelerator applying AnimatedTransform inside traversal,
    primitive.cpp:73-89).

    Vertices move linearly over the shutter: v0(t) = v0 + t*d0 etc.
    (scene/ir.py tri_motion [P,12] = d0|de1|de2|pad).  Every Pluecker
    section entry is then a cubic polynomial in t, so the table stores
    the 4 MONOMIAL COEFFICIENT planes (fitted exactly through 4 time
    nodes at one shared per-tri scale) and the kernel Horner-combines
    the 4 dot outputs with each ray's own time.  Layout:
    W [C, 48, N_COEF*4*chunk] chunk-major, coefficient-major inside a
    chunk ([coef][sec][lane]) so one DMA still moves a whole chunk.
    Chunk AABBs are expanded over the whole shutter (conservative cull
    at any ray time).
    """
    v0 = np.asarray(v0, np.float64)
    e1 = np.asarray(e1, np.float64)
    e2 = np.asarray(e2, np.float64)
    dm = np.asarray(dmotion, np.float64)
    P = v0.shape[0]
    if chunk is None:
        chunk, _ = pick_chunking(P)
    Pp = max(((P + chunk - 1) // chunk) * chunk, chunk)
    center = v0.mean(0) if P else np.zeros(3)
    C = Pp // chunk

    Wk = np.zeros((N_COEF, 4, 16, Pp), np.float64)
    if P:
        d0, de1, de2 = dm[:, 0:3], dm[:, 3:6], dm[:, 6:9]
        # one scale per tri across the whole shutter
        mag = None
        snaps = []
        for t in _MOTION_NODES:
            vt, e1t, e2t = v0 + t * d0, e1 + t * de1, e2 + t * de2
            snaps.append((vt, e1t, e2t))
            m = _plucker_scale(vt, e1t, e2t, center)
            mag = m if mag is None else np.maximum(mag, m)
        inv = (1.0 / mag)[:, None]
        Wn = np.stack([_plucker_sections(vt, e1t, e2t, center, inv)
                       for (vt, e1t, e2t) in snaps])      # [4nodes,4,16,P]
        # monomial coefficients: solve the 4x4 Vandermonde (exact for
        # cubics; f64 keeps the conditioning harmless)
        V = np.vander(_MOTION_NODES, N_COEF, increasing=True)  # [4,4]
        A = np.linalg.inv(V)                                   # [4,4]
        Wk[:, :, :, :P] = np.einsum('kn,nsrp->ksrp', A, Wn)

    W2 = np.stack([_bf16x2_chunk_major(Wk[k], Pp, chunk)
                   for k in range(N_COEF)], 2)  # [C,48,N_COEF,4*chunk]
    W2 = np.ascontiguousarray(W2.reshape(C, 48, N_COEF * 4 * chunk))

    # shutter-expanded chunk AABBs
    cb = np.zeros((C, 8), np.float32)
    cb[:, 0:3] = 1e30
    cb[:, 4:7] = -1e30
    if P:
        pts = []
        for t in (0.0, 1.0):
            vt = v0 + t * dm[:, 0:3]
            e1t = e1 + t * dm[:, 3:6]
            e2t = e2 + t * dm[:, 6:9]
            pts.append(np.stack([vt - center, vt + e1t - center,
                                 vt + e2t - center], 1))
        verts = np.concatenate(pts, 1)             # [P,6,3]
        for c in range(C):
            s0, s1 = c * chunk, min((c + 1) * chunk, P)
            if s0 < P:
                vv = verts[s0:s1].reshape(-1, 3)
                cb[c, 0:3] = vv.min(0) - 1e-4
                cb[c, 4:7] = vv.max(0) + 1e-4
    return dict(W=W2, chunk_bounds=cb, chunk=chunk,
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

def _kernel_loop(cl_ref, na_ref, nl_ref, nls_ref, r48_ref, meta_ref,
                 w_hbm, cb_ref, t_ref, prim_ref, wbuf, sems, *,
                 resident, chunk, pick, n_coef=1):
    """Chunk-loop kernel: one grid step covers TPG ray tiles via a
    SINGLE merged while_loop over flat (tile, group) work items —
    per-tile loop constructs measured a ~7-9us floor each on v5e, so
    tiles with one group of real work were paying 2x overhead; the
    merged loop pays it once per grid step.

    Each tile's active chunks (front-to-back) are visited in GROUPS of
    PICK chunks with FRONT-TO-BACK EARLY EXIT: group j's near_list value
    lower-bounds every lane's slab entry t for this and all later groups
    (sorted), so once max-lane t_best <= that bound no remaining chunk
    can improve any lane and the item index jumps to the next tile (the
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
    tpg = r48_ref.shape[0]
    T = r48_ref.shape[1]
    PC = pick * chunk
    CW = n_coef * 4 * chunk       # operand columns per (pick) chunk
    lane_bits = (PC - 1).bit_length()     # low t-mantissa bits = lane id
    lane_mask = (1 << lane_bits) - 1
    lane_bits_chunk = (chunk - 1).bit_length()
    base = pl.program_id(0) * tpg
    # hoisted out of the loop: the in-chunk lane iota (pick id is added
    # per pick in the epilogue)
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, chunk), 1)
    BIG = jnp.int32(0x7F7FFFFF)
    dn = (((1,), (0,)), ((), ()))


    # dead grid steps (no group in any of this step's tiles; the
    # coherence sort packs live lanes into a tile prefix, so
    # late-bounce batches are mostly dead steps) skip the whole
    # body: the index_map remap already elided their block DMAs,
    # and the launcher patches the unvisited tiles' outputs to the
    # miss result on the way out
    @pl.when(pl.program_id(0) < nls_ref[0])
    def _step():
        # initialize every sub-tile's outputs to the miss result; visited
        # tiles are overwritten at flush time
        t_ref[:] = meta_ref[:, 0:1]
        prim_ref[:] = jnp.full_like(prim_ref, -1)

        # exclusive prefix of per-tile group counts: item k belongs to tile
        # tt iff offs[tt] <= k < offs[tt+1]  (tile-major item order)
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
            # fine-chunk list is PACKED two u16 ids per i32 word and stored
            # TRANSPOSED [words, n_tiles] (SMEM is 1MB on v5e; an unpacked
            # [n_tiles, C] list at 256-tri chunks pads past it); the list is
            # padded so a group's picks are always in range
            tt = tt_of(k)
            j = k - sel_by_tt(tt, offs[:tpg])
            idx = j * pick + s
            word = cl_ref[idx >> 1, base + tt]
            return jax.lax.select((idx & 1) == 0, word & 0xFFFF,
                                  (word >> 16) & 0xFFFF)

        def dma(slot, k, s):
            # W is chunk-major [C, 48, 4*CHUNK]: ONE copy moves a pick's
            # whole chunk (all four sections contiguous) into its [48, 4C]
            # slot of the dot operand — PICK DMAs per group instead of
            # 4*PICK, and the epilogue still slices each pick's sections
            # contiguously
            c = entry(k, s)
            return pltpu.make_async_copy(
                w_hbm.at[c],
                wbuf.at[slot, :, pl.ds(s * CW, CW)],
                sems.at[slot, s])

        def dma_item(k):
            slot = k % 2
            return [dma(slot, k, s) for s in range(pick)]

        @pl.when(total > 0)
        def _():
            for cp in dma_item(jnp.int32(0)):
                cp.start()

        def body(state):
            k, tt_cur, t_best, prim = state          # t_best/prim [1,T]
            tt = tt_of(k)
            changed = tt != tt_cur

            # tile transition: flush the finished tile's results, reset the
            # carry from the new tile's tmax row
            @pl.when(changed)
            def _():
                t_ref[tt_cur] = t_best
                prim_ref[tt_cur] = prim
            t_best = jnp.where(changed, meta_ref[tt, 0:1], t_best)
            prim = jnp.where(changed, -1, prim)
            anyhit = meta_ref[tt, 1:2] > 0.5         # [1,T]

            # speculative prefetch of the next item (sequential case)
            @pl.when(k + 1 < total)
            def _():
                for cp in dma_item(k + 1):
                    cp.start()
            for cp in dma_item(k):
                cp.wait()

            r48 = r48_ref[tt]
            out = jax.lax.dot_general(r48, wbuf[k % 2], dn,
                                      preferred_element_type=jnp.float32)
            # out cols are pick-major: pick s occupies [s*4C, (s+1)*4C) with
            # its four sections (s1|s2|num|s0) contiguous inside — the
            # epilogue runs per pick on [T, CHUNK] slices (same total VPU op
            # count as one fused [T, PC] pass; Mosaic keeps each slice a
            # free contiguous view)
            tb = jnp.where(t_best > 0, t_best, -F32_MAX)    # [1,T]
            tbc = tb[0][:, None]
            if n_coef > 1:
                # per-ray shutter time for the Horner combine (meta row 2)
                tc = meta_ref[tt, 2][:, None]               # [T,1]

            def sec(s, j):
                cb0 = s * CW
                if n_coef == 1:
                    return out[:, cb0 + j * chunk:cb0 + (j + 1) * chunk]
                # coefficient planes are [coef][sec][lane] within the
                # chunk: Horner in the ray's time (cubic, exact — see
                # build_dense_tables_motion)
                acc = out[:, cb0 + (n_coef - 1) * 4 * chunk + j * chunk:
                          cb0 + (n_coef - 1) * 4 * chunk + (j + 1) * chunk]
                for kk_ in reversed(range(n_coef - 1)):
                    acc = acc * tc + out[:, cb0 + kk_ * 4 * chunk + j * chunk:
                                         cb0 + kk_ * 4 * chunk
                                         + (j + 1) * chunk]
                return acc

            kmin = None
            for s in range(pick):
                s1 = sec(s, 0)
                s2 = sec(s, 1)
                num = sec(s, 2)
                s0 = sec(s, 3)
                nd = s0 + s1 + s2          # derived denominator (see tables)
                i0 = s0.view(jnp.int32)
                i1 = s1.view(jnp.int32)
                i2 = s2.view(jnp.int32)
                inside = ((i0 ^ i1) | (i0 ^ i2)) >= 0
                # approx reciprocal is ~1e-3 on the VPU — one Newton step
                # recovers ~f32 (t also carries the lane-id quantization)
                rcp = pl.reciprocal(nd, approx=True)
                rcp = rcp * (2.0 - nd * rcp)
                t = num * rcp
                # NOTE: no per-pick AABB slab test — with an unconditional
                # dot the acceptance below (t < t_best, t_best > 0) already
                # implies every predicate the slab test checked; t_best <= 0
                # parks shadow winners and dead lanes
                hit = inside & (t > 1e-4) & (t < tbc)
                # the lane id IS the (pick, in-chunk lane) pair
                key = (t.view(jnp.int32) & jnp.int32(~lane_mask)) \
                    | (lane + s * chunk)
                km = jnp.min(jnp.where(hit, key, BIG), axis=1)
                kmin = km if kmin is None else jnp.minimum(kmin, km)
            kmin = kmin[None, :]
            upd = kmin < BIG
            t_new = (kmin & jnp.int32(~lane_mask)).view(jnp.float32)
            kk = kmin & jnp.int32(lane_mask)
            t_new = jnp.where(anyhit, -1.0, t_new)
            # winner's fine chunk: the pick index rides in kk's high bits
            if pick == 1:
                c_win = entry(k, 0)
            else:
                s_win = kk >> lane_bits_chunk
                c_win = jnp.full_like(kk, entry(k, 0))
                for s in range(1, pick):
                    c_win = jnp.where(s_win == s, entry(k, s), c_win)
            t_best = jnp.where(upd, t_new, t_best)
            prim = jnp.where(upd, c_win * chunk + (kk & (chunk - 1)), prim)

            # front-to-back early exit: the NEXT group's near bound lower-
            # bounds every later group of this tile; if no lane can improve,
            # jump k to the next tile's first item.  Shadow lanes park at
            # t=-1 on first hit and dead lanes start at tmax=-1, so both
            # drop out of the max automatically.
            if EARLY_EXIT:
                j1 = jnp.minimum(k - sel_by_tt(tt, offs[:tpg]) + 1,
                                 nl_ref.shape[0] - 1)
                done_tile = jnp.max(t_best) <= nl_ref[j1, base + tt]
                k_next = jax.lax.select(done_tile,
                                        sel_by_tt(tt, offs[1:]), k + 1)
            else:
                k_next = k + 1
            # the speculative prefetch targeted k+1; on a jump, drain it and
            # start the jump target instead (same semaphore slots)
            if EARLY_EXIT:
                jumped = k_next != k + 1

                @pl.when(jumped & (k + 1 < total))
                def _():
                    for cp in dma_item(k + 1):
                        cp.wait()

                @pl.when(jumped & (k_next < total))
                def _():
                    for cp in dma_item(k_next):
                        cp.start()
            return (k_next, tt, t_best, prim)

        def cond(state):
            return state[0] < total

        tt0 = tt_of(jnp.int32(0))
        state0 = (jnp.int32(0), tt0, meta_ref[tt0, 0:1],
                  jnp.full((1, T), -1, jnp.int32))
        k_end, tt_last, t_best, prim = jax.lax.while_loop(cond, body, state0)
        # flush the last visited tile (loop exits without a transition)
        @pl.when(total > 0)
        def _():
            t_ref[tt_last] = t_best
            prim_ref[tt_last] = prim


# W tables up to this size stay VMEM-resident in the loop kernel (the
# whole table is ~97KB per 1024-tri chunk; 6MB = ~63k triangles)
VMEM_RESIDENT_BYTES = 6 * 1024 * 1024

# scalar-prefetch budget for the loop kernel's per-tile chunk lists
# (SMEM is 1MB on v5e; leave headroom for Mosaic's own scalars).
# Batches whose lists exceed it split the tile axis across launches.
# 920KB keeps the bench's proven-fitting 768-tile killeroo batches
# single-launch (915KB measured) while the CLI's 1024+-tile passes
# split.
SMEM_BUDGET = int(_os.environ.get("PBRT_TPU_SMEM_BUDGET",
                                  str(920 * 1024)))


@partial(jax.jit, static_argnames=("n_pad", "interpret", "pick"))
def dense_intersect_loop(r16, tmax, W, chunk_bounds, n_pad,
                         interpret=False, pick=None,
                         time=None):
    """Chunk-loop variant of dense_intersect (same contract).

    interpret=True runs the kernel under the Pallas TPU interpreter (any
    backend) — the CI path that keeps kernel semantics testable on the
    CPU suite (tests/test_dense_kernel.py); production never sets it.
    """
    B = r16.shape[0]
    # the table's own layout is authoritative: W is [C, 48, 4*chunk]
    # (motion tables: [C, 48, N_COEF*4*chunk]); a mismatched explicit
    # chunk would DMA wrong-shaped slabs
    n_coef = N_COEF if time is not None else 1
    chunk = W.shape[2] // (4 * n_coef)
    if pick is None:
        pick = max(1, (CHUNK * PICK) // chunk)
        if n_coef > 1:
            # motion groups are N_COEF x wider per chunk; shrink pick so
            # the dot width (and VMEM scratch) stays in the static
            # kernel's envelope
            pick = max(1, pick // n_coef)
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
    # XLA pass; building it per-tile in-kernel measured ~7us/tile).
    # The hi/lo split is done by INTEGER MASKING, not converts: the TPU
    # toolchain compiles with --xla_allow_excess_precision=true, which
    # legally elides the bf16 round-trip in (x - f32(bf16(x))), making
    # r_lo ~ 0 and silently degrading the operand to single-bf16 — that
    # shipped as 50/2048 wrong closest hits on the round-3 chip smoke
    # (sign flips near edges + 1e-3 t error).  Masking the low 16
    # mantissa bits is exact, bf16-representable, and un-elidable.
    hi_f = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(r16, jnp.int32)
        & jnp.int32(-65536), jnp.float32)
    r_hi = hi_f.astype(jnp.bfloat16)
    r_lo = (r16 - hi_f).astype(jnp.bfloat16)
    r48t = jnp.concatenate([r_hi, r_lo, r_hi], -1) \
        .reshape(n_tiles, RAY_TILE, 48)
    # meta rows: 0 = per-ray tmax (dead lanes < 0), 1 = anyhit flag,
    # (motion only) 2 = per-ray shutter time
    meta_rows = [tmax_t, r16t[:, :, 12]]
    if time is not None:
        time_p = jnp.pad(time, (0, Bp - B)) if Bp != B else time
        meta_rows.append(time_p.reshape(n_tiles, RAY_TILE))
    meta = jnp.stack(meta_rows, 1)     # [n_tiles, 2(+1), T]
    chunk_list, n_active, near_list = _tile_chunk_lists(
        r16t, tmax_t, chunk_bounds, interpret=interpret)
    # group the fine-chunk list into PICK-wide loop iterations: pad the
    # list length to a multiple of 2*PICK (repeating the last column — a
    # duplicated chunk can't double-count: t updates are strictly-less),
    # count ACTIVE GROUPS, and take each group's first (nearest) entry as
    # its early-exit lower bound.  The list is packed two u16 ids per i32
    # word and TRANSPOSED [words, n_tiles]: SMEM is 1MB and an unpacked
    # [n_tiles, C] layout pads its minor dim to 128-col multiples.
    C = chunk_list.shape[1]
    G = (C + pick - 1) // pick
    CP = G * pick + (G * pick) % 2
    if CP != C:
        chunk_list = jnp.concatenate(
            [chunk_list, jnp.repeat(chunk_list[:, -1:], CP - C, 1)], 1)
    cl_packed = (chunk_list[:, 0::2]
                 | (chunk_list[:, 1::2] << 16)).T  # [CP//2, n_tiles]
    n_groups = (n_active + pick - 1) // pick
    near_g = near_list[:, ::pick]
    if near_g.shape[1] < G:
        near_g = jnp.concatenate(
            [near_g, jnp.full((n_tiles, G - near_g.shape[1]), F32_MAX)], 1)
    near_g = near_g.T                              # [G, n_tiles]
    resident = (W.size * 2) <= VMEM_RESIDENT_BYTES

    # the prefetched chunk lists live in SMEM (1MB on v5e) and scale
    # with n_tiles: (CP//2 + G + 1) i32 words per tile.  Large ray
    # batches (the CLI's 1<<18-pixel passes trace 3B rays = 1536 tiles)
    # overflow it, so split the TILE axis into multiple launches, each
    # within budget — caught end-to-end: killeroo-simple via
    # tools/pbrt.py failed AOT with 'Allocation would exceed memory
    # (space=smem)' while bench.py's 768-tile batches fit.
    per_tile_bytes = (cl_packed.shape[0] + near_g.shape[0] + 1) * 4
    max_tiles = max((SMEM_BUDGET // per_tile_bytes) // TPG, 1) * TPG

    def launch(cl_s, ng_s, nr_s, r48_s, meta_s):
        st = r48_s.shape[0]
        steps = st // TPG
        # live-step count: steps past the last one with any group are
        # DEAD (the coherence sort packs live lanes into a tile prefix,
        # so late-bounce batches are ~90% dead steps).  Their index_map
        # pins them to the last live block — Pallas elides a block copy
        # whose indices didn't change, so dead steps skip the ~7us
        # block-DMA floor — and the kernel body skips itself via
        # pl.when.  Unvisited tiles' outputs are patched to the miss
        # result below.
        step_work = jnp.sum(ng_s.reshape(steps, TPG), axis=1) > 0
        nls = jnp.max(jnp.where(
            step_work, jnp.arange(steps, dtype=jnp.int32) + 1, 0))
        nls_arr = nls[None]

        def remap(i, cl, na, nl, ns_):
            return (jnp.minimum(i, jnp.maximum(ns_[0] - 1, 0)), 0, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,   # chunk_list, n_groups, near_g, nls
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((TPG, RAY_TILE, 48), remap),
                pl.BlockSpec((TPG, meta.shape[1], RAY_TILE), remap),
                pl.BlockSpec(memory_space=(pltpu.VMEM if resident
                                           else pltpu.ANY)),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # chunk_bounds
            ],
            out_specs=[
                pl.BlockSpec((TPG, 1, RAY_TILE), remap),
                pl.BlockSpec((TPG, 1, RAY_TILE), remap),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 48, pick * n_coef * 4 * chunk),
                           jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2, pick)),
            ],
        )
        t_o, p_o = pl.pallas_call(
            partial(_kernel_loop, resident=resident, chunk=chunk,
                    pick=pick, n_coef=n_coef),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((st, 1, RAY_TILE), jnp.float32),
                jax.ShapeDtypeStruct((st, 1, RAY_TILE), jnp.int32),
            ],
            interpret=(pltpu.InterpretParams() if interpret else False),
        )(cl_s, ng_s, nr_s, nls_arr, r48_s, meta_s, W, chunk_bounds)
        # tiles at/after the first dead step were never visited: their
        # output blocks are unwritten — patch in the miss result
        tid = jax.lax.broadcasted_iota(jnp.int32, (st, 1, 1), 0)
        visited = tid < nls * TPG
        t_o = jnp.where(visited, t_o, meta_s[:, 0:1, :])
        p_o = jnp.where(visited, p_o, -1)
        return t_o, p_o

    if n_tiles <= max_tiles:
        t_out, prim_out = launch(cl_packed, n_groups, near_g, r48t, meta)
    else:
        n_launch = (n_tiles + max_tiles - 1) // max_tiles
        ntp = n_launch * max_tiles
        if ntp != n_tiles:        # pad with dead tiles (na=0, tmax=-1)
            cl_packed = jnp.pad(cl_packed, ((0, 0), (0, ntp - n_tiles)))
            n_groups = jnp.pad(n_groups, (0, ntp - n_tiles))
            near_g = jnp.pad(near_g, ((0, 0), (0, ntp - n_tiles)),
                             constant_values=F32_MAX)
            r48t = jnp.pad(r48t, ((0, ntp - n_tiles), (0, 0), (0, 0)))
            meta = jnp.pad(meta, ((0, ntp - n_tiles), (0, 0), (0, 0)),
                           constant_values=-1.0)
        touts, pouts = [], []
        for s in range(n_launch):
            sl = slice(s * max_tiles, (s + 1) * max_tiles)
            t_o, p_o = launch(cl_packed[:, sl], n_groups[sl],
                              near_g[:, sl], r48t[sl], meta[sl])
            touts.append(t_o)
            pouts.append(p_o)
        t_out = jnp.concatenate(touts, 0)[:n_tiles]
        prim_out = jnp.concatenate(pouts, 0)[:n_tiles]
    return t_out.reshape(-1)[:B], prim_out.reshape(-1)[:B]


def _queue_kernel(r16_ref, tmax_ref, cb_ref, hits_ref, nears_ref):
    """Per-(tile, chunk) slab cull, fully VMEM-resident.

    One grid step covers TPG tiles; each sub-tile computes the [Cp, T]
    slab test in straight-line VPU code and writes only the [Cp]
    reductions (any-ray-hits, min entry t).  The XLA formulations
    (one [tiles,C,T] pass, or a chunk-blocked lax.scan) materialized
    multi-MB intermediates to HBM — measured 5-7ms/call on killeroo vs
    the whole kernel's ~4ms; here the intermediates never leave VMEM.

    NOTE(r5): a PrefetchScalarGridSpec dead-step remap variant (like
    the loop kernel's) regressed Mosaic compile time from ~3 min to
    >9.5 min for the full pass — reverted; the in-kernel dead-tile
    skip below keeps dead steps cheap enough.
    """
    tpg = r16_ref.shape[0]
    Cp = cb_ref.shape[0]
    for tt in range(tpg):
        tm = tmax_ref[tt, 0:1]                      # [1,T]
        # dead tiles (all lanes tmax<=0 — late-bounce batches are mostly
        # dead and the coherence sort sinks them to the back) skip the
        # whole [Cp,T] slab test; the flat cost was ~40% of the queue
        # kernel's time on killeroo bounce batches
        live = jnp.max(tm) > 0.0

        @pl.when(~live)
        def _():
            hits_ref[tt, 0] = jnp.zeros((Cp,), jnp.float32)
            nears_ref[tt, 0] = jnp.full((Cp,), F32_MAX, jnp.float32)

        @pl.when(live)
        def _():
            r = r16_ref[tt]                         # [T,16]
            tnear = jnp.full((Cp, r.shape[0]), -F32_MAX)
            tfar = jnp.full_like(tnear, F32_MAX)
            for ax in range(3):
                lo = cb_ref[:, ax][:, None]         # [Cp,1]
                hi = cb_ref[:, 4 + ax][:, None]
                oca = r[:, 6 + ax][None, :]         # [1,T]
                inva = r[:, 9 + ax][None, :]
                t0 = (lo - oca) * inva
                t1 = (hi - oca) * inva
                tnear = jnp.maximum(tnear, jnp.minimum(t0, t1))
                tfar = jnp.minimum(tfar, jnp.maximum(t0, t1))
            hit = (tnear <= tfar * 1.0001 + 1e-5) & (tfar > 0) \
                & (tnear < tm) & (tm > 0)
            hits_ref[tt, 0] = jnp.any(hit, axis=1).astype(jnp.float32)
            nears_ref[tt, 0] = jnp.min(
                jnp.where(hit, jnp.maximum(tnear, 0.0), F32_MAX), axis=1)


def _tile_chunk_lists(r16_t, tmax_t, chunk_bounds, interpret=False):
    """Per-ray-tile active-chunk lists for the scalar-prefetch grid.

    r16_t [n_tiles,T,16], tmax_t [n_tiles,T], chunk_bounds [C,8].
    Returns (chunk_list [n_tiles,C] int32, n_active [n_tiles] int32):
    active chunks first, sorted front-to-back by the tile's nearest AABB
    entry (shrinks t_best fastest), then the last active index repeated
    so inactive grid steps re-fetch nothing.
    """
    n_tiles, T, _ = r16_t.shape
    C = chunk_bounds.shape[0]
    Cp = ((C + 7) // 8) * 8
    cbp = jnp.pad(chunk_bounds, ((0, Cp - C), (0, 0)))
    # inactive padding chunks: empty AABBs already fail the slab test
    tmax2 = tmax_t.reshape(n_tiles, 1, T)
    tq = max(1, min(TPG, n_tiles))
    nt_p = ((n_tiles + tq - 1) // tq) * tq
    r16p = r16_t if nt_p == n_tiles else jnp.pad(
        r16_t, ((0, nt_p - n_tiles), (0, 0), (0, 0)))
    tmax2p = tmax2 if nt_p == n_tiles else jnp.pad(
        tmax2, ((0, nt_p - n_tiles), (0, 0), (0, 0)),
        constant_values=-1.0)
    hits_f, nears = pl.pallas_call(
        _queue_kernel,
        grid=(nt_p // tq,),
        in_specs=[
            pl.BlockSpec((tq, T, 16), lambda i: (i, 0, 0)),
            pl.BlockSpec((tq, 1, T), lambda i: (i, 0, 0)),
            pl.BlockSpec((Cp, 8), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tq, 1, Cp), lambda i: (i, 0, 0)),
            pl.BlockSpec((tq, 1, Cp), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt_p, 1, Cp), jnp.float32),
            jax.ShapeDtypeStruct((nt_p, 1, Cp), jnp.float32),
        ],
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(r16p, tmax2p, cbp)
    hits = hits_f[:n_tiles, 0, :C] > 0.5
    nears = nears[:n_tiles, 0, :C]
    sort_key = jnp.where(hits, jnp.maximum(nears, 0.0), F32_MAX)
    # ONE packed minor-axis sort instead of argsort + two
    # take_along_axis (row-serial TPU gathers, ~1.4ms per 512x260 call
    # on v5e): chunk id rides the low mantissa bits — non-negative f32
    # sorts identically as i32, and truncating the low bits only LOWERS
    # the per-entry near bound, which stays a valid (slightly weaker)
    # front-to-back early-exit bound.
    idb = (C - 1).bit_length() or 1
    key_bits = jax.lax.bitcast_convert_type(sort_key, jnp.int32)
    packed = (key_bits & jnp.int32(~((1 << idb) - 1))) \
        | jnp.arange(C, dtype=jnp.int32)[None, :]
    packed = jax.lax.sort(packed, dimension=1)
    order = packed & ((1 << idb) - 1)
    near_list = jax.lax.bitcast_convert_type(
        packed & jnp.int32(~((1 << idb) - 1)), jnp.float32)
    n_active = hits.sum(-1).astype(jnp.int32)
    ranks = jnp.arange(C, dtype=jnp.int32)[None, :]
    # repeat the last ACTIVE entry over the inactive tail (so inactive
    # grid steps re-fetch nothing) without a take_along_axis: one-hot
    # reduction over the rank == n_active-1 column
    last = jnp.sum(jnp.where(ranks == jnp.maximum(n_active - 1, 0)[:, None],
                             order, 0), axis=1, keepdims=True)
    chunk_list = jnp.where(ranks < n_active[:, None], order, last)
    return chunk_list, n_active, near_list
