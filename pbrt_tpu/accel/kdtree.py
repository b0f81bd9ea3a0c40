"""SAH kd-tree accelerator (reference: src/accelerators/kdtreeaccel.cpp).

Host-side numpy build with pbrt's exact split policy — exhaustive SAH
over sorted bound edges, empty-space bonus, axis retries, badRefines
budget, primitive DUPLICATION across straddled splits, max depth
8 + 1.3*log2(N) — flattened to device arrays.  Device-side traversal is
lockstep KD-RESTART (ops/intersect.py _intersect_kd): instead of the
reference's per-ray KdToDo stack (kdtreeaccel.cpp:415) each lane tracks
its current (t_entry, cell t_exit) and restarts the descent from the
root after each leaf, advancing t_entry past the cell — ~2x node visits
but no per-lane stacks, which suits a lockstep vector machine.

Selected by `Accelerator "kdtree"`; results must match the BVH exactly
(accelerators change performance, never radiometry).
"""

from __future__ import annotations

import numpy as np

# node int row layout: [flags(axis or 3=leaf), above_child|prim_offset,
#                       n_prims]; float row: split position
KD_LEAF = 3


def build_kdtree(lo, hi, isect_cost=80, traversal_cost=1,
                 empty_bonus=0.5, max_prims=1, max_depth=0):
    """lo/hi [P,3] primitive bounds -> flattened kd arrays.

    Returns dict(nodes_f [N] f32 split, nodes_i [N,3] int32,
    prim_idx [M] int32 (duplicated), bounds [2,3]).
    """
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    P = lo.shape[0]
    if P == 0:
        return dict(nodes_f=np.zeros(1, np.float32),
                    nodes_i=np.asarray([[KD_LEAF, 0, 0]], np.int32),
                    prim_idx=np.zeros(0, np.int32),
                    bounds=np.zeros((2, 3), np.float32))
    if max_depth <= 0:
        max_depth = int(round(8 + 1.3 * np.log2(max(P, 1))))
    root_lo = lo.min(0)
    root_hi = hi.max(0)

    nodes_f = []
    nodes_i = []
    prim_idx = []

    def surface(d):
        return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    def rec(prims, nb_lo, nb_hi, depth, bad_refines):
        node = len(nodes_f)
        nodes_f.append(0.0)
        nodes_i.append([KD_LEAF, 0, 0])
        n = len(prims)
        if n <= max_prims or depth == 0:
            nodes_i[node] = [KD_LEAF, len(prim_idx), n]
            prim_idx.extend(prims.tolist())
            return node
        d = nb_hi - nb_lo
        inv_sa = 1.0 / max(surface(d), 1e-30)
        old_cost = isect_cost * float(n)
        best = (np.inf, -1, 0.0)            # cost, axis, split pos
        best_masks = None
        axis0 = int(np.argmax(d))
        for retry in range(3):
            axis = (axis0 + retry) % 3
            # edge events: (t, type) with Start=0 before End=1 at ties —
            # pbrt sorts (t, type) ascending (kdtreeaccel.cpp:189)
            t = np.concatenate([lo[prims, axis], hi[prims, axis]])
            typ = np.concatenate([np.zeros(n, np.int8),
                                  np.ones(n, np.int8)])
            order = np.lexsort((typ, t))
            t = t[order]
            typ = typ[order]
            # nAbove decremented at End BEFORE costing; nBelow
            # incremented at Start AFTER (kdtreeaccel.cpp:198-228)
            ends_before = np.cumsum(typ == 1)
            starts_before = np.concatenate(
                [[0], np.cumsum(typ == 0)[:-1]])
            n_above = n - ends_before
            n_below = starts_before
            inside = (t > nb_lo[axis]) & (t < nb_hi[axis])
            oa0, oa1 = (axis + 1) % 3, (axis + 2) % 3
            base = d[oa0] * d[oa1]
            esum = d[oa0] + d[oa1]
            p_below = 2 * (base + (t - nb_lo[axis]) * esum) * inv_sa
            p_above = 2 * (base + (nb_hi[axis] - t) * esum) * inv_sa
            eb = np.where((n_above == 0) | (n_below == 0), empty_bonus, 0.0)
            cost = traversal_cost + isect_cost * (1 - eb) * (
                p_below * n_below + p_above * n_above)
            cost = np.where(inside, cost, np.inf)
            k = int(np.argmin(cost))
            if cost[k] < best[0]:
                best = (float(cost[k]), axis, float(t[k]))
            if best[1] >= 0:
                break
        cost_b, axis_b, split = best
        if cost_b > old_cost:
            bad_refines += 1
        if (cost_b > 4 * old_cost and n < 16) or axis_b < 0 \
                or bad_refines == 3:
            nodes_i[node] = [KD_LEAF, len(prim_idx), n]
            prim_idx.extend(prims.tolist())
            return node
        # primitive duplication: straddlers go to BOTH children.  A
        # zero-extent prim lying exactly ON the split plane (axis-aligned
        # quad at the SAH+empty-bonus-preferred position) satisfies
        # neither strict inequality — keep it below, matching pbrt's
        # edge-index classification which always lands such prims on one
        # side (kdtreeaccel.cpp prims0/prims1 loops).
        on_plane = (lo[prims, axis_b] == split) & (hi[prims, axis_b] == split)
        below = prims[(lo[prims, axis_b] < split) | on_plane]
        above = prims[hi[prims, axis_b] > split]
        lo_hi = nb_hi.copy()
        lo_hi[axis_b] = split
        hi_lo = nb_lo.copy()
        hi_lo[axis_b] = split
        rec(below, nb_lo, lo_hi, depth - 1, bad_refines)
        above_child = rec(above, hi_lo, nb_hi, depth - 1, bad_refines)
        nodes_f[node] = split
        nodes_i[node] = [axis_b, above_child, 0]
        return node

    import sys
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(10000, old_limit))
    try:
        rec(np.arange(P, dtype=np.int64), root_lo.astype(np.float64),
            root_hi.astype(np.float64), max_depth, 0)
    finally:
        sys.setrecursionlimit(old_limit)
    ni = np.asarray(nodes_i, np.int32)
    max_leaf = int(ni[ni[:, 0] == KD_LEAF, 2].max(initial=1))
    return dict(nodes_f=np.asarray(nodes_f, np.float32),
                nodes_i=ni,
                prim_idx=np.asarray(prim_idx, np.int32),
                bounds=np.stack([root_lo, root_hi]).astype(np.float32),
                max_leaf=max_leaf)
