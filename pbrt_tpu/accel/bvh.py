"""Host-side BVH construction (reference: src/accelerators/bvh.cpp).

The reference builds a pointer tree with SAH (12 binned buckets,
bvh.cpp:236+) then flattens to 32-byte LinearBVHNodes traversed with a
per-ray stack (bvh.cpp:662-700).  A per-ray stack is hostile to a vector
machine, so the TPU design flattens to a *threaded* ("skip-link") BVH:
nodes in depth-first order, and traversal needs only

    if box-hit:  leaf ? intersect prims, go to skip[i] : go to i+1
    else:        go to skip[i]

which makes the traversal loop a single `lax.while_loop` over lockstep ray
batches with no stack and no data-dependent shapes.  Construction is numpy
(scene-compile time), split method = binned SAH with Middle/EqualCounts
fallbacks (same options as the reference, bvh.h:57).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

N_BUCKETS = 12
#: traversal:intersection cost ratio used by the SAH (reference bvh.cpp:19)
TRAVERSAL_COST = 0.125


@dataclass
class FlatBVH:
    """Skip-link flattened BVH (numpy, converted to jnp at scene upload).

    node arrays have length n_nodes; `skip[i]` is the DFS index of the node
    that follows i's entire subtree (sentinel n_nodes at the end).
    `prim_offset >= 0` marks a leaf holding `prim_count` primitives starting
    at that offset in the *reordered* primitive arrays; `prim_order` maps
    new primitive index -> original index.
    """
    lo: np.ndarray          # [N, 3] float32
    hi: np.ndarray          # [N, 3] float32
    skip: np.ndarray        # [N] int32
    prim_offset: np.ndarray  # [N] int32 (-1 for interior)
    prim_count: np.ndarray  # [N] int32
    prim_order: np.ndarray  # [P] int32
    max_leaf_size: int


class _Node:
    __slots__ = ("lo", "hi", "left", "right", "first", "count")

    def __init__(self):
        self.left = self.right = None
        self.first = self.count = 0


def build_bvh(prim_lo, prim_hi, max_leaf_size=4, split_method="sah"):
    """Build a BVH over primitive AABBs.

    prim_lo/prim_hi: [P, 3] float arrays.  Returns FlatBVH.
    """
    prim_lo = np.asarray(prim_lo, dtype=np.float64)
    prim_hi = np.asarray(prim_hi, dtype=np.float64)
    n = prim_lo.shape[0]
    if n == 0:
        return FlatBVH(lo=np.zeros((1, 3), np.float32),
                       hi=np.full((1, 3), -np.inf, np.float32),
                       skip=np.array([1], np.int32),
                       prim_offset=np.array([0], np.int32),
                       prim_count=np.array([0], np.int32),
                       prim_order=np.zeros((0,), np.int32),
                       max_leaf_size=max_leaf_size)
    centroids = 0.5 * (prim_lo + prim_hi)
    order = np.arange(n)

    # iterative build with an explicit stack to dodge recursion limits
    root = _Node()
    stack = [(root, 0, n)]
    ordered = np.empty(n, dtype=np.int64)
    out_pos = 0

    # we mutate `order` slices in place during partitioning
    while stack:
        node, lo_i, hi_i = stack.pop()
        idx = order[lo_i:hi_i]
        node.lo = prim_lo[idx].min(0)
        node.hi = prim_hi[idx].max(0)
        count = hi_i - lo_i
        if count <= max_leaf_size:
            node.first, node.count = out_pos, count
            ordered[out_pos:out_pos + count] = idx
            out_pos += count
            continue
        c = centroids[idx]
        c_lo, c_hi = c.min(0), c.max(0)
        dim = int(np.argmax(c_hi - c_lo))
        if c_hi[dim] - c_lo[dim] < 1e-12:
            # degenerate: all centroids coincide -> leaf (or equal split
            # if the leaf would be huge)
            if count <= 4 * max_leaf_size:
                node.first, node.count = out_pos, count
                ordered[out_pos:out_pos + count] = idx
                out_pos += count
                continue
            mid = count // 2
        else:
            mid = _split(split_method, idx, c, dim, c_lo, c_hi,
                         prim_lo, prim_hi, count, max_leaf_size)
            if mid is None:  # SAH says leaf is cheaper
                node.first, node.count = out_pos, count
                ordered[out_pos:out_pos + count] = idx
                out_pos += count
                continue
        # partition by sorting along dim (stable + simple)
        key = np.argsort(c[:, dim], kind="stable")
        order[lo_i:hi_i] = idx[key]
        node.left, node.right = _Node(), _Node()
        # push right first so left is processed next (DFS order)
        stack.append((node.right, lo_i + mid, hi_i))
        stack.append((node.left, lo_i, lo_i + mid))

    # flatten depth-first with skip links (iterative DFS, deep scenes ok)
    flat = []
    st = [root]
    while st:
        nd = st.pop()
        flat.append(nd)
        if nd.left is not None:
            st.append(nd.right)
            st.append(nd.left)
    index_of = {id(nd): i for i, nd in enumerate(flat)}
    n_nodes = len(flat)
    skip = np.empty(n_nodes, dtype=np.int32)

    # compute skip via DFS with explicit (node, skip_target) stack
    st = [(root, n_nodes)]
    while st:
        nd, sk = st.pop()
        i = index_of[id(nd)]
        skip[i] = sk
        if nd.left is not None:
            right_i = index_of[id(nd.right)]
            st.append((nd.right, sk))
            st.append((nd.left, right_i))

    lo = np.stack([nd.lo for nd in flat]).astype(np.float32)
    hi = np.stack([nd.hi for nd in flat]).astype(np.float32)
    prim_offset = np.array(
        [nd.first if nd.left is None else -1 for nd in flat], np.int32)
    prim_count = np.array(
        [nd.count if nd.left is None else 0 for nd in flat], np.int32)
    return FlatBVH(lo=lo, hi=hi, skip=skip, prim_offset=prim_offset,
                   prim_count=prim_count,
                   prim_order=ordered.astype(np.int32),
                   max_leaf_size=max_leaf_size)


def _split(method, idx, c, dim, c_lo, c_hi, prim_lo, prim_hi, count,
           max_leaf_size):
    """Choose split position along sorted-centroid order; None => make leaf."""
    if method == "middle" or count <= 2:
        key = np.argsort(c[:, dim], kind="stable")
        mid_val = 0.5 * (c_lo[dim] + c_hi[dim])
        mid = int(np.searchsorted(c[key, dim], mid_val))
        if mid == 0 or mid == count:
            mid = count // 2
        return mid
    if method == "equal":
        return count // 2
    # binned SAH (reference bvh.cpp:236+)
    rel = (c[:, dim] - c_lo[dim]) / (c_hi[dim] - c_lo[dim])
    b = np.minimum((rel * N_BUCKETS).astype(np.int64), N_BUCKETS - 1)
    bucket_count = np.bincount(b, minlength=N_BUCKETS)
    # per-bucket bounds of primitive AABBs
    INF = np.inf
    b_lo = np.full((N_BUCKETS, 3), INF)
    b_hi = np.full((N_BUCKETS, 3), -INF)
    pl, ph = prim_lo[idx], prim_hi[idx]
    for k in range(N_BUCKETS):
        m = b == k
        if m.any():
            b_lo[k] = pl[m].min(0)
            b_hi[k] = ph[m].max(0)
    # prefix/suffix surface areas
    def area(lo, hi):
        d = np.maximum(hi - lo, 0)
        return 2 * (d[..., 0] * d[..., 1] + d[..., 0] * d[..., 2]
                    + d[..., 1] * d[..., 2])
    cost = np.empty(N_BUCKETS - 1)
    for k in range(N_BUCKETS - 1):
        n0 = bucket_count[:k + 1].sum()
        n1 = bucket_count[k + 1:].sum()
        if n0 == 0 or n1 == 0:
            cost[k] = INF
            continue
        lo0, hi0 = b_lo[:k + 1].min(0), b_hi[:k + 1].max(0)
        lo1, hi1 = b_lo[k + 1:].min(0), b_hi[k + 1:].max(0)
        cost[k] = TRAVERSAL_COST + (n0 * area(lo0, hi0)
                                    + n1 * area(lo1, hi1)) / max(
            area(np.minimum(lo0, lo1), np.maximum(hi0, hi1)), 1e-30)
    best = int(np.argmin(cost))
    leaf_cost = float(count)
    if count > max_leaf_size or cost[best] < leaf_cost:
        if not np.isfinite(cost[best]):
            return count // 2
        # number of prims in buckets <= best
        mid = int((b <= best).sum())
        if mid == 0 or mid == count:
            return count // 2
        # return split position in *sorted along dim* order: since buckets
        # are monotone in centroid, sorting by centroid puts the first
        # `mid` prims in the left buckets
        return mid
    return None
