"""Loop subdivision surfaces -> triangle mesh (reference:
src/shapes/loopsubdiv.cpp).  Host-side numpy; tessellates at scene-compile
time exactly as the reference does at shape creation."""

from __future__ import annotations

import numpy as np


def loop_subdivide(verts, faces, levels):
    """verts [V,3], faces [F,3] -> subdivided (verts, faces).

    Standard Loop rules: interior vertex beta-weighting, boundary crease
    rules, 3/8-3/8-1/8-1/8 edge points (loopsubdiv.cpp beta()/gamma()).
    """
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces, np.int64)
    for _ in range(max(int(levels), 0)):
        verts, faces = _subdivide_once(verts, faces)
    return verts, faces


def _subdivide_once(verts, faces):
    V = len(verts)
    # edge -> midpoint index map and adjacency
    edge_map = {}
    edge_faces = {}
    for fi, f in enumerate(faces):
        for k in range(3):
            e = (min(f[k], f[(k + 1) % 3]), max(f[k], f[(k + 1) % 3]))
            edge_faces.setdefault(e, []).append((fi, f[(k + 2) % 3]))
    # neighbors
    neighbors = [set() for _ in range(V)]
    boundary = [False] * V
    for (a, b), efs in edge_faces.items():
        neighbors[a].add(b)
        neighbors[b].add(a)
        if len(efs) == 1:
            boundary[a] = boundary[b] = True

    # edge (odd) vertices
    new_verts = []
    for e, efs in edge_faces.items():
        a, b = e
        if len(efs) == 2:
            c, d = efs[0][1], efs[1][1]
            p = 0.375 * (verts[a] + verts[b]) + 0.125 * (verts[c] + verts[d])
        else:
            p = 0.5 * (verts[a] + verts[b])
        edge_map[e] = V + len(new_verts)
        new_verts.append(p)

    # even (original) vertices
    even = np.empty_like(verts)
    for v in range(V):
        nb = list(neighbors[v])
        n = len(nb)
        if n == 0:
            even[v] = verts[v]
            continue
        if boundary[v]:
            bnb = [u for u in nb if len(edge_faces[
                (min(u, v), max(u, v))]) == 1]
            if len(bnb) == 2:
                even[v] = 0.75 * verts[v] + 0.125 * (verts[bnb[0]]
                                                     + verts[bnb[1]])
            else:
                even[v] = verts[v]
        else:
            if n == 3:
                beta = 3.0 / 16.0
            else:
                beta = 3.0 / (8.0 * n)
            even[v] = (1 - n * beta) * verts[v] + beta * verts[nb].sum(0)

    out_faces = []
    for f in faces:
        a, b, c = f
        ab = edge_map[(min(a, b), max(a, b))]
        bc = edge_map[(min(b, c), max(b, c))]
        ca = edge_map[(min(c, a), max(c, a))]
        out_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
    return (np.concatenate([even, np.asarray(new_verts)], 0),
            np.asarray(out_faces, np.int64))
