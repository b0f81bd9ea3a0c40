"""Microscope one ref-hit-only ray: reproduce the kernel's dot+epilogue
for (ray, winning triangle) outside Pallas, on TPU and in numpy f64."""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
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


rs = np.random.RandomState(0)
n_tris, n_rays = 600, 2048
base = rs.rand(n_tris, 3) * 10 - 5
e1 = rs.randn(n_tris, 3) * 0.4
e2 = rs.randn(n_tris, 3) * 0.4
v0 = base
tab = pdense.build_dense_tables(v0, e1, e2)

o = np.tile(np.array([[0.0, 0.0, -20.0]]), (n_rays, 1))
px = rs.rand(n_rays, 2) * 12 - 6
tgt = np.concatenate([px, np.zeros((n_rays, 1))], 1)
d = tgt - o
d = d / np.linalg.norm(d, axis=-1, keepdims=True)
tmax = np.full(n_rays, 1e30, np.float32)

t_ref, prim_ref = brute(v0, e1, e2, o, d, tmax.astype(np.float64))

r16 = np.asarray(pdense.ray_vectors(jnp.asarray(o, jnp.float32),
                                    jnp.asarray(d, jnp.float32),
                                    jnp.asarray(tab["center"])))

CH = pdense.CHUNK
W = np.asarray(tab["W"].astype(np.float32))        # [4,48,Pp] from bf16

for ray_id in [235, 328, 380, 481, 490]:
    win = int(prim_ref[ray_id])
    r = r16[ray_id]
    r_hi = jnp.asarray(r, jnp.float32).astype(jnp.bfloat16)
    r_lo = (jnp.asarray(r, jnp.float32)
            - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    r48 = jnp.concatenate([r_hi, r_lo, r_hi])[None, :]    # [1,48]
    Wj = jnp.asarray(tab["W"][:, :, win]).T[None].reshape(48, 4)  # cols
    Wj = jnp.asarray(tab["W"][:, :, win], jnp.bfloat16).T          # [48,4]
    out = jax.lax.dot_general(
        r48, Wj, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = np.asarray(out)[0]          # [4] = s1, s2, num, s0
    s1v, s2v, numv, s0v = [float(x) for x in out]
    nd = s0v + s1v + s2v
    i = np.asarray([s0v, s1v, s2v], np.float32).view(np.int32)
    inside = ((i[0] ^ i[1]) | (i[0] ^ i[2])) >= 0
    t = numv / nd if nd != 0 else np.inf
    # f64 truth of the same sections from original geometry
    c = tab["center"].astype(np.float64)
    a0, b0 = v0[win] - c, v0[win] + e1[win] - c
    a1, b1 = b0, v0[win] + e2[win] - c
    a2, b2 = b1, a0
    oc = o[ray_id] - c
    m = np.cross(oc, d[ray_id])
    def side(a, b):
        return (np.cross(a, b) * d[ray_id]).sum() + ((b - a) * m).sum()
    s0t, s1t, s2t = side(a0, b0), side(a1, b1), side(a2, b2)
    n = np.cross(e1[win], e2[win])
    ndt = (n * d[ray_id]).sum()
    numt = (n * (v0[win] - c)).sum() - (n * oc).sum()
    print(f"ray {ray_id} win {win}: MXU s=[{s0v:.3e},{s1v:.3e},{s2v:.3e}]"
          f" num={numv:.3e} nd={nd:.3e} inside={inside} t={t:.4f}")
    print(f"    f64 s=[{s0t:.3e},{s1t:.3e},{s2t:.3e}]"
          f" nd={ndt:.3e} t={numt/ndt:.4f} t_ref={t_ref[ray_id]:.4f}")
