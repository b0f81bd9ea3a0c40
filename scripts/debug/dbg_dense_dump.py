"""Minimal Pallas kernel reproducing the dense loop's DMA assembly +
dot for ONE tile; dumps the raw out matrix to compare vs XLA."""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pbrt_tpu.ops import pallas_intersect as pdense

CH = pdense.CHUNK
PICK = pdense.PICK
T = pdense.RAY_TILE
PC = PICK * CH

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

r16 = np.asarray(jax.device_get(pdense.ray_vectors(
    jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
    jnp.asarray(tab["center"]))), np.float32)

# tile 0, picks as the real kernel would see them (sim said [l0,l1,l2,l2])
r = r16[:T]
r_hi = jnp.asarray(r).astype(jnp.bfloat16)
r_lo = (jnp.asarray(r) - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
r48 = jnp.concatenate([r_hi, r_lo, r_hi], -1)      # [T,48]
W = jnp.asarray(tab["W"])                          # [4,48,Pp] bf16

picks = [int(x) for x in sys.argv[1:]] or [0, 1, 2, 2]
print("picks:", picks)
pick_arr = jnp.asarray(np.asarray(picks, np.int32))


def kern(pk_ref, r48_ref, w_hbm, out_ref, wbuf, sems):
    def dma(s, sec):
        c = pk_ref[s]
        return pltpu.make_async_copy(
            w_hbm.at[sec, :, pl.ds(c * CH, CH)],
            wbuf.at[:, pl.ds(sec * PC + s * CH, CH)],
            sems.at[sec * PICK + s])
    for sec in range(4):
        for s in range(PICK):
            dma(s, sec).start()
    for sec in range(4):
        for s in range(PICK):
            dma(s, sec).wait()
    out_ref[:] = jax.lax.dot_general(
        r48_ref[:], wbuf[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1,
    grid=(1,),
    in_specs=[
        pl.BlockSpec((T, 48), lambda i, pk: (0, 0)),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((T, 4 * PC), lambda i, pk: (0, 0)),
    scratch_shapes=[
        pltpu.VMEM((48, 4 * PC), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((4 * PICK,)),
    ],
)
out_pl = pl.pallas_call(
    kern, grid_spec=grid_spec,
    out_shape=jax.ShapeDtypeStruct((T, 4 * PC), jnp.float32),
)(pick_arr, r48, W)
out_pl = np.asarray(out_pl)

# XLA truth: assemble the same operand with gather + one dot
cols = jnp.concatenate(
    [W[sec, :, c * CH:(c + 1) * CH] for sec in range(4) for c in picks],
    -1)                                            # [48, 4PC]
out_x = np.asarray(jax.lax.dot_general(
    r48, cols, (((1,), (0,)), ((), ())),
    preferred_element_type=jnp.float32))

diff = np.abs(out_pl - out_x)
print("max abs diff:", diff.max(), " mean:", diff.mean())
bad = np.argwhere(diff > 1e-6)
print("bad entries:", len(bad))
if len(bad):
    # locate: which section/pick/lane columns disagree
    cols_bad = np.unique(bad[:, 1])
    print("bad col range:", cols_bad.min(), cols_bad.max(),
          "count:", len(cols_bad))
    sec_bad = np.unique(cols_bad // PC)
    print("bad sections:", sec_bad)
    print("bad picks within sec:", np.unique((cols_bad % PC) // CH))
    rows_bad = np.unique(bad[:, 0])
    print("bad rows:", rows_bad.min(), rows_bad.max(), len(rows_bad))
    b = bad[0]
    print("example:", b, "pl:", out_pl[b[0], b[1]], "xla:", out_x[b[0], b[1]])
