"""Mosaic lowering gate: jit-LOWER the dense kernel for TPU on
production-regime shapes without executing anything.

Catches every Pallas block-mapping / layout error (the class that produced
rc=1 snapshots in rounds 2 and 3: Mosaic's `_check_block_mappings` only
runs during TPU lowering, never in interpret mode) in seconds.  Run by
scripts/pre_snapshot.sh; exits non-zero on any lowering failure.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.ops import pallas_intersect as pdense


def main():
    tpus = [d for d in jax.devices() if d.platform == "tpu"]
    if not tpus:
        print("lowering_gate: no TPU backend present, SKIP (rc=0)")
        return 0
    rs = np.random.RandomState(0)
    failures = 0
    # (P tris, B rays): small, killeroo-scale chunk count, big batch
    for P, B in [(600, 2048), (600, 65536), (75000, 65536), (290 * 128, 8192)]:
        v0 = rs.rand(P, 3) * 10 - 5
        e1 = rs.randn(P, 3) * 0.5
        e2 = rs.randn(P, 3) * 0.5
        tab = pdense.build_dense_tables(v0, e1, e2)
        o = jnp.zeros((B, 3), jnp.float32)
        d = jnp.ones((B, 3), jnp.float32)
        r16 = pdense.ray_vectors(o, d, jnp.asarray(tab["center"]))
        tmax = jnp.full((B,), 3.0e38, jnp.float32)
        W = jnp.asarray(tab["W"])
        cb = jnp.asarray(tab["chunk_bounds"])
        try:
            jax.jit(
                lambda r16, tmax, W, cb: pdense.dense_intersect_loop(
                    r16, tmax, W, cb, tab["n_pad"])
            ).lower(r16, tmax, W, cb).compile()
            print(f"lowering_gate: P={P} B={B} OK")
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"lowering_gate: P={P} B={B} FAILED:\n{e}")
        # motion-table variant (time-polynomial kernel)
        dm = np.concatenate(
            [rs.randn(P, 9) * 0.2, np.zeros((P, 3))], 1)
        tabm = pdense.build_dense_tables_motion(v0, e1, e2, dm)
        Wm = jnp.asarray(tabm["W"])
        cbm = jnp.asarray(tabm["chunk_bounds"])
        tm = jnp.zeros((B,), jnp.float32)
        try:
            jax.jit(
                lambda r16, tmax, W, cb, tm: pdense.dense_intersect_loop(
                    r16, tmax, W, cb, tabm["n_pad"], time=tm)
            ).lower(r16, tmax, Wm, cbm, tm).compile()
            print(f"lowering_gate: P={P} B={B} motion OK")
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"lowering_gate: P={P} B={B} motion FAILED:\n{e}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
