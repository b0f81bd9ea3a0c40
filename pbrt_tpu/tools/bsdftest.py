"""bsdftest — BSDF sampling/eval consistency harness
(reference: src/tools/bsdftest.cpp).

    python -m pbrt_tpu.tools.bsdftest --material plastic --samples 100000
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


MATERIALS = {
    "matte": ("MAT_MATTE", {}),
    "orennayar": ("MAT_MATTE", {"sigma": 20.0}),
    "plastic": ("MAT_PLASTIC", {}),
    "metal": ("MAT_METAL", {}),
    "substrate": ("MAT_SUBSTRATE", {}),
    "translucent": ("MAT_TRANSLUCENT", {"kr": 0.5, "kt": 0.5}),
    "retroreflective": ("MAT_RETRO", {}),
    "roughglass": ("MAT_ROUGHGLASS", {"rough": 0.3}),
}


def main(argv=None):
    ap = argparse.ArgumentParser(prog="bsdftest")
    ap.add_argument("--material", default="plastic",
                    choices=sorted(MATERIALS))
    ap.add_argument("--samples", type=int, default=100000)
    ap.add_argument("--theta", type=float, default=30.0,
                    help="wo zenith angle in degrees")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from pbrt_tpu.materials import bsdf
    from pbrt_tpu.scene import ir

    tag, kw = MATERIALS[args.material]
    mtype = getattr(ir, tag)
    B = args.samples
    rs = np.random.RandomState(0)
    th = np.radians(args.theta)
    wo = jnp.broadcast_to(
        jnp.asarray([np.sin(th), 0.0, np.cos(th)], jnp.float32), (B, 3))
    p = bsdf.MaterialParams(
        type=jnp.full(B, mtype, jnp.int32),
        kd=jnp.full((B, 31), kw.get("kd", 0.6)),
        ks=jnp.full((B, 31), kw.get("ks", 0.4)),
        kr=jnp.full((B, 31), kw.get("kr", 1.0)),
        kt=jnp.full((B, 31), kw.get("kt", 1.0)),
        rough_u=jnp.full(B, kw.get("rough", 0.2)),
        rough_v=jnp.full(B, kw.get("rough", 0.2)),
        eta=jnp.full(B, 1.5), eta_spec=jnp.full((B, 31), 0.2),
        k_spec=jnp.full((B, 31), 3.0),
        sigma=jnp.full(B, kw.get("sigma", 0.0)),
        opacity=jnp.ones((B, 31)))
    wi, f, pdf, is_spec, trans, _ = bsdf.sample_f(
        p, wo, jnp.asarray(rs.rand(B).astype(np.float32)),
        jnp.asarray(rs.rand(B).astype(np.float32)),
        jnp.asarray(rs.rand(B).astype(np.float32)))
    pdf = np.asarray(pdf)
    f15 = np.asarray(f)[:, 15]
    cos = np.abs(np.asarray(wi)[:, 2])
    ok = pdf > 1e-6
    albedo = np.where(ok, f15 * cos / np.maximum(pdf, 1e-6), 0.0).mean()
    f2 = np.asarray(bsdf.eval_f(p, wo, wi))[:, 15]
    pdf2 = np.asarray(bsdf.pdf_f(p, wo, wi))
    cons_f = np.abs(f2[ok] - f15[ok]).max() if ok.any() else 0.0
    cons_p = np.abs(pdf2[ok] - pdf[ok]).max() if ok.any() else 0.0
    print(f"material {args.material}  wo theta {args.theta} deg  "
          f"samples {B}")
    print(f"  valid sample fraction : {ok.mean():.4f}")
    print(f"  hemispherical albedo  : {albedo:.4f} (bin 15)")
    print(f"  transmitted fraction  : {np.asarray(trans).mean():.4f}")
    print(f"  max |f(sample)-f(eval)|   : {cons_f:.3e}")
    print(f"  max |pdf(sample)-pdf(eval)|: {cons_p:.3e}")
    status = 0 if (cons_f < 1e-3 and cons_p < 1e-3 and albedo < 1.5) else 1
    print("  PASS" if status == 0 else "  FAIL")
    return status


if __name__ == "__main__":
    sys.exit(main())
