"""Debug the killeroo matched-RNG mismatch: means, block correlation."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from pbrt_tpu.parser.api import parse_scene
from pbrt_tpu.tools.pbrt import build_camera
from pbrt_tpu.integrators import refpath
from pbrt_tpu.cameras import projective

d = np.load("tests/data/ref_killeroo_refrng.npz")
crop = d["crop"]
y0c = int(d["crop_box"][0])
spp = int(d["spp"])
job = parse_scene("scenes/killeroo_refrng.pbrt")
W, H = job.film_width, job.film_height
camera = build_camera(job, W, H)
sampler = refpath.RefSampler.make(W, H)
lt = refpath.build_ref_lights(job.scene)
print("lights:", lt.count, "kinds:", np.asarray(lt.kind),
      "center:", np.asarray(lt.center), "r:", np.asarray(lt.radius),
      "L mean:", float(np.asarray(lt.L).mean()))

a, b = 286, 414
xs, ys = np.meshgrid(np.arange(a, b), np.arange(a, b))
pixel_ids = jnp.asarray((ys * W + xs).ravel().astype(np.uint32))


@jax.jit
def one_pass(scene, camera, s):
    ray, weight, _pf, pid, sidx = refpath.camera_rays_ref(
        camera, W, H, sampler, pixel_ids, s, projective.generate_rays)
    L = refpath.trace_ref(scene, lt, sampler, ray, pid, sidx, max_depth=5)
    return L * weight[:, None]

n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
acc = None
for s in range(n):
    L = one_pass(job.scene, camera, jnp.uint32(s))
    acc = L if acc is None else acc + L
ours = (np.asarray(acc) / n).reshape(b - a, b - a, -1)
ref = crop[a - y0c:b - y0c, a - y0c:b - y0c]
print("ours mean", ours.mean(), "ref mean", ref.mean())
lo, lr = ours.sum(-1), ref.sum(-1)
# block means
bs = 16
blo = lo.reshape(8, bs, 8, bs).mean((1, 3))
blr = lr.reshape(8, bs, 8, bs).mean((1, 3))
print("block ratio ours/ref:\n", np.round(blo / np.maximum(blr, 1e-6), 3))
print("corr:", np.corrcoef(blo.ravel(), blr.ravel())[0, 1])
rel = np.abs(lo - lr) / np.maximum(lr, 1e-3)
print("frac<1e-2:", (rel < 1e-2).mean(), "median rel:", np.median(rel))
m = (rel < 1e-2).reshape(8, 16, 8, 16).mean((1, 3))
print("frac<1e-2 per 16x16 block:\n", np.round(m, 2))
np.save("/tmp/dbg_ours.npy", ours)
np.save("/tmp/dbg_ref.npy", ref)
