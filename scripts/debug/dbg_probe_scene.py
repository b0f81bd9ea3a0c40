"""Triage: killeroo parity stuck at ~70% — is it the loopsubdiv geometry
or the integrator (sphere light / plastic)?  Renders the killeroo scene
with the killeroos replaced by plastic BOXES (plain trianglemesh): if
parity jumps to ~99%, the divergence is subdiv geometry; if it stays
~70%, the integrator path is wrong."""
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

SCENE = "/tmp/killeroo_probe.pbrt"
SPP = 8
W = H = 700


def box_str(c, s):
    cx, cy, cz = c
    v = []
    for dx in (-s, s):
        for dy in (-s, s):
            for dz in (-s, s):
                v.append((cx + dx, cy + dy, cz + dz))
    idx = [0, 1, 3, 0, 3, 2, 4, 6, 7, 4, 7, 5, 0, 4, 5, 0, 5, 1,
           2, 3, 7, 2, 7, 6, 0, 2, 6, 0, 6, 4, 1, 5, 7, 1, 7, 3]
    pts = " ".join(f"{x} {y} {z}" for x, y, z in v)
    return (f'Shape "trianglemesh" "point P" [ {pts} ] '
            f'"integer indices" [ {" ".join(map(str, idx))} ]\n')


def write_scene():
    with open(SCENE, "w") as f:
        f.write('LookAt 400 20 30   0 63 -110   0 0 1\n')
        f.write('Rotate -5 0 0 1\n')
        f.write('Camera "perspective" "float fov" [39]\n')
        f.write(f'Film "image" "integer xresolution" [{W}] '
                f'"integer yresolution" [{H}] '
                f'"string filename" "/tmp/killeroo_probe.dat"\n')
        f.write(f'Sampler "sobol" "integer pixelsamples" [{SPP}]\n')
        f.write('Integrator "path" "integer maxdepth" [5] '
                '"string lightsamplestrategy" "uniform"\n')
        f.write('WorldBegin\n')
        f.write('AttributeBegin\n')
        f.write('Material "matte" "color Kd" [0 0 0]\n')
        f.write('Translate 150 120 20\n')
        f.write('AreaLightSource "area" "color L" [2000 2000 2000]\n')
        f.write('Shape "sphere" "float radius" [3]\n')
        f.write('AttributeEnd\n')
        f.write('AttributeBegin\n')
        f.write('Material "matte" "color Kd" [.5 .5 .8]\n')
        f.write('Translate 0 0 -140\n')
        f.write('Shape "trianglemesh" "point P" [ -1000 -1000 0 1000 -1000 0 '
                '1000 1000 0 -1000 1000 0 ] "float uv" [ 0 0 5 0 5 5 0 5 ] '
                '"integer indices" [ 0 1 2 2 3 0]\n')
        f.write('AttributeEnd\n')
        f.write('Material "plastic" "color Kd" [.4 .2 .2] '
                '"color Ks" [.5 .5 .5] "float roughness" [.025]\n')
        f.write(box_str((30, 60, -90), 40))
        f.write('Material "plastic" "color Ks" [.3 .3 .3] '
                '"color Kd" [.4 .5 .4] "float roughness" [.15]\n')
        f.write(box_str((-60, 90, -60), 35))
        f.write('WorldEnd\n')


def main():
    write_scene()
    subprocess.run(["/tmp/refbuild/pbrt_spectral", SCENE], check=True)
    from pbrt_tpu.film.io import read_dat
    ref, _ = read_dat("/tmp/killeroo_probe.dat")
    ref = np.asarray(ref, np.float32) / SPP

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from pbrt_tpu.parser.api import parse_scene
    from pbrt_tpu.tools.pbrt import build_camera
    from pbrt_tpu.integrators import refpath
    from pbrt_tpu.cameras import projective

    job = parse_scene(SCENE)
    camera = build_camera(job, W, H)
    sampler = refpath.RefSampler.make(W, H)
    lt = refpath.build_ref_lights(job.scene)
    a, b = 250, 450
    xs, ys = np.meshgrid(np.arange(a, b), np.arange(a, b))
    pixel_ids = jnp.asarray((ys * W + xs).ravel().astype(np.uint32))

    @jax.jit
    def one_pass(scene, camera, s):
        ray, weight, _pf, pid, sidx = refpath.camera_rays_ref(
            camera, W, H, sampler, pixel_ids, s, projective.generate_rays)
        L = refpath.trace_ref(scene, lt, sampler, ray, pid, sidx,
                              max_depth=5)
        return L * weight[:, None]

    acc = None
    for s in range(SPP):
        L = one_pass(job.scene, camera, jnp.uint32(s))
        acc = L if acc is None else acc + L
    ours = (np.asarray(acc) / SPP).reshape(b - a, b - a, -1)
    rf = ref[a:b, a:b]
    lo, lr = ours.sum(-1), rf.sum(-1)
    rel = np.abs(lo - lr) / np.maximum(lr, 1e-3)
    print("means", lo.mean(), lr.mean())
    print("frac<1e-2:", (rel < 1e-2).mean(), "median:", np.median(rel))
    m = (rel < 1e-2).reshape(8, 25, 8, 25).mean((1, 3))
    print(np.round(m, 2))


if __name__ == "__main__":
    main()
