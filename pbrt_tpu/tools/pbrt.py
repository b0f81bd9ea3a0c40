"""Renderer CLI (reference: src/main/pbrt.cpp).

    python -m pbrt_tpu.tools.pbrt scene.pbrt [--outfile x.exr] [--quick]
        [--spp N] [--quiet] [--cropwindow x0 x1 y0 y1] [--cpu] [--maxdepth N]

Parses the scene with the pbrt grammar, compiles to device tensors, renders
with the selected integrator, writes the RGB image and (when the fork's
spectralFlag is on, its default) the ISET spectral `.dat`, plus the fork's
metadata sidecars <out>_mesh.txt / <out>_materials.txt (api.cpp:1630-1689).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

import numpy as np


def build_camera(job, width, height):
    from pbrt_tpu.cameras import projective
    from pbrt_tpu.core import transform as tfm
    cp = job.camera_params
    sw = cp.get("screenwindow")
    screen = tuple(sw) if sw is not None else None
    kind = job.camera_kind
    if kind in ("realistic", "omni", "realisticEye", "realisticeye", "humaneye"):
        from pbrt_tpu.cameras import lens as lenscam
        # a broken lens description is a scene error, not something to
        # paper over with a perspective render (the reference Error()s
        # out, api.cpp MakeCamera) — let it propagate
        return lenscam.make_lens_camera(job, width, height)
    if kind == "orthographic":
        return projective.make_orthographic(
            job.cam_to_world, width, height,
            lens_radius=cp["lensradius"], focal_distance=cp["focaldistance"],
            screen=screen, shutter_open=cp["shutteropen"],
            shutter_close=cp["shutterclose"])
    if kind == "environment":
        return projective.make_environment(job.cam_to_world, width, height)
    return projective.make_perspective(
        job.cam_to_world, cp["fov"], width, height,
        lens_radius=cp["lensradius"], focal_distance=cp["focaldistance"],
        screen=screen, shutter_open=cp["shutteropen"],
        shutter_close=cp["shutterclose"],
        cam_to_world1=getattr(job, "cam_to_world1", None))


_DIRECTIVES = {
    "Identity", "Translate", "Scale", "Rotate", "LookAt", "Transform",
    "ConcatTransform", "CoordinateSystem", "CoordSysTransform",
    "ActiveTransform", "TransformTimes", "TransformBegin", "TransformEnd",
    "Camera", "Film", "PixelFilter", "Sampler", "Integrator",
    "Accelerator", "Include", "WorldBegin", "AttributeBegin",
    "AttributeEnd", "ReverseOrientation", "ObjectBegin", "ObjectEnd",
    "ObjectInstance", "MakeNamedMedium", "MediumInterface", "Texture",
    "Material", "MakeNamedMaterial", "NamedMaterial", "LightSource",
    "AreaLightSource", "Shape", "WorldEnd",
}


def cat_scene(path, out=None, toply=False):
    """`--cat` / `--toply` pretty-printer (reference parser.cpp
    `--cat/--toply`): re-emits the scene one directive per line with
    normalized whitespace; --toply additionally spills inline
    trianglemesh data to .ply sidecars and rewrites the Shape."""
    from pbrt_tpu.parser.tokenizer import tokenize_file, unquote
    toks = list(tokenize_file(path))
    # group into directives (a bare known-directive atom starts a
    # group), expanding Include inline like the reference parser
    groups = []

    def consume(tokens, scene_dir):
        it = iter(tokens)
        for t in it:
            if not t.startswith('"') and t == "Include":
                inc = os.path.join(scene_dir, unquote(next(it)))
                consume(list(tokenize_file(inc)), os.path.dirname(inc))
            elif not t.startswith('"') and t in _DIRECTIVES:
                groups.append([t])
            elif groups:
                groups[-1].append(t)

    consume(toks, os.path.dirname(os.path.abspath(path)))
    lines = []
    indent = 0
    n_ply = 0
    base = os.path.splitext(out or path)[0]
    for g in groups:
        name = g[0]
        if toply and name == "Shape" and len(g) > 1 \
                and unquote(g[1]) == "trianglemesh":
            g, n_ply = _shape_to_ply(g, base, n_ply)
        if name in ("AttributeEnd", "TransformEnd", "ObjectEnd",
                    "WorldEnd"):
            indent = max(indent - 1, 0)
        body = " ".join(g)
        lines.append("    " * indent + body)
        if name in ("AttributeBegin", "TransformBegin", "ObjectBegin",
                    "WorldBegin"):
            indent += 1
    text = "\n".join(lines) + "\n"
    if out:
        with open(out, "w") as f:
            f.write(text)
    else:
        sys.stdout.write(text)
    return 0


def _shape_to_ply(g, base, n_ply):
    """Extract P/indices/N/uv params from a trianglemesh directive group
    and write them to a .ply (reference WritePlyFile, triangle.cpp:112)."""
    from pbrt_tpu.shapes.ply import write_ply
    from pbrt_tpu.parser.tokenizer import unquote
    # parse "type name" [ values ] pairs
    params = {}
    rest = []
    i = 1
    while i < len(g):
        if g[i].startswith('"') and i + 1 < len(g) and g[i + 1] == "[":
            j = g.index("]", i + 1)
            params[unquote(g[i])] = g[i + 2:j]
            i = j + 1
        else:
            rest.append(g[i])
            i += 1
    pkey = next((k for k in params if k.split()[-1] == "P"), None)
    ikey = next((k for k in params if k.split()[-1] == "indices"), None)
    if pkey is None or ikey is None:
        return g, n_ply
    verts = np.asarray([float(x) for x in params.pop(pkey)],
                       np.float32).reshape(-1, 3)
    faces = np.asarray([int(float(x)) for x in params.pop(ikey)],
                       np.int32).reshape(-1, 3)
    norms = uvs = None
    nkey = next((k for k in params if k.split()[-1] == "N"), None)
    ukey = next((k for k in params if k.split()[-1] in ("uv", "st")), None)
    if nkey:
        norms = np.asarray([float(x) for x in params.pop(nkey)],
                           np.float32).reshape(-1, 3)
    if ukey:
        uvs = np.asarray([float(x) for x in params.pop(ukey)],
                         np.float32).reshape(-1, 2)
    ply_path = f"{base}_mesh{n_ply:05d}.ply"
    write_ply(ply_path, verts, faces, norms=norms, uvs=uvs)
    ng = ["Shape", '"plymesh"', '"string filename"',
          f'"{os.path.basename(ply_path)}"']
    for k, v in params.items():
        ng += [f'"{k}"', "["] + list(v) + ["]"]
    return ng, n_ply + 1


def run_job(job, spp=None, max_depth=None, quiet=False,
            max_rays_per_pass=1 << 18, progress=True,
            checkpoint_path=None, checkpoint_every=60.0,
            sampler_override=None, stats=None):
    """Render a RenderJob -> (film, integrator_kind).

    sampler_override="refsobol" selects the matched-RNG parity mode
    (integrators/refpath.py): pbrt's exact GlobalSampler Sobol stream +
    reference-exact estimator structure, pixel-level comparable to the
    reference binary at equal spp."""
    from pbrt_tpu.film import film as filmmod
    from pbrt_tpu.integrators import path as pathint
    from pbrt_tpu.integrators import dispatch
    from pbrt_tpu.samplers.samplers import SamplerConfig

    W, H = job.film_width, job.film_height
    camera = build_camera(job, W, H)
    fp = dict(job.filter_params)
    radius = fp.pop("radius", None)
    film = filmmod.make_film(W, H, job.filter_name, radius=radius, **fp)
    spp = spp or job.spp
    cfg = SamplerConfig(kind=job.sampler_kind, seed=0, spp=spp)
    max_depth = max_depth or job.integrator_params["maxdepth"]
    if sampler_override == "refsobol":
        from pbrt_tpu.integrators import refpath
        from pbrt_tpu.cameras import projective
        film = refpath.render_ref(
            job.scene, camera, film, W, H, spp, max_depth=max_depth,
            generate_rays=projective.generate_rays,
            max_rays_per_pass=min(max_rays_per_pass, 1 << 17))
        return film, camera

    t0 = time.time()
    last = [0.0]

    def prog(done, total):
        if quiet or not progress:
            return
        now = time.time()
        if now - last[0] > 5.0 or done == total:
            eta = (now - t0) / max(done, 1) * (total - done)
            print(f"\r  [{done}/{total} passes, {now-t0:.0f}s, "
                  f"eta {eta:.0f}s]", end="", flush=True)
            last[0] = now

    film = dispatch.render_with_integrator(
        job, camera, film, cfg, spp, max_depth,
        max_rays_per_pass=max_rays_per_pass, progress=prog,
        checkpoint_path=checkpoint_path, checkpoint_every=checkpoint_every,
        stats=stats)
    if not quiet and progress:
        print()
    return film, camera


def write_outputs(job, film, outfile=None, quiet=False):
    import jax
    from pbrt_tpu.film import film as filmmod
    from pbrt_tpu.film import io as fio
    out = outfile or job.film_filename
    # jit the develop: eager per-op dispatch over the axon tunnel costs
    # tens of seconds for a 700x700x31 film
    rgb = np.asarray(jax.jit(filmmod.develop_rgb)(film)) * job.film_scale
    rgb = np.maximum(rgb, 0.0)
    written = []
    try:
        written.append(fio.write_image(out, rgb))
    except ValueError:
        written.append(fio.write_png(os.path.splitext(out)[0] + ".png", rgb))
    if job.spectral_flag:
        written.append(fio.write_dat(
            out, np.asarray(film.raw), scale=job.film_scale))
    # fork metadata sidecars (api.cpp:1630-1689)
    base = os.path.splitext(out)[0]
    with open(base + "_mesh.txt", "w") as f:
        for iid, name in sorted(job.instance_names.items()):
            f.write(f"{iid} {name}\n")
    with open(base + "_materials.txt", "w") as f:
        for mid, name in sorted(job.material_names.items()):
            f.write(f"{mid} {name}\n")
    written += [base + "_mesh.txt", base + "_materials.txt"]
    if not quiet:
        for w in written:
            print(f"wrote {w}")
    return written


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="pbrt_tpu",
        description="TPU-native spectral path tracer (pbrt-compatible)")
    ap.add_argument("scene", help=".pbrt scene file")
    ap.add_argument("--outfile", "-o", default=None)
    ap.add_argument("--quick", action="store_true",
                    help="reduce spp to 1 and depth to 3 (reference --quick)")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--spp", type=int, default=None)
    ap.add_argument("--maxdepth", type=int, default=None)
    ap.add_argument("--cropwindow", type=float, nargs=4, default=None)
    ap.add_argument("--sampler", default=None, choices=["refsobol"],
                    help="override the scene sampler; 'refsobol' runs "
                         "the matched-RNG parity integrator (pbrt-exact "
                         "Sobol stream + estimator structure)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--nthreads", type=int, default=0,
                    help="accepted for reference CLI parity (ignored: "
                         "parallelism is the device mesh)")
    ap.add_argument("--checkpoint", default=None, metavar="FILE",
                    help="periodically save film state to FILE and "
                         "auto-resume from it (new capability: the "
                         "reference writes film only at render end)")
    ap.add_argument("--checkpoint-interval", type=float, default=60.0,
                    metavar="SEC", help="seconds between checkpoints")
    ap.add_argument("--cat", action="store_true",
                    help="pretty-print the parsed scene and exit "
                         "(reference parser --cat)")
    ap.add_argument("--toply", action="store_true",
                    help="like --cat but spill inline triangle meshes "
                         "to .ply sidecars (reference parser --toply)")
    args = ap.parse_args(argv)

    if args.cat or args.toply:
        return cat_scene(args.scene, out=args.outfile, toply=args.toply)

    logging.basicConfig(level=logging.WARNING if args.quiet
                        else logging.INFO, format="%(message)s")
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from pbrt_tpu.parser.api import parse_scene
    from pbrt_tpu.utils.stats import Stats, count_scene
    stats = Stats()
    with stats.phase("Parsing + scene compile"):
        job = parse_scene(args.scene)
    if not args.quiet:
        print(f"parsed + compiled scene in "
              f"{stats.times['Parsing + scene compile']:.1f}s "
              f"({job.scene.n_prims} prims, {job.scene.n_nodes} BVH nodes, "
              f"{job.scene.n_lights} lights)")
    spp = 1 if args.quick else args.spp
    max_depth = 3 if args.quick else args.maxdepth
    with stats.phase("Rendering"):
        film, camera = run_job(job, spp=spp, max_depth=max_depth,
                               quiet=args.quiet,
                               checkpoint_path=args.checkpoint,
                               checkpoint_every=args.checkpoint_interval,
                               sampler_override=args.sampler, stats=stats)
        # drain async dispatches so the phase accounting is honest
        # (otherwise the render work completes inside "Film output")
        import jax
        jax.block_until_ready(film.weighted)
    dt = stats.times["Rendering"]
    count_scene(stats, job.scene.n_prims, job.scene.n_lights,
                job.scene.n_nodes)
    if not args.quiet:
        # measured counters when the integrator reported them; the
        # W*H*spp product only as a fallback label
        n_rays = (stats.counters.get("Intersections/Regular ray "
                                     "intersection tests", 0)
                  + stats.counters.get("Intersections/Shadow ray "
                                       "intersection tests", 0))
        if not n_rays:
            n_rays = job.film_width * job.film_height * (spp or job.spp)
        print(f"rendered in {dt:.1f}s ({n_rays/dt:,.0f} rays/s)")
    with stats.phase("Film output"):
        write_outputs(job, film, args.outfile, args.quiet)
    if not args.quiet:
        stats.report()
    return 0


if __name__ == "__main__":
    sys.exit(main())
