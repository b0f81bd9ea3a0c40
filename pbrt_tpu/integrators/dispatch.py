"""Integrator selection (reference dispatch: api.cpp:1764-1789)."""

from __future__ import annotations

import logging

from pbrt_tpu.integrators import path as pathmod

log = logging.getLogger("pbrt_tpu")


def render_with_integrator(job, camera, film, cfg, spp, max_depth,
                           max_rays_per_pass=1 << 18, progress=None,
                           checkpoint_path=None, checkpoint_every=60.0,
                           stats=None):
    kind = job.integrator_kind
    ip = job.integrator_params
    trace_fn = None
    trace_kwargs = {}
    strat = {"uniform": "uniform", "power": "power",
             "spatial": "spatial"}.get(
        ip.get("lightsamplestrategy", "spatial"), "spatial")
    if kind == "lighttracer":
        from pbrt_tpu.integrators import lighttracer
        film, scale = lighttracer.render_lighttracer(
            job.scene, camera, film, cfg, spp, max_depth=max_depth,
            progress=progress)
        # fold the photon-count normalization into the splat buffer so
        # downstream develop() needs no separate splat scale
        return film.replace(splat=film.splat * scale)
    if kind == "mlt":
        from pbrt_tpu.integrators import mlt as mlt_mod
        import jax.numpy as jnp
        img, b = mlt_mod.render_mlt(
            job.scene, camera, film.width, film.height,
            n_chains=ip.get("chains", 4096) or 4096,
            mutations_per_chain=max(spp, 8) * 8,
            n_bootstrap=ip.get("bootstrapsamples", 65536) or 65536,
            sigma=ip.get("sigma", 0.01), max_depth=max_depth,
            large_step_prob=ip.get("largestepprobability", 0.3),
            generate_rays=_generate_fn(camera), progress=progress)
        return film.replace(weighted=img, raw=img,
                            weight=jnp.ones_like(film.weight))
    if kind == "sppm":
        from pbrt_tpu.integrators import sppm as sppm_mod
        import jax.numpy as jnp
        ip2 = job.integrator_params
        L = sppm_mod.render_sppm(
            job.scene, camera, film.width, film.height, cfg,
            n_iterations=max(spp, 4),
            initial_radius=ip2.get("radius", None),
            max_depth=max_depth, generate_rays=_generate_fn(camera),
            progress=progress)
        # present as a resolved film (weight 1, raw = L for .dat parity)
        return film.replace(weighted=L, raw=L,
                            weight=jnp.ones_like(film.weight))
    if kind == "bdpt":
        from pbrt_tpu.integrators import bdpt as bdpt_mod
        film, scale = bdpt_mod.render_bdpt(
            job.scene, camera, film, cfg, spp, max_depth=max_depth,
            generate_rays=_generate_fn(camera), progress=progress)
        return film.replace(splat=film.splat * scale)
    if kind in ("path", "volpath", "whitted", "directlighting"):
        if kind == "volpath" and job.media:
            from pbrt_tpu.integrators import volpath
            trace_fn = volpath.make_trace_volpath(job)
        if trace_fn is None and kind not in ("volpath",):
            trace_kwargs["light_strategy"] = strat
        if kind == "directlighting":
            max_depth = min(max_depth, 1)
            # reference DirectLightingIntegrator strategy param
            # (directlighting.cpp:112; default "all" = UniformSampleAll)
            dl = ip.get("strategy", "all")
            trace_kwargs["light_strategy"] = ("all" if dl == "all"
                                              else strat)
        if kind == "whitted":
            from pbrt_tpu.integrators import whitted
            trace_fn = whitted.make_trace_whitted()
    elif kind == "spectralpath":
        from pbrt_tpu.integrators import spectralpath
        gen = _generate_fn(camera)
        trace_fn = spectralpath.make_trace_spectral(
            num_ca_bands=ip.get("numCABands", 4), camera=camera,
            generate_rays=gen, width=film.width, height=film.height)
    elif kind == "metadata":
        from pbrt_tpu.integrators import metadata
        trace_fn = metadata.make_trace_metadata(ip.get("strategy", "depth"))
    elif kind in ("ambientocclusion", "ao"):
        from pbrt_tpu.integrators import ao
        trace_fn = ao.make_trace_ao(cos_sample=ip.get("cossample", True))
    else:
        log.warning("unknown integrator %r; using path", kind)
    from pbrt_tpu.film.film import INF_LUMINANCE
    msl = getattr(job, "max_sample_luminance", None)
    return pathmod.render(job.scene, camera, film, cfg, spp, stats=stats,
                          max_depth=max_depth, trace_fn=trace_fn,
                          generate_rays=_generate_fn(camera),
                          progress=progress,
                          max_rays_per_pass=max_rays_per_pass,
                          trace_kwargs=trace_kwargs,
                          crop_window=job.crop_window,
                          max_sample_luminance=(
                              None if msl is None or msl >= INF_LUMINANCE
                              else msl),
                          checkpoint_path=checkpoint_path,
                          checkpoint_every=checkpoint_every)


def _generate_fn(camera):
    from pbrt_tpu.cameras.lens import LensCamera, generate_rays as lens_gen
    from pbrt_tpu.cameras.projective import generate_rays as proj_gen
    return lens_gen if isinstance(camera, LensCamera) else proj_gen
