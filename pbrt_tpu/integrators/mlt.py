"""Primary-sample-space Metropolis light transport (reference:
src/integrators/mlt.cpp, PSSMLT over the path-space target).

The reference runs `nChains` independent Markov chains with per-stream
lazily-mutated primary samples (MLTSampler, mlt.h:53-105).  Wavefront
version: all chains advance in lockstep — the chain state is a dense
[C, D] matrix of primary-space uniforms, a mutation is a vectorized
Kelemen small-step (exponential-scale Gaussian, wrapped mod 1) or large
step (fresh uniforms), and the path contribution is evaluated by the
standard wavefront `trace_paths` in supplied-uniforms mode.  Acceptance,
Kelemen MIS weighting of current+proposed states, and film splatting are
all per-lane arithmetic; the bootstrap phase estimates the normalization
b = E[I] and seeds chains by resampling bootstrap paths by luminance
(mlt.cpp:?-bootstrap loop).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.core import rng as prng
from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.core import sampling as smp
from pbrt_tpu.integrators import path as pathmod
from pbrt_tpu.samplers.samplers import SamplerConfig
from pbrt_tpu.film import film as filmmod


def _n_dims(max_depth):
    return pathmod.DIM_BOUNCE_BASE + (max_depth + 1) * \
        pathmod.DIMS_PER_BOUNCE


def render_mlt(scene, camera, W, H, n_chains=8192, mutations_per_chain=64,
               n_bootstrap=65536, sigma=0.01, large_step_prob=0.3,
               max_depth=5, generate_rays=None, progress=None, seed=0):
    """Returns ([H,W,31] radiance, b) — image normalized like the
    reference (film scale b / mutationsPerPixel, mlt.cpp Render)."""
    from pbrt_tpu.cameras import projective
    if generate_rays is None:
        generate_rays = projective.generate_rays
    D = _n_dims(max_depth)
    cfg = SamplerConfig("independent", seed, 1)
    NS = spec.N_SPECTRAL_SAMPLES

    def eval_C(u):
        """u [C,D] -> (L [C,31], pfilm [C,2], weight)"""
        C = u.shape[0]
        pfilm = jnp.stack([u[:, 0] * W, u[:, 1] * H], -1)
        ulens = u[:, 2:4]
        ray, weight = generate_rays(camera, pfilm, ulens,
                                    width=W, height=H)
        pid = jnp.zeros(C, jnp.uint32)
        L = pathmod.trace_paths(scene, ray, pid, jnp.uint32(0), cfg,
                                max_depth=max_depth, uniforms=u)
        return L * weight[:, None], pfilm

    def lum(L):
        return spec.luminance(L)

    # ---- bootstrap: estimate b and seed chains -------------------------
    def uniforms_for(ids, it, salt):
        cols = [prng.uniform_float(ids, jnp.uint32(it),
                                   prng._u32(salt + 131 * d))
                for d in range(D)]
        return jnp.stack(cols, -1)

    boot_ids = jnp.arange(n_bootstrap, dtype=jnp.uint32)
    u_boot = uniforms_for(boot_ids, 0, 0x11)
    L_boot, _ = jax.jit(eval_C)(u_boot)
    I_boot = lum(L_boot)
    b = float(jnp.mean(I_boot))
    if b <= 0:
        return jnp.zeros((H, W, NS)), 0.0
    # resample chain seeds proportional to luminance (bootstrap table)
    cdf, fint = smp.build_distribution_1d(I_boot)
    u_sel = prng.uniform_float(jnp.arange(n_chains, dtype=jnp.uint32),
                               jnp.uint32(7), prng._u32(0x77))
    seed_idx, _ = smp.sample_distribution_1d_discrete(cdf, fint, I_boot,
                                                      u_sel)
    u_cur = u_boot[seed_idx]
    L_cur, pf_cur = jax.jit(eval_C)(u_cur)
    I_cur = lum(L_cur)

    film = filmmod.make_film(W, H, "box")

    @jax.jit
    def mutate_step(state, it):
        u_cur, L_cur, pf_cur, I_cur, film_splat = state
        ids = jnp.arange(n_chains, dtype=jnp.uint32)
        # proposal: Kelemen small step (exp-scale gaussian wrap) or large
        u_ls = prng.uniform_float(ids, it, prng._u32(0x500))
        is_large = u_ls < large_step_prob
        fresh = uniforms_for(ids, it, 0x900)
        # small-step perturbation per dim
        cols = []
        for d in range(D):
            e1 = prng.uniform_float(ids, it, prng._u32(0xA00 + 131 * d))
            e2 = prng.uniform_float(ids, it, prng._u32(0xB37 + 131 * d))
            # exponentially distributed magnitude (Kelemen mutation size)
            s = sigma * jnp.exp(-jnp.log(64.0) * e1)
            delta = jnp.where(e2 < 0.5, s * 2 * e2, -s * (2 * e2 - 1))
            cols.append((u_cur[:, d] + delta) % 1.0)
        u_small = jnp.stack(cols, -1)
        u_prop = jnp.where(is_large[:, None], fresh, u_small)
        L_prop, pf_prop = eval_C(u_prop)
        I_prop = lum(L_prop)
        a = jnp.clip(I_prop / jnp.maximum(I_cur, 1e-12), 0.0, 1.0)
        # Kelemen MIS weights for both states (mlt.cpp splat pair)
        w_prop = (a + is_large) / jnp.maximum(
            I_prop / b + large_step_prob, 1e-12)
        w_cur = (1.0 - a) / jnp.maximum(
            I_cur / b + large_step_prob, 1e-12)
        f2 = filmmod.add_splats(
            filmmod.Film(weighted=film_splat * 0, weight=film_splat[..., 0] * 0,
                         raw=film_splat * 0, splat=film_splat,
                         filter_table=film.filter_table, radius=film.radius,
                         height=H, width=W, footprint=1),
            pf_prop, L_prop * w_prop[:, None])
        f2 = filmmod.add_splats(f2, pf_cur, L_cur * w_cur[:, None])
        film_splat = f2.splat
        # accept
        u_acc = prng.uniform_float(ids, it, prng._u32(0xC11))
        acc = u_acc < a
        u_cur = jnp.where(acc[:, None], u_prop, u_cur)
        L_cur = jnp.where(acc[:, None], L_prop, L_cur)
        pf_cur = jnp.where(acc[:, None], pf_prop, pf_cur)
        I_cur = jnp.where(acc, I_prop, I_cur)
        return (u_cur, L_cur, pf_cur, I_cur, film_splat), None

    state = (u_cur, L_cur, pf_cur, I_cur,
             jnp.zeros((H, W, NS)))
    for it in range(mutations_per_chain):
        state, _ = mutate_step(state, jnp.uint32(it + 1))
        if progress:
            progress(it + 1, mutations_per_chain)
    splat = state[4]
    n_total = n_chains * mutations_per_chain
    # E_u[C_j] estimated by the Kelemen-weighted splats / n_total;
    # pixel value = npix * integral over its share of primary space
    img = splat * (W * H / n_total)
    return img, b
