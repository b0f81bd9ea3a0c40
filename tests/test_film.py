"""Film splat paths: the aligned dynamic-slice fast path must match the
general scatter-add exactly (film.py add_samples / _add_samples_aligned)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.film import film as fm


@pytest.mark.parametrize("filt,rad", [("box", None),
                                      ("gaussian", (0.45, 0.45))])
def test_aligned_splat_matches_scatter(filt, rad):
    W, H = 16, 8
    B = W * H
    rng = np.random.RandomState(0)
    film1 = fm.make_film(W, H, filt, radius=rad)
    film2 = fm.make_film(W, H, filt, radius=rad)
    pid = np.arange(B)
    pfilm = jnp.asarray(np.stack([pid % W + rng.rand(B),
                                  pid // W + rng.rand(B)], -1), jnp.float32)
    L = jnp.asarray(rng.rand(B, 31), jnp.float32)
    wgt = jnp.asarray(rng.rand(B), jnp.float32)
    a = fm.add_samples(film1, pfilm, L, wgt)
    b = fm.add_samples(film2, pfilm, L, wgt, aligned_base=jnp.uint32(0))
    for f in ("weighted", "weight", "raw"):
        np.testing.assert_allclose(np.asarray(getattr(a, f)),
                                   np.asarray(getattr(b, f)), atol=1e-5)


def test_aligned_splat_nonzero_base():
    W, H = 8, 8
    B = 16
    base = 24
    rng = np.random.RandomState(1)
    film1 = fm.make_film(W, H, "box")
    film2 = fm.make_film(W, H, "box")
    pid = base + np.arange(B)
    pfilm = jnp.asarray(np.stack([pid % W + rng.rand(B),
                                  pid // W + rng.rand(B)], -1), jnp.float32)
    L = jnp.asarray(rng.rand(B, 31), jnp.float32)
    a = fm.add_samples(film1, pfilm, L)
    b = fm.add_samples(film2, pfilm, L, aligned_base=jnp.uint32(base))
    np.testing.assert_allclose(np.asarray(a.weighted),
                               np.asarray(b.weighted), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.weight),
                               np.asarray(b.weight), atol=1e-5)


def test_triangle_filter_footprint_keeps_scatter_path():
    # footprint>1 filters must ignore aligned_base (different pixels)
    W, H = 8, 8
    B = W * H
    rng = np.random.RandomState(2)
    film1 = fm.make_film(W, H, "triangle")
    film2 = fm.make_film(W, H, "triangle")
    pid = np.arange(B)
    pfilm = jnp.asarray(np.stack([pid % W + rng.rand(B),
                                  pid // W + rng.rand(B)], -1), jnp.float32)
    L = jnp.asarray(rng.rand(B, 31), jnp.float32)
    a = fm.add_samples(film1, pfilm, L)
    b = fm.add_samples(film2, pfilm, L, aligned_base=jnp.uint32(0))
    np.testing.assert_allclose(np.asarray(a.weighted),
                               np.asarray(b.weighted), atol=1e-6)
