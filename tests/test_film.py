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


def test_exr_piz_pxr24_b44_read():
    """PIZ / PXR24 / B44 EXRs decode through the native OpenEXR shim
    (native/exr_reader.cc; the reference reads every EXR via OpenEXR,
    imageio.cpp:124+).  Fixtures written by OpenEXR itself with a known
    pattern."""
    import os
    import numpy as np
    import pytest
    from pbrt_tpu.film import io as fio
    from pbrt_tpu.native.build import load_exr

    if load_exr() is None:
        pytest.skip("system OpenEXR unavailable")
    base = os.path.join(os.path.dirname(__file__), "data")
    w, h = 37, 23
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    want_r = (xs * 0.25 + ys).astype(np.float32)
    want_b = (ys * 0.5).astype(np.float32)
    for name, tol in [("exr_piz.exr", 1e-3), ("exr_pxr24.exr", 1e-2),
                      ("exr_b44.exr", 0.2)]:
        img = fio.read_exr(os.path.join(base, name))
        assert img.shape == (h, w, 3), name
        # half precision + lossy-for-b44 tolerances, relative to scale
        scale = np.maximum(np.abs(want_r), 1.0)
        assert (np.abs(img[..., 0] - want_r) / scale).max() < tol, name
        assert (np.abs(img[..., 2] - want_b)
                / np.maximum(want_b, 1.0)).max() < tol, name
