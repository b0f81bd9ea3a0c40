"""Spectrum layer tests (model: reference src/tests/spectrum.cpp)."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import spectrum as spec


def test_bin_layout():
    assert spec.N_SPECTRAL_SAMPLES == 31
    assert spec.BIN_EDGES[0] == 395.0 and spec.BIN_EDGES[-1] == 705.0
    assert np.isclose(spec.BIN_WIDTH, 10.0)


def test_cie_y_peak():
    # ybar peaks near 555 nm with value ~1
    x, y, z = spec.cie_xyz_bar(np.linspace(380, 780, 401))
    lam = np.linspace(380, 780, 401)
    assert abs(lam[np.argmax(y)] - 555) < 5
    assert 0.95 < y.max() < 1.05


def test_rgb_spectrum_roundtrip():
    """from_rgb -> to_rgb must reproduce the REFERENCE's own roundtrip:
    pbrt's Smits tables do not invert exactly (their FromRGB->ToRGB of
    white is (1.200, 0.947, 0.905)); these expectations were printed by
    the reference binary itself (SampledSpectrum::FromRGB + ToRGB,
    spectrum.cpp:97-176, PBRT_SAMPLED_SPECTRUM build)."""
    rgbs = np.array([[1, 1, 1], [0.5, 0.5, 0.5], [0.9, 0.1, 0.1],
                     [0.1, 0.8, 0.3], [0.2, 0.3, 0.9], [0.0, 0.0, 0.0]],
                    dtype=np.float32)
    ref = np.array([[1.2002, 0.9472, 0.9050], [0.6001, 0.4736, 0.4525],
                    [1.0487, 0.0904, 0.0889], [0.1504, 0.7607, 0.2780],
                    [0.2441, 0.2846, 0.8094], [0.0, 0.0, 0.0]])
    s = spec.from_rgb(jnp.asarray(rgbs), "reflectance")
    back = np.asarray(spec.to_rgb(s))
    assert np.allclose(back, ref, atol=2e-3), back


def test_white_is_flat_ish():
    s = np.asarray(spec.from_rgb(jnp.array([1.0, 1.0, 1.0]), "reflectance"))
    assert s.min() > 0.5 and s.max() < 1.5


def test_luminance_of_equal_energy():
    # luminance of flat unit spectrum should be ~1 (CIE_Y normalization)
    s = spec.constant(1.0)
    assert np.isclose(float(spec.luminance(s)), 1.0, atol=1e-5)


def test_blackbody_wien():
    # 6000K peak near 483nm; normalized max 1 at peak
    lam = np.linspace(300, 1000, 1401)
    b = spec.blackbody_normalized(lam, 6000.0)
    assert abs(lam[np.argmax(b)] - 482.9) < 3
    assert np.isclose(b.max(), 1.0, atol=1e-3)


def test_from_sampled_constant():
    lam = np.array([300.0, 800.0])
    v = np.array([2.5, 2.5])
    s = spec.from_sampled(lam, v)
    assert np.allclose(s, 2.5)


def test_from_sampled_linear_ramp():
    lam = np.linspace(395, 705, 32)
    v = lam / 705.0
    s = spec.from_sampled(lam, v)
    assert np.allclose(s, spec.BIN_CENTERS / 705.0, atol=1e-3)


def test_resample_linear():
    # fork's ResampleLinearSpectrum: identity when grids match
    v = np.sin(np.linspace(0, 3, 31))
    out = spec.resample_linear(v, 395, 705, 31)
    assert np.allclose(out, v)
    up = spec.resample_linear(v, 395, 705, 61)
    back = spec.resample_linear(up, 395, 705, 31)
    assert np.allclose(back, v, atol=1e-3)


def test_value_at_wavelength():
    s = jnp.asarray(np.linspace(0, 1, 31, dtype=np.float32))
    v = spec.value_at_wavelength(s, jnp.array([550.0]))
    expected = np.interp(550.0, spec.BIN_CENTERS, np.linspace(0, 1, 31))
    assert np.isclose(float(v[0]), expected, atol=1e-5)


def test_display_white():
    s = spec.from_rgb(jnp.array([1.0, 1.0, 1.0]), "display")
    rgb = np.asarray(spec.to_rgb(s))
    assert np.allclose(rgb, 1.0, atol=0.02), rgb
