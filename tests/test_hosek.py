"""Hosek-Wilkie sky model tests (reference ext/ArHosekSkyModel.c via
imgtool makesky, tools/imgtool.cpp:87-188)."""
import numpy as np
import pytest

from pbrt_tpu.lights import hosek


def _state(elev_deg=30.0, t=3.0, a=0.5):
    return hosek.sky_model_state(np.radians(elev_deg), t, a)


def test_sky_radiance_positive_and_sun_peaked():
    st = _state()
    lam = 560.0
    # looking near the sun is brighter than away from it (same theta)
    near = hosek.sky_radiance(st, np.radians(60.0), np.radians(3.0), lam)
    far = hosek.sky_radiance(st, np.radians(60.0), np.radians(120.0), lam)
    assert near > far > 0


def test_sky_is_blue():
    """Clear sky away from the sun: 460nm radiance > 630nm radiance."""
    st = _state(elev_deg=40.0, t=2.0)
    theta = np.radians(50.0)
    gamma = np.radians(90.0)
    blue = hosek.sky_radiance(st, theta, gamma, 460.0)
    red = hosek.sky_radiance(st, theta, gamma, 630.0)
    assert blue > red, (blue, red)


def test_turbidity_continuity():
    """Config interpolation is continuous across integer turbidity."""
    theta, gamma, lam = np.radians(45.0), np.radians(30.0), 560.0
    lo = hosek.sky_radiance(_state(t=2.999), theta, gamma, lam)
    hi = hosek.sky_radiance(_state(t=3.001), theta, gamma, lam)
    assert abs(lo - hi) < 0.01 * max(abs(lo), 1e-9), (lo, hi)


def test_solar_disc_dominates_sky():
    """Inside the solar disc the direct term is orders of magnitude
    brighter than the surrounding sky."""
    st = _state(elev_deg=30.0)
    theta = np.pi / 2 - st["elevation"]        # looking at the sun
    disc = hosek.solar_radiance(st, theta, 0.0, 560.0)
    sky = hosek.sky_radiance(st, theta, np.radians(5.0), 560.0)
    assert disc > 100.0 * sky, (disc, sky)
    # outside the disc the direct term vanishes
    outside = hosek.solar_disc_radiance(st, 560.0, st["elevation"],
                                        np.radians(1.0))
    assert outside == 0.0


def test_make_sky_image_properties():
    img = hosek.make_sky_image(resolution=32, turbidity=3.0,
                               elevation_deg=20.0)
    assert img.shape == (32, 64, 3)
    assert np.isfinite(img).all() and (img >= 0).all()
    H = img.shape[0]
    assert img[H // 2 + 2:].max() == 0.0     # below horizon: black
    sky_rows = img[:H // 2]
    assert sky_rows.max() > 0
    # away-from-sun sky pixels are blue-dominant
    far_px = img[H // 4, 48]                 # phi ~ 3π/2, away from sun
    assert far_px[2] > far_px[0], far_px
    # at 32px the 0.5-degree solar disc falls between pixel centers —
    # check it at a resolution fine enough to catch it
    img_hi = hosek.make_sky_image(resolution=512, turbidity=3.0,
                                  elevation_deg=20.0)
    nz = img_hi[img_hi.sum(-1) > 0]
    assert img_hi.max() > 100 * np.median(nz), \
        (img_hi.max(), np.median(nz))


def test_makesky_cli(tmp_path):
    from pbrt_tpu.tools import imgtool
    out = str(tmp_path / "sky.pfm")
    assert imgtool.main(["makesky", out, "--resolution", "16",
                         "--elevation", "25"]) == 0
    from pbrt_tpu.film import io as fio
    img = fio.read_image(out)
    assert img.shape[0] == 16 and img.shape[1] == 32
    assert np.isfinite(img).all()
