"""Analytic end-to-end integrator tests.

Model: reference src/tests/analytic_scenes.cpp — programmatically built
scenes with closed-form expected radiance, crossed over samplers, asserted
on mean pixel value (CheckSceneAverage, :54-66, delta=.02)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.scene.ir import (SceneBuilder, MaterialSpec, MAT_MATTE,
                               MAT_MIRROR, MAT_PLASTIC, MAT_GLASS)
from pbrt_tpu.core import spectrum as spec, transform as tfm, geometry as geom
from pbrt_tpu.cameras import projective
from pbrt_tpu.film import film as filmmod
from pbrt_tpu.integrators import path as pathint
from pbrt_tpu.samplers.samplers import SamplerConfig


def _render(scene, cam, n=24, spp=16, sampler="sobol", max_depth=5, seed=0):
    film = filmmod.make_film(n, n, "box")
    cfg = SamplerConfig(kind=sampler, seed=seed, spp=spp)
    film = pathint.render(scene, cam, film, cfg, spp=spp, max_depth=max_depth)
    return np.asarray(filmmod.develop_spectral(film))


def _furnace_scene(albedo, le=1.0, mat_type=MAT_MATTE, **mat_kw):
    b = SceneBuilder()
    m = b.add_material(MaterialSpec(
        type=mat_type, kd=np.full(31, albedo, np.float32), **mat_kw))
    b.add_sphere(tfm.Transform(), 1.0, m)
    b.add_infinite_light(np.full(31, le, np.float32))
    return b.build()


def _cam(n=24, dist=4.0, fov=30.0):
    return projective.make_perspective(
        tfm.look_at([0, 0, -dist], [0, 0, 0], [0, 1, 0]), fov, n, n)


@pytest.mark.parametrize("sampler", ["sobol", "independent", "halton",
                                     "stratified", "zerotwosequence",
                                     "maxmindist"])
def test_furnace_half_albedo(sampler):
    # convex lambertian in uniform env: Lo = albedo * Le exactly
    scene = _furnace_scene(0.5)
    img = _render(scene, _cam(), sampler=sampler)
    center = img[8:16, 8:16].mean()
    assert abs(center - 0.5) < 0.02, (sampler, center)


def test_furnace_white_is_invisible():
    scene = _furnace_scene(1.0)
    img = _render(scene, _cam(), spp=32, max_depth=8)
    assert abs(img.mean() - 1.0) < 0.02, img.mean()


def test_mirror_in_furnace_invisible():
    b = SceneBuilder()
    m = b.add_material(MaterialSpec(type=MAT_MIRROR,
                                    kr=np.ones(31, np.float32)))
    b.add_sphere(tfm.Transform(), 1.0, m)
    b.add_infinite_light(np.ones(31, np.float32))
    scene = b.build()
    img = _render(scene, _cam(), spp=8, max_depth=8)
    assert abs(img.mean() - 1.0) < 0.02, img.mean()


def test_point_light_direct():
    # lambertian floor z=0, point light at (0,0,1) intensity I:
    # L(x) = rho/pi * I * cos/r^2 at floor point x
    b = SceneBuilder()
    m = b.add_material(MaterialSpec(type=MAT_MATTE,
                                    kd=np.full(31, 0.6, np.float32)))
    b.add_triangle_mesh([[-50, -50, 0], [50, -50, 0], [50, 50, 0],
                         [-50, 50, 0]], [[0, 1, 2], [2, 3, 0]], m)
    b.add_point_light([0, 0, 1], np.full(31, 10.0, np.float32))
    scene = b.build()
    # orthographic straight down, 2x2 window centered at origin
    cam = projective.make_orthographic(
        tfm.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0]), 24, 24,
        screen=(-1, 1, -1, 1))
    img = _render(scene, cam, spp=8, max_depth=2)
    # center pixel: directly under light: r=1, cos=1
    expected_center = 0.6 / np.pi * 10.0
    got = img[11:13, 11:13].mean()
    assert abs(got - expected_center) / expected_center < 0.02, got
    # off-center analytic check at film coords ~ (0.5, 0.0):
    # point (0.5,0,0): r^2 = 1.25, cos = 1/sqrt(1.25)
    r2 = 1.25
    expected_off = 0.6 / np.pi * 10.0 / r2 / np.sqrt(r2)
    col = int((0.5 + 1) / 2 * 24)  # film x for world x=0.5
    got_off = img[11:13, col - 1:col + 1].mean()
    assert abs(got_off - expected_off) / expected_off < 0.05, (got_off,
                                                              expected_off)


def test_sphere_area_light_vs_point_limit():
    # tiny emissive sphere ~ point light with I = L * pi * r^2... check
    # against analytic: L_floor = rho/pi * Le * (solid-angle integral)
    # For small r: irradiance E = Le * pi * r^2 * cos / d^2
    rho, Le, r = 0.6, 100.0, 0.05
    b = SceneBuilder()
    m = b.add_material(MaterialSpec(type=MAT_MATTE,
                                    kd=np.full(31, rho, np.float32)))
    black = b.add_material(MaterialSpec(type=MAT_MATTE))
    b.add_triangle_mesh([[-50, -50, 0], [50, -50, 0], [50, 50, 0],
                         [-50, 50, 0]], [[0, 1, 2], [2, 3, 0]], m)
    li = b.add_area_light(np.full(31, Le, np.float32))
    b.add_sphere(tfm.translate(0, 0, 1), r, black, light_id=li)
    scene = b.build()
    cam = projective.make_orthographic(
        tfm.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0]), 24, 24,
        screen=(-1, 1, -1, 1))
    img = _render(scene, cam, spp=64, max_depth=2)
    # measure off-axis (center pixels see the emissive sphere itself):
    # floor point x: d^2 = 1+x^2, cos = 1/sqrt(1+x^2)
    cols = [17, 18]
    xs = [((c + 0.5) / 24) * 2 - 1 for c in cols]
    expected = np.mean([rho / np.pi * Le * np.pi * r * r
                        * (1 + x * x) ** -1.5 for x in xs])
    got = img[11:13, 17:19].mean()
    assert abs(got - expected) / expected < 0.05, (got, expected)


def test_mesh_area_light():
    # emissive quad directly viewed from its FRONT side: L = Le;
    # from the back side: 0 (reference: diffuse.h L(), one-sided default)
    def build(winding):
        b = SceneBuilder()
        black = b.add_material(MaterialSpec(type=MAT_MATTE))
        li = b.add_area_light(np.full(31, 3.0, np.float32))
        b.add_triangle_mesh([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                            winding, black, light_id=li)
        return b.build()
    cam = _cam(dist=2.0, fov=20.0)
    # camera at z=-2 looking +z: front side must have normal -z
    front = _render(build([[0, 2, 1], [2, 0, 3]]), cam, spp=4, max_depth=1)
    assert abs(front[10:14, 10:14].mean() - 3.0) < 0.01
    back = _render(build([[0, 1, 2], [2, 3, 0]]), cam, spp=4, max_depth=1)
    assert back.mean() < 1e-6


def test_mesh_area_light_nee():
    # quad light above floor; check NEE estimate against quadrature
    Le, rho = 5.0, 0.5
    b = SceneBuilder()
    m = b.add_material(MaterialSpec(type=MAT_MATTE,
                                    kd=np.full(31, rho, np.float32)))
    black = b.add_material(MaterialSpec(type=MAT_MATTE))
    b.add_triangle_mesh([[-50, -50, 0], [50, -50, 0], [50, 50, 0],
                         [-50, 50, 0]], [[0, 1, 2], [2, 3, 0]], m)
    li = b.add_area_light(np.full(31, Le, np.float32))
    # unit quad at height 1, facing down (wound so normal is -z)
    b.add_triangle_mesh([[-.5, -.5, 1], [.5, .5, 1], [.5, -.5, 1],
                         [-.5, .5, 1]], [[0, 1, 2], [0, 3, 1]], black,
                        light_id=li)
    scene = b.build()
    cam = projective.make_orthographic(
        tfm.look_at([0, 0, .5], [0, 0, 0], [0, 1, 0]), 24, 24,
        screen=(-0.05, 0.05, -0.05, 0.05))
    img = _render(scene, cam, spp=128, max_depth=2, sampler="sobol")
    # quadrature for L at origin from the quad
    xs = np.linspace(-.5, .5, 201)
    X, Y = np.meshgrid(xs, xs)
    r2 = X ** 2 + Y ** 2 + 1.0
    cos2 = 1.0 / r2  # cos at floor * cos at light = (1/r)*(1/r)
    integrand = cos2 / r2
    E = Le * np.trapezoid(np.trapezoid(integrand, xs), xs)
    expected = rho / np.pi * E
    got = img.mean()
    assert abs(got - expected) / expected < 0.03, (got, expected)


def test_plastic_energy_conservation():
    scene = _furnace_scene(0.4, mat_type=MAT_PLASTIC,
                           ks=np.full(31, 0.3, np.float32), rough_u=0.1,
                           rough_v=0.1)
    img = _render(scene, _cam(), spp=16, max_depth=5)
    center = img[8:16, 8:16]
    assert center.max() < 1.05       # no energy gain in furnace
    assert center.mean() > 0.3       # reflects a sensible amount


def test_glass_sphere_furnace():
    b = SceneBuilder()
    m = b.add_material(MaterialSpec(type=MAT_GLASS,
                                    kr=np.ones(31, np.float32),
                                    kt=np.ones(31, np.float32), eta=1.5))
    b.add_sphere(tfm.Transform(), 1.0, m)
    b.add_infinite_light(np.ones(31, np.float32))
    scene = b.build()
    img = _render(scene, _cam(), spp=32, max_depth=16)
    # perfect glass in a furnace is invisible (energy conservation)
    assert abs(img.mean() - 1.0) < 0.03, img.mean()


def test_depth_zero_only_emission():
    scene = _furnace_scene(0.5)
    img = _render(scene, _cam(), spp=4, max_depth=0)
    # depth 0: env directly visible, sphere black
    assert img[10:14, 10:14].mean() < 0.02
    assert abs(img[:2, :2].mean() - 1.0) < 0.02


def test_uniform_sample_all_matches_one():
    """UniformSampleAllLights (integrator.cpp:54) agrees in expectation
    with UniformSampleOneLight on a two-light scene."""
    import numpy as np
    import jax.numpy as jnp
    from pbrt_tpu.core import transform as tfm
    from pbrt_tpu.scene.ir import SceneBuilder, MaterialSpec, MAT_MATTE
    from pbrt_tpu.cameras import projective
    from pbrt_tpu.integrators import path as pathmod
    from pbrt_tpu.samplers.samplers import SamplerConfig

    b = SceneBuilder()
    white = b.add_material(MaterialSpec(type=MAT_MATTE,
                                        kd=np.full(31, .6, np.float32)))
    blackm = b.add_material(MaterialSpec(type=MAT_MATTE))
    for x, lum in ((-1.5, 12.0), (1.5, 6.0)):
        li = b.add_area_light(np.full(31, lum, np.float32))
        b.add_triangle_mesh(
            [[x - .5, -.5, 3.], [x + .5, -.5, 3.], [x + .5, .5, 3.],
             [x - .5, .5, 3.]], [[0, 2, 1], [0, 3, 2]], blackm, light_id=li)
    b.add_triangle_mesh([[-4, -4, 0], [4, -4, 0], [4, 4, 0], [-4, 4, 0]],
                        [[0, 1, 2], [2, 3, 0]], white)
    scene = b.build()
    W = H = 16
    camera = projective.make_perspective(
        tfm.look_at([0, -5, 2], [0, 0, 0.5], [0, 0, 1]), 45.0, W, H)
    cfg = SamplerConfig(kind="sobol", seed=0, spp=16)
    pids = jnp.arange(W * H, dtype=jnp.uint32)

    def render(strategy):
        acc = 0.0
        for s in range(16):
            ray, wt, pf, pid, sidx = pathmod.camera_rays_for_pixels(
                camera, W, H, cfg, pids, jnp.uint32(s),
                projective.generate_rays)
            L = pathmod.trace_paths(scene, ray, pid, sidx, cfg,
                                    max_depth=1, light_strategy=strategy)
            acc = acc + np.asarray(L * wt[:, None])
        return acc / 16

    a = render("all")
    o = render("uniform")
    assert abs(a.mean() / o.mean() - 1.0) < 0.05, (a.mean(), o.mean())
    # "all" has lower variance on the lit floor (both lights every sample)
