"""SPPM tests (reference: src/integrators/sppm.cpp)."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.scene.ir import SceneBuilder, MaterialSpec
from pbrt_tpu.core import transform as tfm
from pbrt_tpu.cameras import projective
from pbrt_tpu.film import film as filmmod
from pbrt_tpu.integrators import path as pathint, sppm
from pbrt_tpu.samplers.samplers import SamplerConfig


def _scene_with_indirect():
    b = SceneBuilder()
    white = b.add_material(MaterialSpec(kd=np.full(31, 0.7, np.float32)))
    black = b.add_material(MaterialSpec())
    li = b.add_area_light(np.full(31, 10.0, np.float32))
    # downward-facing light quad
    b.add_triangle_mesh([[-1, -1, 4], [1, 1, 4], [1, -1, 4], [-1, 1, 4]],
                        [[0, 1, 2], [0, 3, 1]], black, light_id=li)
    # floor and a back wall (wall gets indirect from the floor and
    # vice versa)
    b.add_triangle_mesh([[-4, -4, 0], [4, -4, 0], [4, 4, 0], [-4, 4, 0]],
                        [[0, 1, 2], [2, 3, 0]], white)
    b.add_triangle_mesh([[-4, 4, 0], [4, 4, 0], [4, 4, 6], [-4, 4, 6]],
                        [[0, 2, 1], [2, 0, 3]], white)
    return b.build()


def test_sppm_matches_path_tracing():
    scene = _scene_with_indirect()
    W = H = 24
    cam = projective.make_perspective(
        tfm.look_at([0, -7, 3], [0, 0, 1.5], [0, 0, 1]), 45.0, W, H)
    cfg = SamplerConfig("independent", 0, 16)
    ref = pathint.render(scene, cam, filmmod.make_film(W, H), cfg,
                         spp=48, max_depth=4)
    img_ref = np.asarray(filmmod.develop_spectral(ref))
    L = sppm.render_sppm(scene, cam, W, H,
                         SamplerConfig("independent", 3, 16),
                         n_iterations=12, photons_per_iter=W * H * 6,
                         initial_radius=0.4, max_depth=4)
    img_s = np.asarray(L)
    # compare lit regions (floor + wall) region-mean within tolerance
    for region in [np.s_[16:23, 4:20], np.s_[4:10, 4:20]]:
        a, b = img_s[region].mean(), img_ref[region].mean()
        assert abs(a / b - 1) < 0.2, (a, b, region)


def test_sppm_radius_shrinks():
    scene = _scene_with_indirect()
    W = H = 12
    cam = projective.make_perspective(
        tfm.look_at([0, -7, 3], [0, 0, 1.5], [0, 0, 1]), 45.0, W, H)
    cfg = SamplerConfig("independent", 0, 4)
    import jax
    Ld, vp_p, vp_f, vp_valid, pfilm = sppm._camera_pass(
        scene, cam, W, H, cfg, jnp.uint32(0), 3,
        projective.generate_rays)
    assert bool(vp_valid.any())
    r0 = jnp.full(W * H, 0.5)
    tau, M = sppm._photon_pass(scene, cfg, jnp.uint32(0), 512, 4,
                               vp_p, vp_f, vp_valid, r0)
    assert float(M.sum()) > 0  # photons landed near visible points
