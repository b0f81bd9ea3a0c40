"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §2.12: rays+film sharded, scene replicated; results must be
bit-identical to single-chip thanks to counter-based sampling)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbrt_tpu.models import flagship
from pbrt_tpu.film import film as filmmod
from pbrt_tpu.integrators import path as pathint
from pbrt_tpu.parallel import mesh as pmesh
from pbrt_tpu.samplers.samplers import SamplerConfig


@pytest.fixture(scope="module")
def small_scene():
    scene, cam_ctor = flagship.cornell(tessellate=False)
    return scene, cam_ctor(16, 16)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_render_matches_single(small_scene):
    scene, cam = small_scene
    cfg = SamplerConfig(kind="sobol", seed=0, spp=2)
    f0 = filmmod.make_film(16, 16, "box")
    single = pathint.render(scene, cam, f0, cfg, spp=2, max_depth=3)
    f1 = filmmod.make_film(16, 16, "box")
    mesh = pmesh.make_mesh(8)
    sharded = pmesh.render_sharded(scene, cam, f1, cfg, spp=2, max_depth=3,
                                   mesh=mesh, rays_per_device=32)
    a = np.asarray(filmmod.develop_spectral(single))
    b = np.asarray(filmmod.develop_spectral(sharded))
    assert np.allclose(a, b, rtol=1e-4, atol=1e-5), np.abs(a - b).max()


def test_graft_entry_and_dryrun():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1024, 31)
    assert bool(jnp.isfinite(out).all())
    g.dryrun_multichip(8)
