"""Parser/API tests (model: reference src/tests/parser.cpp)."""
import os
import numpy as np
import pytest

from pbrt_tpu.parser.api import PbrtAPI
from pbrt_tpu.parser.tokenizer import tokenize
from pbrt_tpu.scene import ir

KILLEROO = "/root/reference/scenes/killeroo-simple.pbrt"


def _parse(text):
    api = PbrtAPI()
    return api.parse_string(text)


BASIC = """
LookAt 0 0 -5  0 0 0  0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [32] "integer yresolution" [24]
    "string filename" "out.exr"
Sampler "sobol" "integer pixelsamples" [7]
Integrator "path" "integer maxdepth" [9]
PixelFilter "gaussian" "float xwidth" [1.5]
WorldBegin
AttributeBegin
  Material "plastic" "color Kd" [.1 .2 .3] "float roughness" [.2]
  Translate 1 0 0
  Shape "sphere" "float radius" [2]
AttributeEnd
Material "matte" "color Kd" [.5 .5 .5]
Shape "trianglemesh" "point P" [0 0 0 1 0 0 0 1 0] "integer indices" [0 1 2]
AreaLightSource "area" "color L" [4 4 4]
Shape "sphere" "float radius" [0.5]
WorldEnd
"""


def test_tokenizer():
    toks = list(tokenize('Shape "sphere" # comment\n "float radius" [2.0]'))
    assert toks == ['Shape', '"sphere"', '"float radius"', '[', '2.0', ']']


def test_basic_scene():
    job = _parse(BASIC)
    assert job.film_width == 32 and job.film_height == 24
    assert job.spp == 7
    assert job.sampler_kind == "sobol"
    assert job.integrator_params["maxdepth"] == 9
    assert job.filter_name == "gaussian"
    assert job.scene.n_prims == 3  # 2 spheres + 1 triangle
    assert job.scene.n_lights == 1
    assert job.camera_params["fov"] == 45


def test_attribute_stack_restores_material():
    job = _parse(BASIC)
    # the triangle (added after AttributeEnd) should use matte, not plastic
    s = job.scene
    tri_idx = int(np.argmax(np.asarray(s.prim_type) == ir.PRIM_TRIANGLE))
    mat = int(np.asarray(s.prim_material)[tri_idx])
    assert int(np.asarray(s.mat_type)[mat]) == ir.MAT_MATTE


def test_area_light_binding():
    job = _parse(BASIC)
    s = np.asarray(job.scene.prim_light)
    assert (s >= 0).sum() == 1  # only the last sphere is emissive


def test_transform_translate():
    job = _parse(BASIC)
    s = job.scene
    # plastic sphere center at (1,0,0)
    qi = np.asarray(s.quad_idx)
    types = np.asarray(s.prim_type)
    mats = np.asarray(s.prim_material)
    mtypes = np.asarray(s.mat_type)
    for p in range(s.n_prims):
        if types[p] == ir.PRIM_SPHERE and mtypes[mats[p]] == ir.MAT_PLASTIC:
            o2w = np.asarray(s.quad_o2w)[qi[p]]
            assert np.allclose(o2w[:3, 3], [1, 0, 0])
            break
    else:
        raise AssertionError("plastic sphere not found")


def test_named_material_and_texture():
    job = _parse("""
Film "image" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
Texture "greenish" "color" "constant" "color value" [.1 .9 .2]
MakeNamedMaterial "mymat" "string type" "matte" "texture Kd" "greenish"
NamedMaterial "mymat"
Shape "sphere" "float radius" [1]
WorldEnd
""")
    s = job.scene
    mat = int(np.asarray(s.prim_material)[0])
    kd = np.asarray(s.mat_kd)[mat]
    from pbrt_tpu.core import spectrum as spec
    import jax.numpy as jnp
    rgb = np.asarray(spec.to_rgb(jnp.asarray(kd)))
    assert rgb[1] > rgb[0] and rgb[1] > rgb[2]  # green dominant


def test_object_instancing():
    job = _parse("""
Film "image" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
ObjectBegin "thing"
Shape "trianglemesh" "point P" [0 0 0 1 0 0 0 1 0] "integer indices" [0 1 2]
ObjectEnd
Translate 5 0 0
ObjectInstance "thing"
Translate 5 0 0
ObjectInstance "thing"
WorldEnd
""")
    s = job.scene
    assert s.n_prims == 2
    v0 = np.asarray(s.tri_v0)
    xs = sorted(v0[:, 0].tolist())
    assert abs(xs[0] - 5) < 1e-5 and abs(xs[1] - 10) < 1e-5
    inst = np.asarray(s.prim_instance)[:2]
    assert inst[0] != inst[1]  # distinct instance ids (fork metadata)


def test_spectrum_params():
    job = _parse("""
Film "image" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
Material "matte" "spectrum Kd" [400 .2 500 .4 600 .6 700 .8]
Shape "sphere" "float radius" [1]
LightSource "point" "blackbody I" [5000 1.0]
WorldEnd
""")
    s = job.scene
    kd = np.asarray(s.mat_kd)[int(np.asarray(s.prim_material)[0])]
    assert kd[0] < kd[-1]  # increasing ramp
    assert 0.15 < kd[0] < 0.3 and 0.7 < kd[-1] < 0.85
    L = np.asarray(s.light_L)[0]
    assert L.max() > 0


@pytest.mark.skipif(not os.path.exists(KILLEROO),
                    reason="reference scenes not mounted")
def test_killeroo_parses():
    api = PbrtAPI()
    job = api.parse_file(KILLEROO)
    assert job.film_width == 700 and job.film_height == 700
    assert job.sampler_kind == "halton" and job.spp == 8
    assert job.integrator_kind == "path"
    assert job.scene.n_prims > 10000     # subdivided killeroos
    assert job.scene.n_lights == 1
    # two plastic materials with distinct roughness
    mt = np.asarray(job.scene.mat_type)
    assert (mt == ir.MAT_PLASTIC).sum() == 2


def test_include(tmp_path):
    inc = tmp_path / "inner.pbrt"
    inc.write_text('Shape "sphere" "float radius" [1]\n')
    main = tmp_path / "main.pbrt"
    main.write_text(f"""
Film "image" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
Include "inner.pbrt"
WorldEnd
""")
    api = PbrtAPI()
    job = api.parse_file(str(main))
    assert job.scene.n_prims == 1


def test_reverse_orientation():
    job = _parse("""
Film "image" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
ReverseOrientation
Shape "trianglemesh" "point P" [0 0 0 1 0 0 0 1 0] "integer indices" [0 1 2]
WorldEnd
""")
    assert bool(np.asarray(job.scene.prim_flip_normal)[0])


def test_null_material_passthrough():
    """Material "" surfaces are invisible boundaries (reference:
    path.cpp:115-120 null-bsdf skip)."""
    base = """
LookAt 0 0 -4  0 0 0  0 1 0
Camera "perspective" "float fov" [30]
Film "image" "integer xresolution" [12] "integer yresolution" [12]
Sampler "sobol" "integer pixelsamples" [4]
Integrator "path" "integer maxdepth" [3]
WorldBegin
AttributeBegin
AreaLightSource "area" "color L" [5 5 5]
Shape "trianglemesh" "point P" [-3 -3 2  3 3 2  3 -3 2  -3 3 2] "integer indices" [0 1 2 0 3 1]
AttributeEnd
%s
WorldEnd
"""
    nullq = ('Material ""\nShape "trianglemesh" "point P" '
             '[-3 -3 0  3 -3 0  3 3 0  -3 3 0] '
             '"integer indices" [0 1 2 2 3 0]')
    from pbrt_tpu.tools.pbrt import run_job
    from pbrt_tpu.film import film as filmmod
    out = {}
    for name, extra in [("bare", ""), ("nullq", nullq)]:
        job = PbrtAPI().parse_string(base % extra)
        film, _ = run_job(job, quiet=True, progress=False)
        out[name] = np.asarray(filmmod.develop_spectral(film))
    assert np.allclose(out["bare"], out["nullq"], rtol=1e-5)


def test_mix_material_resolves_stochastically():
    # materials/mixmat.cpp: "mix" blends namedmaterial1/2 by `amount`.
    # Wavefront analog: per-ray stochastic selection with P(a)=amount.
    job = _parse("""
Film "image" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
MakeNamedMaterial "red" "string type" "matte" "color Kd" [.9 .1 .1]
MakeNamedMaterial "blue" "string type" "matte" "color Kd" [.1 .1 .9]
Material "mix" "string namedmaterial1" "red" "string namedmaterial2" "blue"
    "float amount" [0.75]
Shape "sphere" "float radius" [1]
WorldEnd
""")
    s = job.scene
    import jax.numpy as jnp
    from pbrt_tpu.materials import bsdf
    mid = int(np.asarray(s.prim_material)[0])
    assert int(np.asarray(s.mat_type)[mid]) == ir.MAT_MIX
    a = int(np.asarray(s.mat_mix_a)[mid])
    b = int(np.asarray(s.mat_mix_b)[mid])
    assert a >= 0 and b >= 0 and a != b
    assert abs(float(np.asarray(s.mat_mix_amt)[mid]) - 0.75) < 1e-6
    # resolve with explicit uniforms: u<amount -> material a
    idx = jnp.full((4,), mid, jnp.int32)
    u = jnp.asarray([0.1, 0.5, 0.74, 0.9])
    got = np.asarray(bsdf.resolve_mix(s, idx, u_mix=u))
    assert got.tolist() == [a, a, a, b]
    # expectation over many uniforms matches `amount`
    n = 4096
    u = (jnp.arange(n) + 0.5) / n
    got = np.asarray(bsdf.resolve_mix(s, jnp.full((n,), mid, jnp.int32),
                                      u_mix=u))
    assert abs((got == a).mean() - 0.75) < 0.01
    # unknown names degrade to matte, not a crash
    job2 = _parse("""
Film "image" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
Material "mix" "string namedmaterial1" "nope" "string namedmaterial2" "nah"
Shape "sphere" "float radius" [1]
WorldEnd
""")
    mid2 = int(np.asarray(job2.scene.prim_material)[0])
    assert int(np.asarray(job2.scene.mat_type)[mid2]) == ir.MAT_MATTE
