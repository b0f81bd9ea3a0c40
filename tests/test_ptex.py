"""Ptex per-face textures (reference textures/ptex.cpp + ext/ptex)."""
import numpy as np
import pytest

from pbrt_tpu.textures import ptex


def _faces(n=4, res=8, c=3):
    rng = np.random.default_rng(0)
    return [rng.uniform(0, 1, (res, res, c)).astype(np.float32)
            for _ in range(n)]


def test_ptex_roundtrip_float(tmp_path):
    faces = _faces()
    p = str(tmp_path / "t.ptx")
    ptex.write_ptex(p, faces, datatype=ptex.DT_FLOAT)
    got = ptex.read_ptex(p)
    assert got["meshtype"] == ptex.MESH_TRIANGLE
    assert len(got["faces"]) == 4
    for a, b in zip(faces, got["faces"]):
        assert np.allclose(a, b)


def test_ptex_roundtrip_uint8(tmp_path):
    faces = _faces(n=2, res=4)
    p = str(tmp_path / "t8.ptx")
    ptex.write_ptex(p, faces, datatype=ptex.DT_UINT8)
    got = ptex.read_ptex(p)
    for a, b in zip(faces, got["faces"]):
        assert np.allclose(a, b, atol=1.0 / 255)


def test_bake_atlas_layout():
    faces = [np.full((4, 4, 3), v, np.float32)
             for v in (0.1, 0.4, 0.7, 1.0)]
    atlas, tpr, tile = ptex.bake_atlas(faces)
    assert atlas.shape[0] == atlas.shape[1]
    # each face's tile holds its constant value
    for i, v in enumerate((0.1, 0.4, 0.7, 1.0)):
        r, c = (i // tpr) * tile, (i % tpr) * tile
        assert np.allclose(atlas[r:r + tile, c:c + tile], v, atol=1e-5)


def test_ptex_material_renders_per_face(tmp_path):
    """Two triangles with different ptex face colors shade differently
    through the full parse -> trace path (faceIndex plumbing)."""
    import jax.numpy as jnp
    from pbrt_tpu.parser.api import PbrtAPI
    from pbrt_tpu.core import geometry as geom
    from pbrt_tpu.ops import intersect as isect
    from pbrt_tpu.materials import bsdf
    from pbrt_tpu.textures.textures import TEX_PTEX

    faces = [np.full((8, 8, 3), 0.9, np.float32),
             np.full((8, 8, 3), 0.1, np.float32)]
    p = str(tmp_path / "f.ptx")
    ptex.write_ptex(p, faces)
    src = f"""
Film "image" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
Texture "pt" "color" "ptex" "string filename" "{p}"
Material "matte" "texture Kd" "pt"
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [-2 -2 0  2 -2 0  2 2 0  -2 2 0]
WorldEnd
"""
    job = PbrtAPI().parse_string(src)
    scene = job.scene
    assert int(np.asarray(scene.tex_type)[1]) == TEX_PTEX
    # rays hitting face 0 (lower-right tri) vs face 1 (upper-left tri)
    o = jnp.asarray([[1.0, -1.0, -3.0], [-1.0, 1.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    ray = geom.Ray.make(o, d)
    hit = isect.intersect_full(scene, ray)
    assert bool(hit.valid.all())
    assert sorted(np.asarray(hit.face).tolist()) == [0, 1]
    mat = bsdf.gather_materials(scene, hit.material, uv=hit.uv, p=hit.p,
                                face=hit.face)
    kd = np.asarray(mat.kd).mean(-1)
    bright = kd[np.asarray(hit.face) == 0][0]
    dark = kd[np.asarray(hit.face) == 1][0]
    assert bright > 5 * dark, (bright, dark)
