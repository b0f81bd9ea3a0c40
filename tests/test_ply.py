"""PLY reader paths: the vectorized uniform-n-gon fast path must produce
the same triangles (same order) as the per-face fallback loop."""

import numpy as np

from pbrt_tpu.shapes import ply


def _write_binary(path, V, faces_rec, n_extra_tri=None):
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(V)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        nf = len(faces_rec) + (1 if n_extra_tri is not None else 0)
        f.write(f"element face {nf}\n".encode())
        f.write(b"property list uchar int vertex_indices\nend_header\n")
        f.write(np.asarray(V, np.float32).tobytes())
        f.write(faces_rec.tobytes())
        if n_extra_tri is not None:
            f.write(np.uint8(3).tobytes()
                    + np.asarray(n_extra_tri, np.int32).tobytes())


def test_binary_triangle_fast_path(tmp_path):
    rng = np.random.RandomState(0)
    V = rng.rand(50, 3).astype(np.float32)
    F = rng.randint(0, 50, (40, 3)).astype(np.int32)
    rec = np.zeros(40, dtype=[("c", np.uint8), ("i", np.int32, 3)])
    rec["c"] = 3
    rec["i"] = F
    p = str(tmp_path / "t.ply")
    _write_binary(p, V, rec)
    v, fc, _, _ = ply.read_ply(p)
    assert np.array_equal(fc, F.astype(np.int64))
    assert np.allclose(v, V)


def test_binary_quad_fan_order_matches_loop(tmp_path):
    rng = np.random.RandomState(1)
    V = rng.rand(30, 3).astype(np.float32)
    Q = rng.randint(0, 30, (7, 4)).astype(np.int32)
    rec = np.zeros(7, dtype=[("c", np.uint8), ("i", np.int32, 4)])
    rec["c"] = 4
    rec["i"] = Q
    fast = str(tmp_path / "q.ply")
    mixed = str(tmp_path / "qm.ply")
    _write_binary(fast, V, rec)
    # a trailing triangle record makes counts non-uniform -> loop path
    _write_binary(mixed, V, rec, n_extra_tri=[0, 1, 2])
    _, fq, _, _ = ply.read_ply(fast)
    _, fm, _, _ = ply.read_ply(mixed)
    assert fq.shape == (14, 3)               # 7 quads -> 2 tris each
    assert np.array_equal(fq, fm[:14])       # same fan order
    assert np.array_equal(fm[14], np.asarray([0, 1, 2]))


def test_ascii_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    V = rng.rand(20, 3).astype(np.float32)
    F = (np.arange(30).reshape(10, 3) % 20).astype(np.int64)
    p = str(tmp_path / "a.ply")
    ply.write_ply(p, V, F)
    v, fc, _, _ = ply.read_ply(p)
    assert np.array_equal(fc, F)
    assert np.allclose(v, V, atol=1e-5)
