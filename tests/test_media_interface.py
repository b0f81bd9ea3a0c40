"""Per-primitive MediumInterface tests (reference: api.cpp
pbrtMediumInterface + MediumInterface nesting on GeometricPrimitive)."""
import numpy as np
import pytest

from pbrt_tpu.parser.api import PbrtAPI
from pbrt_tpu.tools.pbrt import run_job
from pbrt_tpu.film import film as filmmod

BASE = """
LookAt 0 0 -4  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Sampler "sobol" "integer pixelsamples" [24]
Integrator "volpath" "integer maxdepth" [6]
WorldBegin
%s
AttributeBegin
AreaLightSource "area" "color L" [12 12 12]
Translate 0 0 4
Shape "trianglemesh" "point P" [-3 -3 0  3 -3 0  3 3 0  -3 3 0]
    "integer indices" [0 1 2 2 3 0]
AttributeEnd
AttributeBegin
Material "glass"
%s
Shape "sphere" "float radius" [1]
AttributeEnd
WorldEnd
"""


def _render(med_decl, iface):
    job = PbrtAPI().parse_string(BASE % (med_decl, iface))
    film, _ = run_job(job, quiet=True, progress=False)
    return job, np.asarray(filmmod.develop_rgb(film))


def test_inside_medium_attenuates():
    ink = ('MakeNamedMedium "ink" "string type" "homogeneous" '
           '"color sigma_a" [3 3 3] "color sigma_s" [0 0 0]')
    job_i, img_i = _render(ink, 'MediumInterface "ink" ""')
    job_c, img_c = _render("", "")
    s = job_i.scene
    assert s.has_prim_media
    assert int(s.camera_medium) == -1
    pm = np.asarray(s.prim_medium_in)
    assert (pm >= 0).any()                     # sphere prims bound
    # the light plane itself has no medium binding
    assert (np.asarray(s.prim_medium_out) <= 0).all()
    # looking through the ink-filled glass sphere is darker than clear
    ci = img_i[9:15, 9:15].mean()
    cc = img_c[9:15, 9:15].mean()
    assert np.isfinite(img_i).all()
    assert ci < 0.6 * cc, (ci, cc)
    # pixels missing the sphere are unaffected (vacuum outside)
    edge_i = img_i[0:3, :].mean()
    edge_c = img_c[0:3, :].mean()
    assert abs(edge_i - edge_c) < 0.12 * max(edge_c, 1e-6), (edge_i,
                                                             edge_c)


def test_prim_media_global_medium_not_duplicated():
    """A MediumInterface-bound medium must not also become the global
    medium (which would fog the whole scene)."""
    from pbrt_tpu.integrators.volpath import build_medium_from_job
    from pbrt_tpu.media.media import MEDIUM_NONE
    ink = ('MakeNamedMedium "ink" "string type" "homogeneous" '
           '"color sigma_a" [3 3 3]')
    job = PbrtAPI().parse_string(BASE % (ink, 'MediumInterface "ink" ""'))
    assert "ink" in job.prim_media_names
    med = build_medium_from_job(job)
    assert med.kind == MEDIUM_NONE


MEDIA_SHADOW = """
LookAt 0 0.5 -5  0 -1 0  0 1 0
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Sampler "sobol" "integer pixelsamples" [32]
Integrator "volpath" "integer maxdepth" [2]
WorldBegin
AttributeBegin
AreaLightSource "area" "color L" [20 20 20]
Shape "trianglemesh" "point P" [-1 3 -1  1 3 -1  1 3 1  -1 3 1]
    "integer indices" [0 1 2 2 3 0]
AttributeEnd
AttributeBegin
Material "matte" "color Kd" [0.7 0.7 0.7]
Shape "trianglemesh" "point P" [-3 -1 -3  3 -1 -3  3 -1 3  -3 -1 3]
    "integer indices" [0 2 1 0 3 2]
AttributeEnd
%s
WorldEnd
"""

SPHERE_IFACE = """
MakeNamedMedium "juice" "string type" "homogeneous"
    "color sigma_a" [2 2 2] "color sigma_s" [0 0 0]
AttributeBegin
Material ""
MediumInterface "juice" ""
Translate 0 1 0
Shape "sphere" "float radius" [0.8]
AttributeEnd
"""


def test_shadow_tr_walks_medium_boundaries():
    """VERDICT r3 item 5: shadow-ray Tr must attenuate only the
    sub-segment actually inside the bound medium (Scene::IntersectTr
    walk, scene.cpp:57-81), not apply the vertex's own medium to the
    whole segment.  A wall in vacuum shadow-traced through an
    absorbing-medium interface sphere must see exp(-sigma_t * chord)
    of the clear-scene direct light at the center, and full light
    where the shadow segment misses the sphere."""
    job_m, img_m = _render_shadow(SPHERE_IFACE)
    job_c, img_c = _render_shadow("")
    assert job_m.scene.has_prim_media
    # center pixel: shadow segment crosses the full diameter (chord
    # 1.6, sigma_t 2 -> exp(-3.2) ~ 0.041); old behavior gave 1.0
    c_m = img_m[10:14, 10:14].mean()
    c_c = img_c[10:14, 10:14].mean()
    ratio = c_m / max(c_c, 1e-9)
    assert 0.01 < ratio < 0.25, (c_m, c_c, ratio)
    # corners: segment misses the sphere entirely -> unattenuated
    corner_m = img_m[19:22, 10:14].mean()
    corner_c = img_c[19:22, 10:14].mean()
    assert abs(corner_m - corner_c) < 0.1 * max(corner_c, 1e-6)


def _render_shadow(iface_block):
    job = PbrtAPI().parse_string(MEDIA_SHADOW % iface_block)
    film, _ = run_job(job, quiet=True, progress=False)
    return job, np.asarray(filmmod.develop_rgb(film))


# ---------------------------------------------------------------------------
# grid media bound through MediumInterface (VERDICT r4 item 4;
# reference: GridDensityMedium grid.cpp:46+ composed per segment by
# Scene::IntersectTr, scene.cpp:57-81)
# ---------------------------------------------------------------------------

def _numeric_optical_depth(density, dims, mk_scalar, o, d, st, n=4001):
    """Reference optical depth along the unit-cube chord using the SAME
    trilinear-with-zero-outside density the kernel uses (pbrt
    GridDensityMedium::D returns 0 outside the extent: half-voxel
    falloff at faces is part of the model, grid.cpp:46-61)."""
    import jax.numpy as jnp
    from pbrt_tpu.media import media as med
    ts = np.linspace(0.0, 2.0, n)          # cover the whole chord
    pts = o[None, :] + ts[:, None] * d[None, :]
    dens = np.asarray(med.density_at_lanes(
        jnp.asarray(density), jnp.asarray(dims),
        jnp.full(n, mk_scalar, jnp.int32), jnp.asarray(pts, jnp.float32)))
    # the tracker (like the reference, grid.cpp:66-70) only walks the
    # ray interval INSIDE the medium's unit cube; the trilinear
    # interpolant's half-voxel tail outside the cube is never sampled
    inside = ((pts >= 0.0) & (pts <= 1.0)).all(-1)
    return st * np.trapezoid(np.where(inside, dens, 0.0), ts)


def test_density_at_lanes_matches_trilinear():
    """Interior-point check of the per-lane trilinear against direct
    hand computation (non-circular anchor for the estimator tests)."""
    import jax.numpy as jnp
    from pbrt_tpu.media import media as med
    rs = np.random.RandomState(0)
    nz, ny, nx = 4, 5, 3
    dens = rs.rand(nz, ny, nx).astype(np.float32)
    p = np.array([[0.5, 0.43, 0.61]], np.float32)
    gx, gy, gz = p[0, 0] * nx - .5, p[0, 1] * ny - .5, p[0, 2] * nz - .5
    ix, iy, iz = int(np.floor(gx)), int(np.floor(gy)), int(np.floor(gz))
    fx, fy, fz = gx - ix, gy - iy, gz - iz
    want = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                w = ((fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                     * (fz if dz else 1 - fz))
                want += w * dens[iz + dz, iy + dy, ix + dx]
    got = float(np.asarray(med.density_at_lanes(
        jnp.asarray(dens[None]), jnp.asarray([[nz, ny, nx]], np.int32),
        jnp.zeros(1, jnp.int32), jnp.asarray(p)))[0])
    assert abs(got - want) < 1e-5, (got, want)


def test_grid_lane_tr_expectation():
    """ratio_tr_lanes is an unbiased estimator of exp(-int sigma_t)."""
    import jax.numpy as jnp
    from pbrt_tpu.media import media as med

    # 4x4x4 grid with a z-ramp density
    nz = ny = nx = 4
    z = (np.arange(nz) + 0.5) / nz
    dens = np.broadcast_to(z[:, None, None] * 2.0,
                           (nz, ny, nx)).astype(np.float32)
    K = 2
    density = np.zeros((K, nz, ny, nx), np.float32)
    density[1] = dens
    dims = np.array([[1, 1, 1], [nz, ny, nx]], np.int32)
    w2m = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    inv_maxd = np.array([1.0, 1.0 / dens.max()], np.float32)
    B = 8192
    o = np.tile(np.array([[0.5, 0.5, -0.5]], np.float32), (B, 1))
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (B, 1))
    mk = jnp.full(B, 1, jnp.int32)
    pid = jnp.arange(B, dtype=jnp.uint32)
    tr = med.ratio_tr_lanes(
        jnp.asarray(density), jnp.asarray(dims), jnp.asarray(w2m)[mk],
        jnp.asarray(inv_maxd)[mk], jnp.full(B, 1.0), jnp.asarray(o),
        jnp.asarray(d), jnp.full(B, 10.0), mk, pid,
        jnp.zeros(B, jnp.uint32), 0)
    expect = float(np.exp(-_numeric_optical_depth(
        density, dims, 1, o[0], d[0], 1.0)))
    got = float(np.mean(np.asarray(tr)))
    assert abs(got - expect) < 0.02, (got, expect)


def test_grid_lane_delta_tracking_expectation():
    """sample_distance_grid_lanes interacts with prob 1-exp(-int)."""
    import jax.numpy as jnp
    from pbrt_tpu.media import media as med

    nz = ny = nx = 4
    dens = np.full((nz, ny, nx), 0.8, np.float32)
    density = dens[None]
    dims = np.array([[nz, ny, nx]], np.int32)
    w2m = np.eye(4, dtype=np.float32)[None]
    B = 8192
    o = np.tile(np.array([[0.5, 0.5, -0.5]], np.float32), (B, 1))
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (B, 1))
    mk = jnp.zeros(B, jnp.int32)
    pid = jnp.arange(B, dtype=jnp.uint32)
    st = 2.0                      # scalar sigma_t
    t, hit = med.sample_distance_grid_lanes(
        jnp.asarray(density), jnp.asarray(dims), jnp.asarray(w2m)[mk],
        jnp.full(B, 1.0 / 0.8), jnp.full(B, st), jnp.asarray(o),
        jnp.asarray(d), jnp.full(B, 10.0), mk, pid,
        jnp.zeros(B, jnp.uint32), 0)
    p_hit = float(np.mean(np.asarray(hit)))
    expect = 1.0 - float(np.exp(-_numeric_optical_depth(
        density, dims, 0, o[0], d[0], st)))
    assert abs(p_hit - expect) < 0.02, (p_hit, expect)


GRID_SMOKE = """
MakeNamedMedium "smoke" "string type" "heterogeneous"
    "color sigma_a" [3 3 3] "color sigma_s" [0 0 0]
    "integer nx" [2] "integer ny" [2] "integer nz" [2]
    "float density" [1 1 1 1 1 1 1 1]
    "point p0" [-1 -1 -1] "point p1" [1 1 1]
%s
AttributeBegin
Material "glass"
MediumInterface "smoke" ""
Shape "sphere" "float radius" [1]
AttributeEnd
"""

HOMO_SMOKE = """
MakeNamedMedium "smoke" "string type" "homogeneous"
    "color sigma_a" [3 3 3] "color sigma_s" [0 0 0]
%s
AttributeBegin
Material "glass"
MediumInterface "smoke" ""
Shape "sphere" "float radius" [1]
AttributeEnd
"""


def test_smoke_in_glass_box():
    """A CONSTANT-density grid bound inside glass must render like the
    equivalent homogeneous binding (same physics, ratio/delta-tracked
    estimator instead of closed form) and darker than clear glass."""
    job_g = PbrtAPI().parse_string(BASE % (GRID_SMOKE % "", ""))
    assert job_g.scene.has_grid_media
    assert bool(np.asarray(job_g.scene.med_is_grid).any())
    film_g, _ = run_job(job_g, quiet=True, progress=False)
    img_g = np.asarray(filmmod.develop_rgb(film_g))
    job_h = PbrtAPI().parse_string(BASE % (HOMO_SMOKE % "", ""))
    film_h, _ = run_job(job_h, quiet=True, progress=False)
    img_h = np.asarray(filmmod.develop_rgb(film_h))
    _, img_c = _render("", "")
    cg = img_g[9:15, 9:15].mean()
    ch = img_h[9:15, 9:15].mean()
    cc = img_c[9:15, 9:15].mean()
    assert np.isfinite(img_g).all()
    assert cg < 0.6 * cc, (cg, cc)             # smoke attenuates
    assert abs(cg - ch) < 0.25 * max(ch, 1e-6), (cg, ch)


def test_tr_walk_truncation_contract():
    """>max_crossings interfaces: the walk stops accumulating after
    max_crossings sub-segments (documented truncation — conservative
    toward brighter, never darker)."""
    import jax.numpy as jnp
    from pbrt_tpu.ops import intersect as isect

    # 5 nested material-less absorbing shells around the origin
    shells = "\n".join(
        f'AttributeBegin\nMaterial ""\nMediumInterface "ink" ""\n'
        f'Shape "sphere" "float radius" [{0.2 + 0.15 * i}]\n'
        f'AttributeEnd' for i in range(5))
    src = (
        'LookAt 0 0 -4  0 0 0  0 1 0\nCamera "perspective"\n'
        'Film "image" "integer xresolution" [4] '
        '"integer yresolution" [4]\n'
        'Integrator "volpath"\nWorldBegin\n'
        'MakeNamedMedium "ink" "string type" "homogeneous" '
        '"color sigma_a" [1 1 1] "color sigma_s" [0 0 0]\n'
        + shells + '\n'
        'AttributeBegin\nAreaLightSource "area" "color L" [5 5 5]\n'
        'Translate 0 0 6\n'
        'Shape "trianglemesh" "point P" [-1 -1 0  1 -1 0  1 1 0  -1 1 0]'
        ' "integer indices" [0 1 2 2 3 0]\nAttributeEnd\nWorldEnd\n')
    job = PbrtAPI().parse_string(src)
    s = job.scene
    B = 8
    org = jnp.tile(jnp.asarray([[0.0, 0.0, -3.0]]), (B, 1))
    wi = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (B, 1))
    dist = jnp.full(B, 6.0)
    cand = jnp.ones(B, bool)
    med0 = jnp.full(B, -1, jnp.int32)
    wl = jnp.full(B, 550.0)

    def walk(mc):
        blocked, optical, trr = isect.intersect_tr_walk(
            s, org, wi, dist, cand, med0, wl, max_crossings=mc)
        return (np.asarray(blocked), np.asarray(optical[:, 0]),
                np.asarray(trr))

    bl_full, opt_full, _ = walk(12)     # 10 crossings: exact
    bl_tr, opt_tr, _ = walk(4)          # truncated after 4
    assert not bl_full.any() and not bl_tr.any()
    # exact semantics (same as the reference's per-prim
    # MediumInterface): every shell binds inside=ink/outside=vacuum,
    # so entering r=0.8 sets ink and the first OUTWARD crossing (the
    # innermost shell at +0.2) sets vacuum again -> ink occupies
    # [-0.8, +0.2], optical = 1.0
    assert abs(opt_full[0] - 1.0) < 5e-3, opt_full[0]
    # truncated after 4 crossings (-0.8/-0.65/-0.5/-0.35): only the
    # ink segments between them accumulated -> 3 * 0.15 = 0.45; always
    # <= the exact depth (conservative toward brighter)
    assert abs(opt_tr[0] - 0.45) < 5e-3, opt_tr[0]
    assert opt_tr[0] < opt_full[0] + 1e-6


def test_smoke_glass_vs_reference():
    """Golden comparison vs the REFERENCE BINARY (VERDICT r4 item 4
    'Done' criterion): a scattering GridDensityMedium bound inside a
    glass sphere through MediumInterface, rendered by both renderers.
    The reference composes per-segment GridDensityMedium Tr inside
    Scene::IntersectTr (scene.cpp:57-81, grid.cpp:89+); pbrt_tpu's
    volpath must reproduce it through per-lane delta tracking + the
    boundary-walked ratio-tracked shadow Tr.

    Fixture: tests/data/ref_smoke_glass.npz (48x48, 64 spp, spectral
    reference binary; scripts/gen_smoke_fixture.py).  Independent RNG
    -> compare 8x8-block means."""
    import os
    fx = os.path.join(os.path.dirname(__file__), "data",
                      "ref_smoke_glass.npz")
    if not os.path.exists(fx):
        pytest.skip("no reference fixture")
    d = np.load(fx)
    ref_lum = d["lum"]
    res = int(d["res"])

    from pbrt_tpu.parser.api import parse_scene
    from pbrt_tpu.film.film import develop_spectral
    job = parse_scene(os.path.join(os.path.dirname(__file__), "..",
                                   "scenes", "smoke_glass.pbrt"))
    assert job.scene.has_grid_media
    film, _ = run_job(job, spp=32, quiet=True, progress=False)
    ours = np.asarray(develop_spectral(film)).sum(-1)
    assert ours.shape == ref_lum.shape == (res, res)

    def blocks(img, bs=8):
        H = img.shape[0] // bs
        return img[:H * bs, :H * bs].reshape(H, bs, H, bs).mean((1, 3))

    br, bo = blocks(ref_lum), blocks(ours)
    # overall energy within 10%
    assert abs(bo.mean() / max(br.mean(), 1e-9) - 1.0) < 0.10, \
        (bo.mean(), br.mean())
    # per-block agreement where the reference has signal
    sel = br > 0.2 * br.mean()
    rel = np.abs(bo[sel] - br[sel]) / np.maximum(br[sel], 1e-9)
    assert np.median(rel) < 0.15, (np.median(rel), rel.max())
    assert (rel < 0.35).mean() > 0.85, (rel > 0.35).sum()
