"""Lens-system cameras: realistic, omni, realisticEye (fork headline features).

Reference: src/cameras/realistic.cpp (spherical element stacks from .dat
files, CA linear-dispersion flag :352-357), src/cameras/omni.cpp (biconic/
aspheric surfaces, JSON lens files, microlens arrays, :1121-1186), and
src/cameras/realisticEye.cpp (biconic ocular surfaces, per-medium spectral
IoR ior1..6 :121-140, curved retina :499-544, HURB aperture diffraction
:828-850).

TPU design: the element stack is a *fixed-length unrolled scan* over
surfaces — each step intersects the batch of rays with one rotationally
symmetric (bi)conic surface and refracts with a per-ray, wavelength-
dependent IoR.  Spherical surfaces solve the quadratic exactly; biconic/
aspheric surfaces run a fixed-iteration Newton solve (replacing the
reference's GSL Brent root finder, realisticEye.cpp:343-354) — no
data-dependent control flow, fully differentiable.

Conventions follow the reference: camera space looks down +z, film at
z = 0 on the -z side of the rear element; surfaces are listed front-to-
back in lens files and traced film->scene (back->front).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import sampling
from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.core import transform as tfm
from pbrt_tpu.core import rng as prng

MAX_IOR_SPECTRA = 8


@struct.dataclass
class LensCamera:
    """Device-side lens camera."""
    cam_to_world: jnp.ndarray      # [4,4]
    # per-surface arrays, ordered REAR (nearest film) -> FRONT
    curv_x: jnp.ndarray            # [S] 1/radiusX (0 => flat / aperture)
    curv_y: jnp.ndarray            # [S]
    conic_x: jnp.ndarray           # [S]
    conic_y: jnp.ndarray           # [S]
    z_pos: jnp.ndarray             # [S] vertex z position (film at z=0 side)
    aperture: jnp.ndarray          # [S] semi-aperture radius
    is_stop: jnp.ndarray           # [S] bool: aperture stop surface
    eta_const: jnp.ndarray         # [S] medium IoR on the FILM side of surface
    eta_idx: jnp.ndarray           # [S] index into ior_spectra (-1 = const)
    asph: jnp.ndarray              # [S,4] aspheric coefficients (r^4..r^10)
    ior_spectra: jnp.ndarray       # [MAX_IOR_SPECTRA, 31]
    # exit pupil (reference: ComputeExitPupilBounds, realistic.cpp:787+):
    # per-radial-zone bounds [NZ,4] = (x0,y0,x1,y1) on the rear plane for
    # a film point on the +x axis; rotated per sample at ray gen
    pupil_bounds: jnp.ndarray      # [NZ,4]
    pupil_valid: jnp.ndarray       # [NZ] bool
    # film / retina geometry
    film_distance: jnp.ndarray     # [] rear-vertex to film distance
    film_diag: jnp.ndarray         # []
    retina_radius: jnp.ndarray     # [] 0 => flat film
    retina_semi_diam: jnp.ndarray  # []
    shutter_open: jnp.ndarray
    shutter_close: jnp.ndarray
    weight_scale: jnp.ndarray      # [] A_rear/z^2-style importance factor
    # microlens array (omni.cpp:963-1140): a small per-element lens stack
    # tiled over the sensor; ml_n_surfaces == 0 => no array.  Surfaces are
    # stored rear-first with z measured from the film plane (camera space,
    # +z toward scene — the reference's Scale(1,1,-1) lens space folded in).
    ml_curv_x: jnp.ndarray = None      # [MS]
    ml_curv_y: jnp.ndarray = None
    ml_conic_x: jnp.ndarray = None
    ml_conic_y: jnp.ndarray = None
    ml_z: jnp.ndarray = None           # [MS] vertex z (camera space)
    ml_aperture: jnp.ndarray = None    # [MS] circular semi-aperture
    ml_eta: jnp.ndarray = None         # [MS] film-side IoR
    ml_asph: jnp.ndarray = None        # [MS,4]
    ml_offsets: jnp.ndarray = None     # [ny*nx,2] per-lens center jitter (m)
    ml_offset_sensor: jnp.ndarray = None   # [] microlens plane z
    n_surfaces: int = struct.field(pytree_node=False, default=0)
    #: static per-surface kind: "flat" | "sphere" | "biconic"
    surface_kinds: tuple = struct.field(pytree_node=False, default=())
    ca_enabled: bool = struct.field(pytree_node=False, default=False)
    simple_weighting: bool = struct.field(pytree_node=False, default=True)
    diffraction: bool = struct.field(pytree_node=False, default=False)
    kind: str = struct.field(pytree_node=False, default="realistic")
    ml_n_surfaces: int = struct.field(pytree_node=False, default=0)
    ml_surface_kinds: tuple = struct.field(pytree_node=False, default=())
    ml_dims: tuple = struct.field(pytree_node=False, default=(0, 0))
    ml_sim_radius: int = struct.field(pytree_node=False, default=0)
    #: all offsets zero => cells are exact rectangles (no table gathers)
    ml_has_offsets: bool = struct.field(pytree_node=False, default=False)


# ---------------------------------------------------------------------------
# lens file IO
# ---------------------------------------------------------------------------

def read_dat_lens(path, aperture_diameter=1.0):
    """pbrt .dat lens format: rows of [curvature_radius thickness eta
    aperture_diameter] in mm (realistic.cpp:946-980).  Returns surfaces
    front-to-back in meters-ish (x0.001, matching the reference)."""
    vals = []
    with open(path) as f:
        for line in f:
            line = line.split("#")[0]
            vals += [float(x) for x in line.split()]
    if len(vals) % 4 == 1:
        vals = vals[1:]   # leading focal length (fork tolerates it)
    surfs = []
    for i in range(0, len(vals), 4):
        r, thick, eta, ap = vals[i:i + 4]
        ap = ap if r != 0 else (aperture_diameter if aperture_diameter > 0
                                else ap)
        surfs.append(dict(radius_x=r * 1e-3, radius_y=r * 1e-3,
                          thickness=thick * 1e-3, eta=eta,
                          semi_aperture=ap * 1e-3 / 2,
                          conic_x=0.0, conic_y=0.0, asph=[0, 0, 0, 0],
                          eta_spectrum=None))
    return surfs


def read_json_lens(path, aperture_diameter=1.0):
    """omni JSON lens (omni.cpp:1220-1360).  Units: mm -> x0.001."""
    with open(path) as f:
        j = json.load(f)
    surfs = []
    for s in j.get("surfaces", []):
        def vec2(v, default=0.0):
            if v is None:
                return (default, default)
            if isinstance(v, (int, float)):
                return (float(v), float(v))
            return (float(v[0]), float(v[1]))
        rx, ry = vec2(s.get("radius"))
        ax, ay = vec2(s.get("semi_aperture"))
        cx, cy = vec2(s.get("conic_constant"))
        ior = s.get("ior", 1.0)
        eta_spectrum = None
        if isinstance(ior, list):
            lam, vv = ior[0], ior[1]
            eta_spectrum = spec.from_sampled(lam, vv)
            ior = float(np.mean(vv))
        asph = s.get("aspheric_coefficients") or [0, 0, 0, 0]
        asph = (list(asph) + [0, 0, 0, 0])[:4]
        surfs.append(dict(radius_x=rx * 1e-3, radius_y=ry * 1e-3,
                          thickness=float(s.get("thickness", 0)) * 1e-3,
                          eta=float(ior),
                          semi_aperture=ax * 1e-3,
                          conic_x=cx * 1e-3, conic_y=cy * 1e-3,
                          asph=[float(a) for a in asph],
                          eta_spectrum=eta_spectrum))
    microlens = j.get("microlens")
    return surfs, microlens


def read_eye_spec(path, scaling=1.0):
    """realisticEye spec: focal length + rows of [radiusX radiusY thickness
    mediumIndex semiDiameter conicX conicY] (realisticEye.cpp:206-240).
    Zemax sign convention (positive radius center toward scene) — flipped
    here to the pbrt convention."""
    vals = []
    with open(path) as f:
        for line in f:
            line = line.split("#")[0]
            vals += [float(x) for x in line.split()]
    focal = vals[0] * scaling
    surfs = []
    for i in range(1, len(vals), 7):
        rx, ry, thick, med, semi, cx, cy = vals[i:i + 7]
        surfs.append(dict(radius_x=-rx * scaling, radius_y=-ry * scaling,
                          thickness=thick * scaling, eta=1.0,
                          semi_aperture=semi * scaling,
                          conic_x=cx, conic_y=cy, asph=[0, 0, 0, 0],
                          eta_spectrum=None, medium_index=int(med)))
    return focal, surfs


# ---------------------------------------------------------------------------
# construction
# ---------------------------------------------------------------------------

def _paraxial_focus(surfs, focus_distance):
    """Thick-lens film distance via a paraxial ABCD sweep (float64 host),
    replacing the reference's FocusThickLens (realistic.cpp:366+)."""
    # propagate a paraxial ray from an object at -focus_distance through
    # the system front->back; find where it crosses the axis behind.
    y, u = 1.0, 1.0 / max(focus_distance, 1e-6)  # height, angle
    eta_in = 1.0
    z = 0.0
    for s in surfs:  # front to back
        r = s["radius_x"]
        eta_out = s["eta"] if s["eta"] > 0 else 1.0
        if r != 0:
            # refraction at spherical surface: n'u' = nu - y(n'-n)/R
            u = (eta_in * u - y * (eta_out - eta_in) / r) / eta_out
        # translate by thickness
        y = y + u * s["thickness"]
        z += s["thickness"]
        eta_in = eta_out
    # after the rear vertex, ray continues in air: crosses axis at y=0
    if abs(u) < 1e-12:
        return 0.05
    return max(y / -u, 1e-4) if (y / -u) > 0 else 0.05


def build_lens_camera(kind, cam_to_world: tfm.Transform, surfs,
                      film_distance=0.0, focus_distance=10.0,
                      film_diag=0.035, ca_enabled=False,
                      simple_weighting=True, diffraction=False,
                      retina_radius=0.0, retina_semi_diam=0.0,
                      ior_spectra=None, shutter_open=0.0, shutter_close=1.0,
                      pupil_diameter=None, microlens=None,
                      microlens_sensor_offset=0.001,
                      microlens_sim_radius=0):
    """surfs: list front-to-back (file order).  Builds device arrays
    ordered rear-to-front with absolute z positions (film at z=0)."""
    S = len(surfs)
    if S == 0:
        raise ValueError("lens camera needs at least one surface")
    if film_distance <= 0:
        film_distance = _paraxial_focus(surfs, focus_distance)
    # z position of each surface vertex, measured from film plane (z>0
    # toward scene): rear vertex at z=film_distance; thickness of a surface
    # (front-to-back convention) is the gap behind it, so walking
    # rear->front we add the NEXT rear surface's gap
    rear_first = list(reversed(surfs))
    z_list = []
    z = film_distance
    for i, s in enumerate(rear_first):
        z_list.append(z)
        if i + 1 < S:
            z += rear_first[i + 1]["thickness"]

    def _kind(s):
        if s["radius_x"] == 0 and s["radius_y"] == 0:
            return "flat"
        if (s["radius_x"] == s["radius_y"] and s["conic_x"] == 0
                and s["conic_y"] == 0 and not any(s["asph"])):
            return "sphere"
        return "biconic"
    surface_kinds = tuple(_kind(s) for s in rear_first)

    iors = np.ones((MAX_IOR_SPECTRA, spec.N_SPECTRAL_SAMPLES), np.float32)
    if ior_spectra:
        for i, sp in enumerate(ior_spectra[:MAX_IOR_SPECTRA]):
            if sp is not None:
                iors[i] = sp
    eta_idx = np.full(S, -1, np.int32)
    eta_const = np.ones(S, np.float32)
    for i, s in enumerate(rear_first):
        eta_const[i] = s["eta"] if s["eta"] > 0 else 1.0
        if s.get("eta_spectrum") is not None and ior_spectra is None:
            # inline spectrum: append to table
            pass
        if "medium_index" in s and s["medium_index"] > 0:
            eta_idx[i] = s["medium_index"] - 1

    N_PUPIL_ZONES = 32
    ap = np.array([s["semi_aperture"] for s in rear_first], np.float32)
    if pupil_diameter is not None:
        # the stop surface (radius 0) takes the pupil diameter (eye model)
        for i, s in enumerate(rear_first):
            if s["radius_x"] == 0:
                ap[i] = pupil_diameter / 2
    rear_ap = ap[0]
    cam = LensCamera(
        pupil_bounds=jnp.zeros((N_PUPIL_ZONES, 4), jnp.float32),
        pupil_valid=jnp.zeros(N_PUPIL_ZONES, bool),
        cam_to_world=jnp.asarray(cam_to_world.m, jnp.float32),
        # sign flip: lens files measure radii along the light direction
        # (scene->film); our camera frame traces film->scene (+z), so a
        # file radius R puts the curvature center at vertex_z - R
        curv_x=jnp.asarray([0.0 if s["radius_x"] == 0 else -1.0 / s["radius_x"]
                            for s in rear_first], jnp.float32),
        curv_y=jnp.asarray([0.0 if s["radius_y"] == 0 else -1.0 / s["radius_y"]
                            for s in rear_first], jnp.float32),
        conic_x=jnp.asarray([s["conic_x"] for s in rear_first], jnp.float32),
        conic_y=jnp.asarray([s["conic_y"] for s in rear_first], jnp.float32),
        z_pos=jnp.asarray(z_list, jnp.float32),
        aperture=jnp.asarray(ap),
        is_stop=jnp.asarray([s["radius_x"] == 0 for s in rear_first]),
        eta_const=jnp.asarray(eta_const),
        eta_idx=jnp.asarray(eta_idx),
        asph=jnp.asarray([s["asph"] for s in rear_first], jnp.float32),
        ior_spectra=jnp.asarray(iors),
        film_distance=jnp.float32(film_distance),
        film_diag=jnp.float32(film_diag),
        retina_radius=jnp.float32(retina_radius),
        retina_semi_diam=jnp.float32(retina_semi_diam),
        shutter_open=jnp.float32(shutter_open),
        shutter_close=jnp.float32(shutter_close),
        weight_scale=jnp.float32(np.pi * rear_ap ** 2
                                 / max(film_distance ** 2, 1e-12)),
        n_surfaces=S, surface_kinds=surface_kinds, ca_enabled=ca_enabled,
        simple_weighting=simple_weighting, diffraction=diffraction,
        kind=kind)
    if microlens:
        cam = _attach_microlens(cam, microlens, microlens_sensor_offset,
                                microlens_sim_radius)
    return compute_exit_pupil(cam)


def _attach_microlens(cam: LensCamera, ml: dict, sensor_offset, sim_radius):
    """Bake the microlens-array block (omni.cpp:1330+ JSON parse) into the
    camera.  Surfaces (mm units like the main stack) are stored rear-first;
    the reference walks them with elementZ -= thickness starting at 0 in
    its z-flipped lens space (omni.cpp TraceLensesFromFilm:397-410), so in
    our film-at-0/+z convention surface k sits at z = sum(thickness[0..k])."""
    msurfs = []
    for s in ml.get("surfaces", []):
        def vec2(v, default=0.0):
            if v is None:
                return (default, default)
            if isinstance(v, (int, float)):
                return (float(v), float(v))
            return (float(v[0]), float(v[1]))
        rx, ry = vec2(s.get("radius"))
        ax, ay = vec2(s.get("semi_aperture"))
        cx, cy = vec2(s.get("conic_constant"))
        asph = s.get("aspheric_coefficients") or [0, 0, 0, 0]
        asph = (list(asph) + [0, 0, 0, 0])[:4]
        msurfs.append(dict(radius_x=rx * 1e-3, radius_y=ry * 1e-3,
                           thickness=float(s.get("thickness", 0)) * 1e-3,
                           eta=float(s.get("ior", 1.0)),
                           semi_aperture=ax * 1e-3,
                           conic_x=cx * 1e-3, conic_y=cy * 1e-3,
                           asph=[float(a) for a in asph]))
    if not msurfs:
        return cam
    dims = ml.get("dimensions") or [16, 16]
    nx, ny = int(dims[0]), int(dims[1])
    offsets = np.zeros((ny * nx, 2), np.float32)
    if ml.get("offsets"):
        offs = np.asarray(ml["offsets"], np.float32).reshape(-1, 2)
        offsets[:min(len(offs), ny * nx)] = offs[:ny * nx]
    has_offsets = bool(np.any(offsets != 0))
    # rear-first with z accumulating each surface's OWN thickness (the
    # reference subtracts thickness before intersecting, omni.cpp:416)
    rear_first = list(reversed(msurfs))
    z, z_list = 0.0, []
    for s in rear_first:
        z += s["thickness"]
        z_list.append(z)

    def _kind(s):
        if s["radius_x"] == 0 and s["radius_y"] == 0:
            return "flat"
        if (s["radius_x"] == s["radius_y"] and s["conic_x"] == 0
                and s["conic_y"] == 0 and not any(s["asph"])):
            return "sphere"
        return "biconic"
    return cam.replace(
        ml_curv_x=jnp.asarray([0.0 if s["radius_x"] == 0
                               else -1.0 / s["radius_x"]
                               for s in rear_first], jnp.float32),
        ml_curv_y=jnp.asarray([0.0 if s["radius_y"] == 0
                               else -1.0 / s["radius_y"]
                               for s in rear_first], jnp.float32),
        ml_conic_x=jnp.asarray([s["conic_x"] for s in rear_first],
                               jnp.float32),
        ml_conic_y=jnp.asarray([s["conic_y"] for s in rear_first],
                               jnp.float32),
        ml_z=jnp.asarray(z_list, jnp.float32),
        ml_aperture=jnp.asarray([s["semi_aperture"] for s in rear_first],
                                jnp.float32),
        ml_eta=jnp.asarray([s["eta"] for s in rear_first], jnp.float32),
        ml_asph=jnp.asarray([s["asph"] for s in rear_first], jnp.float32),
        ml_offsets=jnp.asarray(offsets),
        ml_offset_sensor=jnp.float32(sensor_offset),
        ml_n_surfaces=len(rear_first),
        ml_surface_kinds=tuple(_kind(s) for s in rear_first),
        ml_dims=(nx, ny), ml_sim_radius=int(sim_radius),
        ml_has_offsets=has_offsets)


def compute_exit_pupil(cam: LensCamera, n_zones=32, samples=2048):
    """Per-radial-zone exit-pupil bounds on the rear plane (replacing the
    reference's per-zone projection sampling, realistic.cpp:787+):
    shoot rays from zone film points at rear-disk samples, bound the
    survivors, pad by one sample spacing."""
    import numpy as _np
    rs = _np.random.RandomState(42)
    r_max = 0.5 * float(cam.film_diag)
    rear_r = float(cam.aperture[0])
    rear_z = float(cam.z_pos[0])
    bounds = _np.zeros((n_zones, 4), _np.float32)
    valid = _np.zeros(n_zones, bool)
    pad = 2.0 * rear_r / _np.sqrt(samples)
    for z in range(n_zones):
        rf = (z + 0.5) / n_zones * r_max
        if cam.kind in ("realisticEye", "humaneye"):
            rr = float(cam.retina_radius)
            zs = rr - _np.sqrt(max(rr * rr - min(rf * rf, rr * rr * .99),
                                   1e-12))
            o_np = _np.array([rf, 0.0, zs])
        else:
            o_np = _np.array([rf, 0.0, 0.0])
        px = (rs.rand(samples) * 2 - 1) * rear_r
        py = (rs.rand(samples) * 2 - 1) * rear_r
        o = jnp.broadcast_to(jnp.asarray(o_np, jnp.float32), (samples, 3))
        rear = jnp.stack([jnp.asarray(px, jnp.float32),
                          jnp.asarray(py, jnp.float32),
                          jnp.full(samples, rear_z, jnp.float32)], -1)
        d = rear - o
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        _, _, ok = trace_lenses_from_film(cam, o, d,
                                          jnp.full(samples, 550.0))
        ok = _np.asarray(ok)
        if ok.any():
            bounds[z] = [px[ok].min() - pad, py[ok].min() - pad,
                         px[ok].max() + pad, py[ok].max() + pad]
            valid[z] = True
    # zones with no survivors inherit a neighbor (vignetted edge zones)
    for z in range(n_zones):
        if not valid[z]:
            for w in list(range(z - 1, -1, -1)) + list(range(z + 1, n_zones)):
                if valid[w]:
                    bounds[z] = bounds[w]
                    break
    return cam.replace(pupil_bounds=jnp.asarray(bounds),
                       pupil_valid=jnp.asarray(valid))


# ---------------------------------------------------------------------------
# surface intersection + refraction (batched, per unrolled surface)
# ---------------------------------------------------------------------------

def _sag(cx, cy, kx, ky, asph, x, y):
    """Biconic + even-aspheric sag z(x,y) (omni.cpp IntersectResult /
    realisticEye BiconicSag)."""
    x2, y2 = x * x, y * y
    num = cx * x2 + cy * y2
    arg = 1.0 - (1.0 + kx) * cx * cx * x2 - (1.0 + ky) * cy * cy * y2
    den = 1.0 + jnp.sqrt(jnp.maximum(arg, 1e-12))
    r2 = x2 + y2
    a = asph[0] * r2 ** 2 + asph[1] * r2 ** 3 + asph[2] * r2 ** 4 \
        + asph[3] * r2 ** 5
    return num / den + a


def _intersect_surface(o, d, z_vertex, cx, cy, kx, ky, asph, is_flat,
                       is_biconic):
    """Ray vs surface at vertex z_vertex.  Returns (t, n) with unit normal
    pointing toward -z (film side)."""
    # flat (aperture/stop) plane
    t_flat = (z_vertex - o[:, 2]) / jnp.where(jnp.abs(d[:, 2]) > 1e-12,
                                              d[:, 2], 1e-12)
    # exact sphere when cx==cy and no conic/aspherics
    radius = 1.0 / jnp.where(jnp.abs(cx) > 1e-12, cx, 1e-12)
    zc = z_vertex + radius
    oc = o - jnp.stack([jnp.zeros_like(o[:, 0]), jnp.zeros_like(o[:, 0]),
                        jnp.full_like(o[:, 0], 0.0) + zc], -1)
    A = jnp.sum(d * d, -1)
    Bq = 2 * jnp.sum(oc * d, -1)
    Cq = jnp.sum(oc * oc, -1) - radius * radius
    disc = Bq * Bq - 4 * A * Cq
    ok_s = disc >= 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = jnp.where(Bq < 0, -0.5 * (Bq - sq), -0.5 * (Bq + sq))
    t0 = q / jnp.where(A == 0, 1.0, A)
    t1 = Cq / jnp.where(q == 0, 1.0, q)
    tlo = jnp.minimum(t0, t1)
    thi = jnp.maximum(t0, t1)
    # choose hemisphere nearest the vertex: pick root whose hit z is on the
    # vertex side of the center (reference: IntersectSphericalElement uses
    # useCloserT = (d.z > 0) ^ (radius < 0))
    closer = (d[:, 2] > 0) ^ (radius < 0)
    t_sph = jnp.where(closer, tlo, thi)

    if is_biconic:
        # Newton iterations on g(t) = p_z - (z_vertex + sag(p_x,p_y))
        t = t_flat  # start from the plane
        for _ in range(10):
            p = o + t[:, None] * d
            # analytic gradient of sag
            eps = 1e-6
            s0 = _sag(cx, cy, kx, ky, asph, p[:, 0], p[:, 1])
            sx = (_sag(cx, cy, kx, ky, asph, p[:, 0] + eps, p[:, 1]) - s0) / eps
            sy = (_sag(cx, cy, kx, ky, asph, p[:, 0], p[:, 1] + eps) - s0) / eps
            g = p[:, 2] - (z_vertex + s0)
            dg = d[:, 2] - (sx * d[:, 0] + sy * d[:, 1])
            t = t - g / jnp.where(jnp.abs(dg) > 1e-9, dg, 1e-9)
        t_surf = t
        p = o + t[:, None] * d
        eps = 1e-6
        s0 = _sag(cx, cy, kx, ky, asph, p[:, 0], p[:, 1])
        sx = (_sag(cx, cy, kx, ky, asph, p[:, 0] + eps, p[:, 1]) - s0) / eps
        sy = (_sag(cx, cy, kx, ky, asph, p[:, 0], p[:, 1] + eps) - s0) / eps
        n = geom.normalize(jnp.stack([-sx, -sy, jnp.ones_like(sx)], -1))
        ok = jnp.isfinite(t_surf) & (t_surf > 1e-9)
    else:
        t_surf = jnp.where(is_flat, t_flat, t_sph)
        ok = jnp.where(is_flat, t_flat > 1e-9, ok_s & (t_surf > 1e-9))
        p = o + t_surf[:, None] * d
        n_sph = geom.normalize(p - jnp.stack(
            [jnp.zeros_like(p[:, 0]), jnp.zeros_like(p[:, 0]),
             jnp.full_like(p[:, 0], zc)], -1))
        n_flat = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), p.shape)
        n = jnp.where(is_flat, n_flat, n_sph)
    # orient normal against the incoming ray (reference faceforward)
    n = jnp.where((geom.dot(n, d) > 0)[:, None], -n, n)
    return t_surf, n, ok


def _eta_at(cam: LensCamera, si, wavelength):
    """Per-ray IoR on the film side of surface si (spectral or CA model)."""
    eta0 = cam.eta_const[si]
    idx = cam.eta_idx[si]
    has_spec = idx >= 0
    sp = cam.ior_spectra[jnp.maximum(idx, 0)]
    eta_sp = spec.value_at_wavelength(sp, wavelength)
    eta = jnp.where(has_spec & (eta_sp > 1e-3), eta_sp, eta0)
    if cam.ca_enabled:
        # linear dispersion shift (reference: realistic.cpp:352-357)
        shift = (wavelength - 550.0) * (-0.04 / 300.0)
        eta = jnp.where(eta > 1.0001, eta + shift, eta)
    return eta


def trace_lenses_from_film(cam: LensCamera, o, d, wavelength, key_bits=None):
    """Trace rays (camera space, starting at film side) through the stack
    rear->front.  Returns (o', d', valid)."""
    B = o.shape[0]
    valid = jnp.ones(B, bool)
    # reference convention (realistic.cpp TraceLensesFromFilm:302+):
    # a surface's eta is the IoR of the medium on its FILM side; crossing
    # surface i film->scene refracts etaI=eta[i] -> etaT=eta[i+1] (1 beyond
    # the front element)
    for si in range(cam.n_surfaces):
        kind = cam.surface_kinds[si]
        is_flat = kind == "flat"
        t, n, ok = _intersect_surface(
            o, d, cam.z_pos[si], cam.curv_x[si], cam.curv_y[si],
            cam.conic_x[si], cam.conic_y[si], cam.asph[si],
            is_flat, kind == "biconic")
        p = o + t[:, None] * d
        # aperture cull
        r2 = p[:, 0] ** 2 + p[:, 1] ** 2
        ok = ok & (r2 <= cam.aperture[si] ** 2)
        # HURB diffraction at the stop (realisticEye.cpp:828-850)
        if cam.diffraction and key_bits is not None:
            # Heisenberg-uncertainty ray bending: Gaussian direction
            # perturbation with stddev ~ lambda / distance-to-edge
            # (realisticEye.cpp:828-850)
            dist_edge = jnp.maximum(cam.aperture[si] - jnp.sqrt(r2), 1e-9)
            sigma = (wavelength * 1e-9) / (2 * jnp.pi * dist_edge)
            g1 = _gauss_from_bits(key_bits, si * 2)
            g2 = _gauss_from_bits(key_bits, si * 2 + 1)
            perturb = (cam.is_stop[si] & valid)
            d = jnp.where(perturb[:, None],
                          geom.normalize(d + jnp.stack(
                              [g1 * sigma, g2 * sigma,
                               jnp.zeros_like(g1)], -1)), d)
        # refract: eta ratio across surface (skip at flat stop)
        eta_i = _eta_at(cam, si, wavelength)
        if si + 1 < cam.n_surfaces:
            eta_t = _eta_at(cam, si + 1, wavelength)
        else:
            eta_t = jnp.ones_like(eta_i)
        ratio = eta_i / jnp.maximum(eta_t, 1e-6)
        can, wt = geom.refract(-d, n, ratio)
        refracted = geom.normalize(wt)
        if is_flat:
            new_d, ok_r = d, jnp.ones(B, bool)
        else:
            new_d, ok_r = jnp.where(can[:, None], refracted, d), can
        ok = ok & ok_r
        d = jnp.where(valid[:, None], new_d, d)
        o = jnp.where(valid[:, None], p, o)
        valid = valid & ok
    return o, d, valid


# ---------------------------------------------------------------------------
# microlens array (omni.cpp:963-1140)
# ---------------------------------------------------------------------------

def _ml_extent(cam, width, height):
    """Physical film extent half-sizes (film.cpp GetPhysicalExtent)."""
    aspect = height / width
    fw = jnp.sqrt(cam.film_diag ** 2 / (1 + aspect * aspect))
    return fw, fw * aspect


def _ml_index(cam, px, py, fw, fh):
    """Microlens cell index of a film point (omni.cpp MicrolensIndex:963)."""
    nx, ny = cam.ml_dims
    ix = jnp.floor((px / fw + 0.5) * nx).astype(jnp.int32)
    iy = jnp.floor((py / fh + 0.5) * ny).astype(jnp.int32)
    return ix, iy


def _ml_center(cam, ix, iy, fw, fh):
    """Lens center for an index, + per-lens offset when in range
    (omni.cpp MicrolensCenterFromIndex:1037)."""
    nx, ny = cam.ml_dims
    cx = ((ix + 0.5) / nx - 0.5) * fw
    cy = ((iy + 0.5) / ny - 0.5) * fh
    inside = (ix >= 0) & (iy >= 0) & (ix < nx) & (iy < ny)
    if cam.ml_has_offsets:
        flat = jnp.clip(iy, 0, ny - 1) * nx + jnp.clip(ix, 0, nx - 1)
        off = cam.ml_offsets[flat]          # [B,2]
        cx = cx + jnp.where(inside, off[:, 0], 0.0)
        cy = cy + jnp.where(inside, off[:, 1], 0.0)
    return cx, cy


def _ml_cell_corners(cam, ix, iy, fw, fh):
    """Cell corners, CCW from (-,-): each corner is the average of its 4
    adjacent lens centers (omni.cpp MicrolensElementFromIndex:1048-1066);
    exact rectangles when the offset table is all zero."""
    nx, ny = cam.ml_dims
    if not cam.ml_has_offsets:
        cx = ((ix + 0.5) / nx - 0.5) * fw
        cy = ((iy + 0.5) / ny - 0.5) * fh
        hw, hh = 0.5 * fw / nx, 0.5 * fh / ny
        return [(cx - hw, cy - hh), (cx + hw, cy - hh),
                (cx + hw, cy + hh), (cx - hw, cy + hh)]
    corners = []
    for sx, sy in ((-1, -1), (1, -1), (1, 1), (-1, 1)):
        ax0 = 0 if sx > 0 else -1
        ay0 = 0 if sy > 0 else -1
        xx = yy = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                ccx, ccy = _ml_center(cam, ix + ax0 + dx, iy + ay0 + dy,
                                      fw, fh)
                xx = xx + ccx
                yy = yy + ccy
        corners.append((xx * 0.25, yy * 0.25))
    return corners


def _in_quad(px, py, corners):
    """Point-in-convex-quad via consistent edge cross signs (CCW corners)."""
    inside = None
    for i in range(4):
        x0, y0 = corners[i]
        x1, y1 = corners[(i + 1) % 4]
        s = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
        inside = (s >= 0) if inside is None else inside & (s >= 0)
    return inside


def _ml_trace_stack(cam, o, d, wavelength, cx, cy, corners, rear_only=False):
    """Trace the microlens element stack under lens center (cx, cy)
    (omni.cpp TraceLensesFromFilm with ComputeCameraToMicrolens:1033 —
    the lateral translate is applied per ray; the reference's z flip is
    already folded into our +z convention).  corners are CELL bounds in
    film space; the aperture test is circular AND the cell quad
    (TraceElement:>bounds).  rear_only: return (t, ok) of the rear
    surface only (TToBackLens:450)."""
    B = o.shape[0]
    ol = o - jnp.stack([cx, cy, jnp.zeros_like(cx)], -1)
    cc = [(qx - cx, qy - cy) for qx, qy in corners]   # centered bounds
    valid = jnp.ones(B, bool)
    n_s = 1 if rear_only else cam.ml_n_surfaces
    for k in range(n_s):
        kind = cam.ml_surface_kinds[k]
        t, n, ok = _intersect_surface(
            ol, d, cam.ml_z[k], cam.ml_curv_x[k], cam.ml_curv_y[k],
            cam.ml_conic_x[k], cam.ml_conic_y[k], cam.ml_asph[k],
            kind == "flat", kind == "biconic")
        p = ol + t[:, None] * d
        r2 = p[:, 0] ** 2 + p[:, 1] ** 2
        ok = ok & (r2 <= cam.ml_aperture[k] ** 2)
        ok = ok & _in_quad(p[:, 0], p[:, 1], cc)
        if rear_only:
            return t, valid & ok
        eta_i = cam.ml_eta[k]
        eta_t = cam.ml_eta[k + 1] if k + 1 < cam.ml_n_surfaces else 1.0
        if cam.ca_enabled:
            shift = (wavelength - 550.0) * (-0.04 / 300.0)
            eta_i = jnp.where(eta_i > 1.0001, eta_i + shift, eta_i)
            eta_t = jnp.where(eta_t > 1.0001, eta_t + shift, eta_t)
        ratio = eta_i / jnp.maximum(eta_t, 1e-6)
        if kind != "flat":
            can, wt = geom.refract(-d, n, jnp.broadcast_to(ratio, (B,)))
            new_d = jnp.where(can[:, None], geom.normalize(wt), d)
            ok = ok & can
        else:
            new_d = d
        d = jnp.where(valid[:, None], new_d, d)
        ol = jnp.where(valid[:, None], p, ol)
        valid = valid & ok
    o_out = ol + jnp.stack([cx, cy, jnp.zeros_like(cx)], -1)
    return o_out, d, valid


def _ml_sample_pupil(cam, px, py, u_lens, fw, fh):
    """Sample the (2R+1)^2-cell neighborhood on the microlens plane
    (omni.cpp SampleMicrolensPupil:972)."""
    nx, ny = cam.ml_dims
    R = cam.ml_sim_radius
    ix, iy = _ml_index(cam, px, py, fw, fh)
    diam = 2.0 * R + 1.0
    sx = ((ix - R + u_lens[:, 0] * diam) / nx - 0.5) * fw
    sy = ((iy - R + u_lens[:, 1] * diam) / ny - 0.5) * fh
    area = fw * fh * diam * diam / (nx * ny)
    return jnp.stack([sx, sy,
                      jnp.full_like(sx, 0.0) + cam.ml_offset_sensor], -1), \
        area


def _ml_full_trace(cam, o, d, wavelength, fw, fh):
    """Pick the first microlens element the ray actually crosses among the
    (2R+1)^2 neighborhood, trace its stack, then the main stack
    (omni.cpp TraceFullLensSystemFromFilm:1074-1110)."""
    B = o.shape[0]
    # cell under the point where the ray crosses the microlens plane
    tz = cam.ml_offset_sensor / jnp.where(jnp.abs(d[:, 2]) > 1e-12,
                                          d[:, 2], 1e-12)
    pmx = o[:, 0] + tz * d[:, 0]
    pmy = o[:, 1] + tz * d[:, 1]
    cix, ciy = _ml_index(cam, pmx, pmy, fw, fh)
    R = cam.ml_sim_radius
    best_t = jnp.full(B, jnp.inf)
    best = None
    for dy in range(-R, R + 1):
        for dx in range(-R, R + 1):
            ix, iy = cix + dx, ciy + dy
            cx, cy = _ml_center(cam, ix, iy, fw, fh)
            corners = _ml_cell_corners(cam, ix, iy, fw, fh)
            t, ok = _ml_trace_stack(cam, o, d, wavelength, cx, cy,
                                    corners, rear_only=True)
            t = jnp.where(ok, t, jnp.inf)
            take = t < best_t
            if best is None:
                best = (cx, cy) + tuple(c for q in corners for c in q)
            else:
                best = tuple(jnp.where(take, new, old) for new, old in zip(
                    (cx, cy) + tuple(c for q in corners for c in q), best))
            best_t = jnp.minimum(best_t, t)
    bcx, bcy = best[0], best[1]
    bcorners = [(best[2 + 2 * i], best[3 + 2 * i]) for i in range(4)]
    o1, d1, ok1 = _ml_trace_stack(cam, o, d, wavelength, bcx, bcy, bcorners)
    ok1 = ok1 & jnp.isfinite(best_t)
    o2, d2, ok2 = trace_lenses_from_film(cam, o1, d1, wavelength)
    return o2, d2, ok1 & ok2


def _gauss_from_bits(key_bits, salt):
    u1 = prng.uniform_float(key_bits, prng._u32(salt))
    u2 = prng.uniform_float(key_bits, prng._u32(salt + 977))
    return jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-9))) * \
        jnp.cos(2 * jnp.pi * u2)


# ---------------------------------------------------------------------------
# ray generation
# ---------------------------------------------------------------------------

def generate_rays(cam: LensCamera, pfilm, u_lens, u_time=None,
                  width=None, height=None, wavelength=None):
    """Batch camera rays through the lens stack (GenerateRay,
    realistic.cpp:899-935 / omni.cpp:1121-1172 / realisticEye.cpp:471+).

    Returns (Ray in world space, weight).  Rays that die in the lens get
    weight 0 and tmax<0 (traversal no-ops them).
    """
    B = pfilm.shape[0]
    aspect = height / width
    diag = cam.film_diag
    fw = jnp.sqrt(diag * diag / (1 + aspect * aspect))
    fh = fw * aspect
    # film sample position (camera space; film z=0; x flipped like pbrt)
    sx = (0.5 - pfilm[:, 0] / width) * fw
    sy = (pfilm[:, 1] / height - 0.5) * fh
    if cam.kind in ("realisticEye", "humaneye"):
        # curved retina start point (realisticEye.cpp:499-544): retina apex
        # at z=0, off-axis points bulge toward the lens (+z)
        rr = cam.retina_radius
        semi = cam.retina_semi_diam
        x = sx / jnp.maximum(fw, 1e-9) * 2 * semi
        y = sy / jnp.maximum(fh, 1e-9) * 2 * semi
        r2 = jnp.minimum(x * x + y * y, semi * semi * 0.999)
        zs = rr - jnp.sqrt(jnp.maximum(rr * rr - r2, 1e-12))
        o = jnp.stack([x, y, zs], -1)
    else:
        o = jnp.stack([sx, sy, jnp.zeros(B)], -1)
    if wavelength is None:
        wavelength_b = jnp.full(B, 550.0)
    else:
        wavelength_b = jnp.broadcast_to(jnp.asarray(wavelength, jnp.float32),
                                        (B,))
    if cam.ml_n_surfaces > 0:
        # microlens path (omni.cpp GenerateRay:1135-1186): sample the cell
        # neighborhood on the microlens plane instead of the exit pupil,
        # trace micro stack then main stack
        fw_e, fh_e = _ml_extent(cam, width, height)
        p_rear, bounds_area = _ml_sample_pupil(cam, o[:, 0], o[:, 1],
                                               u_lens, fw_e, fh_e)
        d = geom.normalize(p_rear - o)
        o2, d2, ok = _ml_full_trace(cam, o, d, wavelength_b, fw_e, fh_e)
        wo = tfm.xform_point(cam.cam_to_world, o2)
        wd = geom.normalize(tfm.xform_vector(cam.cam_to_world, d2))
        cos_t = geom.absdot(geom.normalize(p_rear - o),
                            jnp.asarray([0.0, 0.0, 1.0]))
        R = cam.ml_sim_radius
        if cam.simple_weighting:
            weight = jnp.where(ok, cos_t ** 4 * float((2 * R + 1) ** 2), 0.0)
        else:
            rear_z = cam.z_pos[0]
            weight = jnp.where(
                ok, (cam.shutter_close - cam.shutter_open) * cos_t ** 4
                * bounds_area / jnp.maximum(rear_z * rear_z, 1e-12), 0.0)
        if u_time is None:
            time = jnp.broadcast_to(cam.shutter_open, (B,))
        else:
            time = cam.shutter_open + u_time * (cam.shutter_close
                                                - cam.shutter_open)
        ray = geom.Ray.make(wo, wd, wavelength=wavelength_b, time=time)
        return ray.replace(tmax=jnp.where(ok, ray.tmax, -1.0)), weight
    # sample the precomputed exit pupil for this film radius (reference
    # SampleExitPupil, realistic.cpp:855+), rotated to the film azimuth
    nz = cam.pupil_bounds.shape[0]
    r_film = jnp.sqrt(o[:, 0] ** 2 + o[:, 1] ** 2)
    r_max = 0.5 * cam.film_diag
    zone = jnp.clip((r_film / jnp.maximum(r_max, 1e-9) * nz).astype(
        jnp.int32), 0, nz - 1)
    pb = cam.pupil_bounds[zone]                      # [B,4]
    px = pb[:, 0] + u_lens[:, 0] * (pb[:, 2] - pb[:, 0])
    py = pb[:, 1] + u_lens[:, 1] * (pb[:, 3] - pb[:, 1])
    safe_r = jnp.maximum(r_film, 1e-12)
    cphi = jnp.where(r_film > 1e-9, o[:, 0] / safe_r, 1.0)
    sphi = jnp.where(r_film > 1e-9, o[:, 1] / safe_r, 0.0)
    p_rear = jnp.stack([cphi * px - sphi * py, sphi * px + cphi * py,
                        jnp.full(B, 0.0) + cam.z_pos[0]], -1)
    d = geom.normalize(p_rear - o)
    if wavelength is None:
        wavelength = jnp.full(B, 550.0)
    else:
        wavelength = jnp.broadcast_to(jnp.asarray(wavelength, jnp.float32),
                                      (B,))
    key_bits = prng.hash_combine(
        (pfilm[:, 0] * 4096).astype(jnp.uint32),
        (pfilm[:, 1] * 4096).astype(jnp.uint32))
    o2, d2, ok = trace_lenses_from_film(cam, o, d, wavelength, key_bits)
    # to world
    wo = tfm.xform_point(cam.cam_to_world, o2)
    wd = geom.normalize(tfm.xform_vector(cam.cam_to_world, d2))
    cos_t = geom.absdot(geom.normalize(p_rear - o),
                        jnp.asarray([0.0, 0.0, 1.0]))
    if cam.simple_weighting:
        weight = jnp.where(ok, 1.0, 0.0)
    else:
        weight = jnp.where(ok, cos_t ** 4 * cam.weight_scale, 0.0)
    if u_time is None:
        time = jnp.broadcast_to(cam.shutter_open, (B,))
    else:
        time = cam.shutter_open + u_time * (cam.shutter_close
                                            - cam.shutter_open)
    ray = geom.Ray.make(wo, wd, wavelength=wavelength, time=time)
    return ray.replace(tmax=jnp.where(ok, ray.tmax, -1.0)), weight


# ---------------------------------------------------------------------------
# scene-level construction (used by the CLI)
# ---------------------------------------------------------------------------

def make_lens_camera(job, width, height):
    cp = job.camera_params
    kind = job.camera_kind
    lensfile = cp.get("lensfile", "")
    if kind == "realistic":
        if not lensfile:
            raise ValueError("realistic camera requires lensfile")
        surfs = read_dat_lens(lensfile, cp.get("aperturediameter", 1.0))
        return build_lens_camera(
            "realistic", job.cam_to_world, surfs,
            film_distance=cp.get("filmdistance", 0.0) * 1e-3,
            focus_distance=cp.get("focaldistance", 10.0),
            film_diag=job.film_diagonal * 1e-3,
            ca_enabled=bool(cp.get("chromaticAberrationEnabled", False)),
            shutter_open=cp.get("shutteropen", 0.0),
            shutter_close=cp.get("shutterclose", 1.0))
    if kind == "omni":
        if not lensfile:
            raise ValueError("omni camera requires lensfile (json)")
        surfs, microlens = read_json_lens(lensfile,
                                          cp.get("aperturediameter", 1.0))
        return build_lens_camera(
            "omni", job.cam_to_world, surfs,
            film_distance=cp.get("filmdistance", 0.0) * 1e-3,
            focus_distance=cp.get("focaldistance", 10.0),
            film_diag=job.film_diagonal * 1e-3,
            ca_enabled=bool(cp.get("chromaticAberrationEnabled", False)),
            shutter_open=cp.get("shutteropen", 0.0),
            shutter_close=cp.get("shutterclose", 1.0),
            microlens=microlens,
            microlens_sensor_offset=cp.get("microlenssensoroffset", 0.001),
            microlens_sim_radius=int(cp.get("microlenssimulationradius",
                                            0)))
    if kind in ("realisticEye", "realisticeye", "humaneye"):
        specfile = cp.get("specfile", "") or lensfile
        if not specfile:
            raise ValueError("realisticEye camera requires specfile")
        mm = bool(cp.get("mmUnits", True))
        scaling = 1.0 if mm else 1e-3
        focal, surfs = read_eye_spec(specfile, scaling)
        iors = [cp.get(f"ior{i}") for i in range(1, 7)]
        return build_lens_camera(
            "realisticEye", job.cam_to_world, surfs,
            film_distance=cp.get("retinaDistance", 16.32) * scaling,
            film_diag=2 * cp.get("retinaSemiDiam", 4.0) * scaling,
            retina_radius=cp.get("retinaRadius", 12.0) * scaling,
            retina_semi_diam=cp.get("retinaSemiDiam", 4.0) * scaling,
            ior_spectra=iors,
            diffraction=bool(cp.get("diffractionEnabled", False)),
            pupil_diameter=cp.get("pupilDiameter", 4.0) * scaling,
            shutter_open=cp.get("shutteropen", 0.0),
            shutter_close=cp.get("shutterclose", 1.0))
    raise ValueError(f"unknown lens camera {kind}")
