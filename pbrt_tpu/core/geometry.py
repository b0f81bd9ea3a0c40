"""SoA vector geometry for batched ray tracing.

The reference's Vector/Point/Normal/Ray/Bounds types (src/core/geometry.h:99-1598)
become plain jnp arrays with a trailing xyz axis, plus a `Ray` pytree that
carries the fork's per-ray wavelength tag (geometry.h:869-899).  All helpers
broadcast over arbitrary leading batch dims and are jit/vmap/grad friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

INF = float("inf")  # python float: module import must not touch a device
#: machine-epsilon/2 for fp32, used for conservative error bounds
MACHINE_EPS = 5.960464477539063e-08


def gamma(n):
    """pbrt's gamma(n) rounding-error bound (reference: src/core/pbrt.h:292-294)."""
    return (n * MACHINE_EPS) / (1 - n * MACHINE_EPS)


# ---------------------------------------------------------------------------
# vector helpers ([..., 3] arrays)
# ---------------------------------------------------------------------------

def vec(x, y, z, dtype=jnp.float32):
    return jnp.stack([jnp.asarray(x, dtype), jnp.asarray(y, dtype),
                      jnp.asarray(z, dtype)], axis=-1)


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def absdot(a, b):
    return jnp.abs(dot(a, b))


def cross(a, b):
    return jnp.cross(a, b)


def length_sq(a):
    return jnp.sum(a * a, axis=-1)


def length(a):
    return jnp.sqrt(length_sq(a))


def normalize(a, eps=1e-20):
    return a * jax.lax.rsqrt(jnp.maximum(length_sq(a), eps))[..., None]


def distance(a, b):
    return length(a - b)


def faceforward(n, v):
    """Flip n to lie in the hemisphere of v (reference: geometry.h Faceforward)."""
    return jnp.where(dot(n, v)[..., None] < 0.0, -n, n)


def coordinate_system(v1):
    """Build an orthonormal frame around unit v1 (branchless Duff et al.).

    Reference: geometry.h CoordinateSystem (:234).  Returns (v2, v3).
    """
    sign = jnp.where(v1[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + v1[..., 2])
    b = v1[..., 0] * v1[..., 1] * a
    v2 = jnp.stack([1.0 + sign * v1[..., 0] ** 2 * a, sign * b,
                    -sign * v1[..., 0]], axis=-1)
    v3 = jnp.stack([b, sign + v1[..., 1] ** 2 * a, -v1[..., 1]], axis=-1)
    return v2, v3


def spherical_direction(sin_theta, cos_theta, phi):
    return jnp.stack([sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi),
                      cos_theta], axis=-1)


def spherical_theta(v):
    return jnp.arccos(jnp.clip(v[..., 2], -1.0, 1.0))


def spherical_phi(v):
    p = jnp.arctan2(v[..., 1], v[..., 0])
    return jnp.where(p < 0.0, p + 2.0 * jnp.pi, p)


def reflect(wo, n):
    """Mirror reflection of wo about n (reference: reflection.h Reflect)."""
    return -wo + 2.0 * dot(wo, n)[..., None] * n


def refract(wi, n, eta):
    """Snell refraction; returns (valid_mask, wt).

    eta = eta_i / eta_t.  Reference: reflection.h Refract (:97).
    """
    cos_i = dot(n, wi)
    sin2_i = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    sin2_t = eta * eta * sin2_i
    valid = sin2_t < 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 1e-14))
    wt = eta[..., None] * -wi + (eta * cos_i - cos_t)[..., None] * n
    return valid, wt


def frame_to_world(u, v, w, local):
    """Local (x,y,z) coords -> world vector given orthonormal frame (u,v,w)."""
    return (local[..., 0:1] * u + local[..., 1:2] * v + local[..., 2:3] * w)


def world_to_frame(u, v, w, world):
    return jnp.stack([dot(world, u), dot(world, v), dot(world, w)], axis=-1)


def lerp(t, a, b):
    return (1.0 - t) * a + t * b


# ---------------------------------------------------------------------------
# Ray (SoA pytree) — carries the fork's wavelength tag
# ---------------------------------------------------------------------------

@struct.dataclass
class Ray:
    """A batch of rays.

    o, d: [..., 3]; tmax: [...]; wavelength: [...] (nm, fork field
    geometry.h:875-898, default 550); time: [...].
    """
    o: jnp.ndarray
    d: jnp.ndarray
    tmax: jnp.ndarray
    wavelength: jnp.ndarray
    time: jnp.ndarray

    @classmethod
    def make(cls, o, d, tmax=None, wavelength=None, time=None):
        batch = jnp.broadcast_shapes(o.shape[:-1], d.shape[:-1])
        if tmax is None:
            tmax = jnp.full(batch, INF)
        if wavelength is None:
            wavelength = jnp.full(batch, 550.0)
        if time is None:
            time = jnp.zeros(batch)
        return cls(o=o, d=d, tmax=jnp.broadcast_to(tmax, batch),
                   wavelength=jnp.broadcast_to(wavelength, batch),
                   time=jnp.broadcast_to(time, batch))

    def at(self, t):
        return self.o + t[..., None] * self.d


def offset_ray_origin(p, p_error, n, w):
    """Offset a spawned ray origin along the normal past the error bounds
    (reference: geometry.h OffsetRayOrigin :1419-1431)."""
    d = dot(jnp.abs(n), p_error)
    offset = d[..., None] * n
    offset = jnp.where(dot(w, n)[..., None] < 0.0, -offset, offset)
    po = p + offset
    # round away from p
    po = jnp.where(offset > 0, jnp.nextafter(po, jnp.inf),
                   jnp.where(offset < 0, jnp.nextafter(po, -jnp.inf), po))
    return po


# ---------------------------------------------------------------------------
# Bounds ([...,3] lo / hi pairs)
# ---------------------------------------------------------------------------

def bounds_union(lo1, hi1, lo2, hi2):
    return jnp.minimum(lo1, lo2), jnp.maximum(hi1, hi2)


def bounds_ray_intersect(lo, hi, o, inv_d, tmax):
    """Slab test (reference: geometry.h Bounds3::IntersectP :1460-1494).

    Returns hit mask; conservative by the 1+2*gamma(3) factor.
    """
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tfar = jnp.min(jnp.maximum(t0, t1), axis=-1) * (1 + 2 * gamma(3))
    return (tnear <= tfar) & (tnear < tmax) & (tfar > 0.0)
