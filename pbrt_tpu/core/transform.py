"""4x4 transforms (reference: src/core/transform.{h,cpp}).

A Transform is a pair of 4x4 matrices (m, m_inv) held as numpy on the host
during scene building and as jnp once compiled.  Animated transforms are a
(t0, t1) pair with TRS decomposition + slerp (reference AnimatedTransform);
v1 exposes the two-keyframe lerp used by `time`-tagged rays.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import geometry as geom


class Transform:
    """Host-side transform used by the parser/scene compiler."""

    __slots__ = ("m", "m_inv")

    def __init__(self, m=None, m_inv=None):
        self.m = np.eye(4) if m is None else np.asarray(m, dtype=np.float64)
        self.m_inv = (np.linalg.inv(self.m) if m_inv is None
                      else np.asarray(m_inv, dtype=np.float64))

    def inverse(self):
        return Transform(self.m_inv, self.m)

    def __mul__(self, other):
        return Transform(self.m @ other.m, other.m_inv @ self.m_inv)

    def __eq__(self, other):
        return np.array_equal(self.m, other.m)

    def is_identity(self):
        return np.allclose(self.m, np.eye(4))

    def swaps_handedness(self):
        return np.linalg.det(self.m[:3, :3]) < 0.0

    # host-side point/vector application (numpy)
    def apply_point(self, p):
        p = np.asarray(p, dtype=np.float64)
        ph = p @ self.m[:3, :3].T + self.m[:3, 3]
        w = p @ self.m[3, :3].T + self.m[3, 3]
        return ph / w[..., None] if np.any(w != 1.0) else ph

    def apply_vector(self, v):
        return np.asarray(v, dtype=np.float64) @ self.m[:3, :3].T

    def apply_normal(self, n):
        return np.asarray(n, dtype=np.float64) @ self.m_inv[:3, :3]


# ---------------------------------------------------------------------------
# constructors (reference: transform.cpp Translate/Scale/RotateX.../LookAt)
# ---------------------------------------------------------------------------

def translate(x, y, z):
    m = np.eye(4)
    m[:3, 3] = [x, y, z]
    mi = np.eye(4)
    mi[:3, 3] = [-x, -y, -z]
    return Transform(m, mi)


def scale(x, y, z):
    m = np.diag([x, y, z, 1.0])
    mi = np.diag([1.0 / x, 1.0 / y, 1.0 / z, 1.0])
    return Transform(m, mi)


def rotate(angle_deg, x, y, z):
    a = np.array([x, y, z], dtype=np.float64)
    a = a / np.linalg.norm(a)
    s, c = np.sin(np.radians(angle_deg)), np.cos(np.radians(angle_deg))
    m = np.eye(4)
    m[0, 0] = a[0] * a[0] + (1 - a[0] * a[0]) * c
    m[0, 1] = a[0] * a[1] * (1 - c) - a[2] * s
    m[0, 2] = a[0] * a[2] * (1 - c) + a[1] * s
    m[1, 0] = a[0] * a[1] * (1 - c) + a[2] * s
    m[1, 1] = a[1] * a[1] + (1 - a[1] * a[1]) * c
    m[1, 2] = a[1] * a[2] * (1 - c) - a[0] * s
    m[2, 0] = a[0] * a[2] * (1 - c) - a[1] * s
    m[2, 1] = a[1] * a[2] * (1 - c) + a[0] * s
    m[2, 2] = a[2] * a[2] + (1 - a[2] * a[2]) * c
    return Transform(m, m.T)


def look_at(eye, look, up):
    """Camera-to-world (reference: transform.cpp LookAt)."""
    eye = np.asarray(eye, dtype=np.float64)
    look = np.asarray(look, dtype=np.float64)
    up = np.asarray(up, dtype=np.float64)
    d = look - eye
    d = d / np.linalg.norm(d)
    right = np.cross(up / np.linalg.norm(up), d)
    nr = np.linalg.norm(right)
    if nr < 1e-10:
        raise ValueError("LookAt: up parallel to view direction")
    right /= nr
    new_up = np.cross(d, right)
    m = np.eye(4)
    m[:3, 0] = right
    m[:3, 1] = new_up
    m[:3, 2] = d
    m[:3, 3] = eye
    return Transform(m)


def perspective(fov_deg, znear, zfar):
    """Projective perspective transform (reference: transform.cpp Perspective)."""
    p = np.array([[1, 0, 0, 0],
                  [0, 1, 0, 0],
                  [0, 0, zfar / (zfar - znear), -zfar * znear / (zfar - znear)],
                  [0, 0, 1, 0]], dtype=np.float64)
    inv_tan = 1.0 / np.tan(np.radians(fov_deg) / 2.0)
    return Transform(np.diag([inv_tan, inv_tan, 1.0, 1.0]) @ p)


def orthographic(znear, zfar):
    m = np.eye(4)
    m[2, 2] = 1.0 / (zfar - znear)
    m[2, 3] = -znear / (zfar - znear)
    return Transform(m)


def concat_transform(*ts):
    out = Transform()
    for t in ts:
        out = out * t
    return out


# ---------------------------------------------------------------------------
# device-side application ([...,3] points through a [4,4] jnp matrix)
# ---------------------------------------------------------------------------

def xform_point(m, p):
    ph = p @ m[:3, :3].T + m[:3, 3]
    w = p @ m[3, :3].T + m[3, 3]
    return ph / w[..., None]


def xform_vector(m, v):
    return v @ m[:3, :3].T


def xform_normal(m_inv, n):
    return n @ m_inv[:3, :3]


def xform_ray(m, ray):
    """Transform a Ray pytree, preserving wavelength (fork: transform.h:264)."""
    return ray.replace(o=xform_point(m, ray.o), d=xform_vector(m, ray.d))


# ---------------------------------------------------------------------------
# AnimatedTransform (two keyframes; reference transform.cpp:255+ decomposes
# into T/R/S and slerps — we decompose host-side and expose interpolation)
# ---------------------------------------------------------------------------

class AnimatedTransform:
    def __init__(self, t0: Transform, t1: Transform, time0=0.0, time1=1.0):
        self.t0, self.t1 = t0, t1
        self.time0, self.time1 = time0, time1
        self.animated = not np.allclose(t0.m, t1.m)

    def interpolate(self, t):
        """Host-side matrix lerp (adequate for small rotations; full
        quaternion slerp is used when rotation delta is large)."""
        if not self.animated:
            return self.t0
        dt = np.clip((t - self.time0) / (self.time1 - self.time0), 0, 1)
        return Transform((1 - dt) * self.t0.m + dt * self.t1.m)


# ---------------------------------------------------------------------------
# device-side animated-transform machinery (reference: transform.cpp:98-151
# Decompose + :255+ Interpolate, re-designed for per-ray vectorized times)
# ---------------------------------------------------------------------------

def decompose_trs(m):
    """Host-side M = T R S decomposition (polar iteration, numpy).

    Returns (t [3], q [4] wxyz, s [3,3]) — the reference's
    AnimatedTransform::Decompose."""
    m = np.asarray(m, np.float64)
    t = m[:3, 3].copy()
    M = m[:3, :3].copy()
    R = M.copy()
    for _ in range(100):
        Rn = 0.5 * (R + np.linalg.inv(R.T))
        if np.abs(Rn - R).max() < 1e-10:
            R = Rn
            break
        R = Rn
    S = np.linalg.inv(R) @ M
    return (t.astype(np.float32), quat_from_matrix(R).astype(np.float32),
            S.astype(np.float32))


def quat_from_matrix(R):
    """Rotation matrix -> quaternion (w, x, y, z) (quaternion.cpp)."""
    R = np.asarray(R, np.float64)
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0)
        w = 0.5 * s
        s = 0.5 / s
        return np.array([w, (R[2, 1] - R[1, 2]) * s,
                         (R[0, 2] - R[2, 0]) * s,
                         (R[1, 0] - R[0, 1]) * s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 0.0))
    qi = 0.5 * s
    s = 0.5 / max(s, 1e-12)
    q = np.zeros(4)
    q[0] = (R[k, j] - R[j, k]) * s
    q[1 + i] = qi
    q[1 + j] = (R[j, i] + R[i, j]) * s
    q[1 + k] = (R[k, i] + R[i, k]) * s
    return q


def animated_pair(m0, m1):
    """Host precompute for a two-keyframe transform: stacked decomposed
    pieces (t [2,3], q [2,4] with q1 sign-aligned to q0, s [2,3,3])."""
    t0, q0, s0 = decompose_trs(m0)
    t1, q1, s1 = decompose_trs(m1)
    if float(np.dot(q0, q1)) < 0.0:
        q1 = -q1
    return (np.stack([t0, t1]), np.stack([q0, q1]), np.stack([s0, s1]))


def quat_to_matrix_j(q):
    """jnp quaternion [...,4] (wxyz) -> rotation matrix [...,3,3]."""
    import jax.numpy as jnp
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                   2 * (x * z + y * w)], -1),
        jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                   2 * (y * z - x * w)], -1),
        jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w),
                   1 - 2 * (x * x + y * y)], -1)], -2)


def slerp_j(q0, q1, u):
    """jnp slerp with lerp fallback near parallel (quaternion.cpp:63)."""
    import jax.numpy as jnp
    d = jnp.sum(q0 * q1, -1)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(jnp.clip(d, -1.0 + 1e-7, 1.0 - 1e-7))
    sin_t = jnp.sin(theta)
    near = d > 0.9995
    w0 = jnp.where(near, 1.0 - u, jnp.sin((1.0 - u) * theta)
                   / jnp.maximum(sin_t, 1e-9))
    w1 = jnp.where(near, u, jnp.sin(u * theta)
                   / jnp.maximum(sin_t, 1e-9))
    q = w0[..., None] * q0 + w1[..., None] * q1
    import jax
    return q * jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, -1), 1e-20)
                             )[..., None]


def interp_matrix_j(anim_t, anim_q, anim_s, u):
    """Per-sample interpolated affine [..., 3, 4] from stacked decomposed
    pieces; u in [0,1] broadcastable to the leading dims."""
    import jax.numpy as jnp
    uu = u[..., None]
    t = (1 - uu) * anim_t[..., 0, :] + uu * anim_t[..., 1, :]
    s = ((1 - uu[..., None]) * anim_s[..., 0, :, :]
         + uu[..., None] * anim_s[..., 1, :, :])
    q = slerp_j(jnp.broadcast_to(anim_q[..., 0, :], u.shape + (4,)),
                jnp.broadcast_to(anim_q[..., 1, :], u.shape + (4,)), u)
    R = quat_to_matrix_j(q)
    RS = jnp.einsum("...ij,...jk->...ik", R, s)
    return jnp.concatenate([RS, t[..., None]], -1)   # [...,3,4]


def affine_inverse_j(m34):
    """jnp inverse of an affine [...,3,4] (adjugate 3x3 + translation)."""
    import jax.numpy as jnp
    A = m34[..., :3]
    t = m34[..., 3]
    c0 = jnp.cross(A[..., :, 1], A[..., :, 2], axis=-1)
    det = jnp.sum(A[..., :, 0] * c0, -1)
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1.0)
    adj = jnp.stack([jnp.cross(A[..., :, 1], A[..., :, 2], axis=-1),
                     jnp.cross(A[..., :, 2], A[..., :, 0], axis=-1),
                     jnp.cross(A[..., :, 0], A[..., :, 1], axis=-1)], -2)
    Ainv = adj * inv_det[..., None, None]
    tinv = -jnp.einsum("...ij,...j->...i", Ainv, t)
    return jnp.concatenate([Ainv, tinv[..., None]], -1)
