"""Texture evaluation (reference: src/core/texture.{h,cpp} +
src/textures/*).

Device representation: a stacked RGB texture array [T, RES, RES, 3]
(images resampled at scene compile; RGB->spectrum promotion happens at
shading with the Smits bases so storage stays 3-channel), plus a typed
parameter table for procedural textures.  Evaluation is a masked switch —
the wavefront analog of Texture<T>::Evaluate virtual dispatch.

Types: image (trilinear over a mip pyramid; reference core/mipmap.h —
EWA anisotropic filtering is a noted deviation), checkerboard (2D),
uv, dots, fbm/wrinkled/marble/windy (Perlin family, core/texture.cpp),
constant/scale/mix are folded at parse time.

Mip layout: one [2*RES, RES] canvas per texture — level 0 in rows
[0, RES); level l>=1 (size RES>>l) at row offset 2*RES - (2*RES >> l).
The level is chosen per lane from the uv-space ray-cone footprint
(Hit.uv_density * distance * spread), the wavefront stand-in for ray
differentials.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import spectrum as spec

TEX_IMAGE = 0
TEX_CHECKER = 1
TEX_UV = 2
TEX_DOTS = 3
TEX_FBM = 4
TEX_MARBLE = 5
TEX_WINDY = 6
TEX_WRINKLED = 7
TEX_PTEX = 8       # per-face atlas (textures/ptex.py bake_atlas)

RES = 256
MAX_LEVEL = 8                  # RES >> 8 == 1x1 top of the pyramid


# ---------------------------------------------------------------------------
# Perlin noise (reference: core/texture.cpp Noise/FBm/Turbulence)
# ---------------------------------------------------------------------------

def _grad(h, x, y, z):
    h = h & 15
    u = jnp.where(h < 8, x, y)
    v = jnp.where(h < 4, y, jnp.where((h == 12) | (h == 14), x, z))
    return jnp.where(h & 1 == 0, u, -u) + jnp.where(h & 2 == 0, v, -v)


def perlin(p):
    """Classic Perlin noise at [...,3] points; ~[-1,1].

    The reference hashes lattice corners through a permutation table
    (texture.cpp NoisePerm); three nested [B] table gathers per corner
    are serial on TPU, so the corner hash here is a table-free integer
    mix (murmur-style finalizer) — a different noise instance with the
    same statistics (our permutation already differed from pbrt's)."""
    pi = jnp.floor(p).astype(jnp.int32) & 255
    pf = p - jnp.floor(p)
    w = pf * pf * pf * (pf * (pf * 6 - 15) + 10)

    pu = pi.astype(jnp.uint32)

    def hash3(dx, dy, dz):
        h = ((pu[..., 0] + jnp.uint32(dx)) * jnp.uint32(0x9E3779B1)
             ^ (pu[..., 1] + jnp.uint32(dy)) * jnp.uint32(0x85EBCA77)
             ^ (pu[..., 2] + jnp.uint32(dz)) * jnp.uint32(0xC2B2AE3D))
        h = h ^ (h >> 15)
        h = h * jnp.uint32(0x27D4EB2F)
        return ((h ^ (h >> 13)) & 255).astype(jnp.int32)

    def g(dx, dy, dz):
        return _grad(hash3(dx, dy, dz), pf[..., 0] - dx, pf[..., 1] - dy,
                     pf[..., 2] - dz)

    def lerp(t, a, b):
        return a + t * (b - a)

    x00 = lerp(w[..., 0], g(0, 0, 0), g(1, 0, 0))
    x10 = lerp(w[..., 0], g(0, 1, 0), g(1, 1, 0))
    x01 = lerp(w[..., 0], g(0, 0, 1), g(1, 0, 1))
    x11 = lerp(w[..., 0], g(0, 1, 1), g(1, 1, 1))
    y0 = lerp(w[..., 1], x00, x10)
    y1 = lerp(w[..., 1], x01, x11)
    return lerp(w[..., 2], y0, y1)


def fbm(p, octaves=6, omega=0.5):
    total = jnp.zeros(p.shape[:-1])
    lam, o = 1.0, 1.0
    for _ in range(octaves):
        total = total + o * perlin(p * lam)
        lam *= 1.99
        o *= omega
    return total


def turbulence(p, octaves=6, omega=0.5):
    total = jnp.zeros(p.shape[:-1])
    lam, o = 1.0, 1.0
    for _ in range(octaves):
        total = total + o * jnp.abs(perlin(p * lam))
        lam *= 1.99
        o *= omega
    return total


# ---------------------------------------------------------------------------
# device-side evaluation
# ---------------------------------------------------------------------------

def _bilinear_level(tex_images, ti, u, v, level):
    """Bilinear fetch at integer mip `level` [B] from the pyramid canvas
    (repeat wrap, imagemap.h default)."""
    sz = jnp.right_shift(RES, level)                     # [B]
    off = jnp.where(level == 0, 0,
                    2 * RES - jnp.right_shift(2 * RES, level))
    fu = (u % 1.0) * (sz - 1)
    fv = (v % 1.0) * (sz - 1)
    iu0 = fu.astype(jnp.int32)
    iv0 = fv.astype(jnp.int32)
    iu1 = jnp.minimum(iu0 + 1, sz - 1)
    iv1 = jnp.minimum(iv0 + 1, sz - 1)
    du = (fu - iu0)[:, None]
    dv = (fv - iv0)[:, None]
    return ((tex_images[ti, off + iv0, iu0] * (1 - du)
             + tex_images[ti, off + iv0, iu1] * du) * (1 - dv)
            + (tex_images[ti, off + iv1, iu0] * (1 - du)
               + tex_images[ti, off + iv1, iu1] * du) * dv)


_ALL_TEX = (TEX_IMAGE, TEX_CHECKER, TEX_UV, TEX_DOTS, TEX_FBM,
            TEX_MARBLE, TEX_WINDY, TEX_WRINKLED, TEX_PTEX)


MAX_ANISO = 8.0          # mipmap.h maxAnisotropy default
EWA_TAPS = 4             # static taps along the major axis


def eval_texture(tex_images, tex_type, tex_params, tex_c1, tex_c2,
                 tex_idx, uv, p_world, uv_width=None, face=None,
                 kinds=None, duv=None):
    """Evaluate texture `tex_idx` [B] at uv [B,2] / world point [B,3].

    tex_images [T,2*RES,RES,3] mip canvases; returns RGB [B,3] (promote
    to spectrum at the call site).  tex_idx<0 lanes return 1 (caller
    keeps constants).  uv_width: optional [B] uv-space footprint
    diameter selecting the mip level (None = finest level, the
    reference's behavior without ray differentials).

    kinds: static tuple of TEX_* families actually bound in the scene
    (SceneData.tex_kinds); families not listed compile to nothing — the
    wavefront otherwise evaluates EVERY family per lane (the Perlin
    group alone is ~15 noise calls)."""
    B = uv.shape[0]
    present = set(_ALL_TEX) if kinds is None else set(kinds)
    from pbrt_tpu.ops import fetch
    ti = jnp.clip(tex_idx, 0, tex_type.shape[0] - 1)
    tt_f, pr, c1, c2 = fetch.fetch_many(
        [tex_type, tex_params, tex_c1, tex_c2], ti)
    tt = jnp.round(tt_f).astype(jnp.int32)
    us, vs = pr[:, 0], pr[:, 1]
    u = uv[:, 0] * us + pr[:, 2]
    v = uv[:, 1] * vs + pr[:, 3]

    # (mask, value) per present family; lanes with tex_idx<0 are
    # overwritten by the final where, so the fold base is arbitrary
    cases = []

    if TEX_IMAGE in present:
        # image: trilinear between the two bracketing mip levels
        # (mipmap.h MIPMap::Lookup; footprint scaled by the uv scale)
        if duv is not None:
            # EWA-style anisotropic filtering (mipmap.h:103 EWA): the
            # mip level comes from the MINOR ellipse axis and EWA_TAPS
            # Gaussian-weighted trilinear taps march the MAJOR axis —
            # the footprint-sampling factorization of the reference's
            # per-texel ellipse loop (whose data-dependent bbox has no
            # static shape); eccentricity clamped to MAX_ANISO as the
            # reference clamps.  duv is in RAW uv; apply uscale/vscale.
            dst0 = duv[:, 0:2] * jnp.stack([us, vs], -1)
            dst1 = duv[:, 2:4] * jnp.stack([us, vs], -1)
            n0 = jnp.sum(dst0 * dst0, -1)
            n1 = jnp.sum(dst1 * dst1, -1)
            swap = n1 > n0
            major_v = jnp.where(swap[:, None], dst1, dst0)
            major = jnp.sqrt(jnp.maximum(jnp.maximum(n0, n1), 1e-24))
            minor = jnp.sqrt(jnp.maximum(jnp.minimum(n0, n1), 1e-24))
            minor = jnp.maximum(minor, major / MAX_ANISO)
            lvl = jnp.clip(float(MAX_LEVEL) + jnp.log2(minor),
                           0.0, float(MAX_LEVEL))
            l0 = lvl.astype(jnp.int32)
            l1 = jnp.minimum(l0 + 1, MAX_LEVEL)
            fl = (lvl - l0)[:, None]
            acc = 0.0
            wsum = 0.0
            for i in range(EWA_TAPS):
                a = (i + 0.5) / EWA_TAPS - 0.5
                w = float(np.exp(-2.0 * (2.0 * a) ** 2))
                ui = u + a * major_v[:, 0]
                vi = v + a * major_v[:, 1]
                tap = (_bilinear_level(tex_images, ti, ui, vi, l0)
                       * (1 - fl)
                       + _bilinear_level(tex_images, ti, ui, vi, l1) * fl)
                acc = acc + w * tap
                wsum = wsum + w
            c_img = acc / wsum
            # lanes with NO differentials (quadric first hits,
            # degenerate-uv triangles, failed plane projections) carry
            # duv==0; EWA would read mip level 0 unfiltered there.
            # Per-lane fall back to the ray-cone/trilinear path instead
            # (ADVICE r4 medium) so those lanes keep the documented
            # cone behavior.
            if uv_width is not None:
                no_duv = jnp.all(duv == 0.0, axis=-1)
                wc = uv_width * jnp.maximum(
                    jnp.maximum(jnp.abs(us), jnp.abs(vs)), 1e-12)
                lvlc = jnp.clip(jnp.log2(jnp.maximum(wc * RES, 1e-9)),
                                0.0, float(MAX_LEVEL))
                lc0 = lvlc.astype(jnp.int32)
                lc1 = jnp.minimum(lc0 + 1, MAX_LEVEL)
                flc = (lvlc - lc0)[:, None]
                c_cone = (_bilinear_level(tex_images, ti, u, v, lc0)
                          * (1 - flc)
                          + _bilinear_level(tex_images, ti, u, v, lc1)
                          * flc)
                c_img = jnp.where(no_duv[:, None], c_cone, c_img)
        elif uv_width is None:
            c_img = _bilinear_level(tex_images, ti, u, v,
                                    jnp.zeros(B, jnp.int32))
        else:
            w = uv_width * jnp.maximum(jnp.maximum(jnp.abs(us),
                                                   jnp.abs(vs)), 1e-12)
            lvl = jnp.clip(jnp.log2(jnp.maximum(w * RES, 1e-9)),
                           0.0, float(MAX_LEVEL))
            l0 = lvl.astype(jnp.int32)
            l1 = jnp.minimum(l0 + 1, MAX_LEVEL)
            fl = (lvl - l0)[:, None]
            c_img = (_bilinear_level(tex_images, ti, u, v, l0) * (1 - fl)
                     + _bilinear_level(tex_images, ti, u, v, l1) * fl)
        cases.append((tt == TEX_IMAGE, c_img))

    if TEX_PTEX in present and face is not None:
        # ptex per-face tiles: params[5]=tiles_per_row, params[6]=tile
        # size; the hit's intra-face uv (barycentric for bare triangle
        # meshes) indexes the face's atlas tile (level-0 canvas rows)
        tpr = jnp.maximum(pr[:, 5].astype(jnp.int32), 1)
        tile = jnp.maximum(pr[:, 6].astype(jnp.int32), 1)
        fidx = jnp.clip(face, 0, tpr * tpr - 1)
        br = (fidx // tpr) * tile
        bc = (fidx % tpr) * tile
        pu = jnp.clip(uv[:, 0], 0.0, 1.0) * (tile - 1)
        pv = jnp.clip(uv[:, 1], 0.0, 1.0) * (tile - 1)
        pu0 = pu.astype(jnp.int32)
        pv0 = pv.astype(jnp.int32)
        pu1 = jnp.minimum(pu0 + 1, tile - 1)
        pv1 = jnp.minimum(pv0 + 1, tile - 1)
        pdu = (pu - pu0)[:, None]
        pdv = (pv - pv0)[:, None]
        c_ptex = ((tex_images[ti, br + pv0, bc + pu0] * (1 - pdu)
                   + tex_images[ti, br + pv0, bc + pu1] * pdu) * (1 - pdv)
                  + (tex_images[ti, br + pv1, bc + pu0] * (1 - pdu)
                     + tex_images[ti, br + pv1, bc + pu1] * pdu) * pdv)
        cases.append((tt == TEX_PTEX, c_ptex))

    if TEX_CHECKER in present:
        # checkerboard (textures/checkerboard.cpp, AA-free closed form)
        check = ((jnp.floor(u) + jnp.floor(v)).astype(jnp.int32) % 2) == 0
        cases.append((tt == TEX_CHECKER, jnp.where(check[:, None], c1, c2)))

    if TEX_UV in present:
        cases.append((tt == TEX_UV,
                      jnp.stack([u % 1.0, v % 1.0, jnp.zeros(B)], -1)))

    if TEX_DOTS in present:
        # polka dots (textures/dots.cpp): hash cell center, radius .35
        cu, cv = jnp.floor(u + 0.5), jnp.floor(v + 0.5)
        h = perlin(jnp.stack([cu + 0.5, cv + 0.5, jnp.zeros(B)], -1))
        has_dot = h > 0
        # pseudo-random center offset via noise
        cx = cu + 0.35 * perlin(jnp.stack([cu, cv, jnp.full(B, 1.5)], -1))
        cy = cv + 0.35 * perlin(jnp.stack([cu, cv, jnp.full(B, 4.5)], -1))
        inside = ((u - cx) ** 2 + (v - cy) ** 2) < 0.35 ** 2
        cases.append((tt == TEX_DOTS,
                      jnp.where((has_dot & inside)[:, None], c1, c2)))

    if present & {TEX_FBM, TEX_MARBLE, TEX_WINDY, TEX_WRINKLED}:
        # noise family over world position
        pw = p_world * pr[:, 4:5] + pr[:, 5:6]
    if TEX_FBM in present:
        n_fbm = fbm(pw)[:, None]
        cases.append((tt == TEX_FBM,
                      jnp.clip(0.5 + 0.5 * n_fbm, 0.0, 1.0)
                      * jnp.ones((B, 3))))
    if TEX_MARBLE in present:
        # marble (texture.cpp MarbleTexture): sin over fbm-perturbed axis
        marb = jnp.sin(pw[:, 1] * 4.0 + 10.0 * fbm(pw, 3))[:, None]
        cases.append((tt == TEX_MARBLE,
                      (0.6 + 0.4 * marb) * jnp.asarray([[0.9, 0.85, 0.8]])))
    if TEX_WINDY in present:
        c_windy = (jnp.abs(fbm(pw * 0.1, 3))
                   * turbulence(pw, 6))[:, None] * jnp.ones((B, 3))
        cases.append((tt == TEX_WINDY, c_windy))
    if TEX_WRINKLED in present:
        n_wri = turbulence(pw)[:, None]
        cases.append((tt == TEX_WRINKLED,
                      jnp.clip(n_wri, 0.0, 1.0) * jnp.ones((B, 3))))

    if not cases:
        return jnp.ones((B, 3))
    out = cases[0][1]
    for mask, val in cases[1:]:
        out = jnp.where(mask[:, None], val, out)
    return jnp.where((tex_idx >= 0)[:, None], out, 1.0)


def _resize_bilinear(img, h, w):
    """HDR-preserving float bilinear resample (the uint8 round-trip PIL
    route clips light maps; reference: mipmap.cpp resampled weights)."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    ih, iw = img.shape[:2]
    if (ih, iw) == (h, w):
        return img
    ys = (np.arange(h, dtype=np.float32) + 0.5) * ih / h - 0.5
    xs = (np.arange(w, dtype=np.float32) + 0.5) * iw / w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int32), 0, ih - 1)
    x0 = np.clip(np.floor(xs).astype(np.int32), 0, iw - 1)
    y1, x1 = np.minimum(y0 + 1, ih - 1), np.minimum(x0 + 1, iw - 1)
    fy = np.clip(ys - y0, 0, 1)[:, None, None]
    fx = np.clip(xs - x0, 0, 1)[None, :, None]
    top = img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx
    bot = img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx
    return top * (1 - fy) + bot * fy


def build_pyramid(img):
    """[RES,RES,3] -> [2*RES,RES,3] mip canvas (2x2 box downsample per
    level, reference mipmap.h:77 pow-2 pyramid)."""
    canvas = np.zeros((2 * RES, RES, 3), np.float32)
    canvas[:RES, :RES] = img
    prev = np.asarray(img, np.float32)
    for lvl in range(1, MAX_LEVEL + 1):
        prev = 0.25 * (prev[0::2, 0::2] + prev[1::2, 0::2]
                       + prev[0::2, 1::2] + prev[1::2, 1::2])
        off = 2 * RES - (2 * RES >> lvl)
        sz = RES >> lvl
        canvas[off:off + sz, :sz] = prev
    return canvas


class TextureTable:
    """Host-side texture registry built during parsing."""

    def __init__(self):
        self.images = [build_pyramid(np.ones((RES, RES, 3), np.float32))]
        self.types = [TEX_IMAGE]
        self.params = [np.zeros(8, np.float32)]
        self.c1 = [np.ones(3, np.float32)]
        self.c2 = [np.zeros(3, np.float32)]

    def add(self, ttype, image=None, uscale=1.0, vscale=1.0, udelta=0.0,
            vdelta=0.0, wscale=1.0, c1=(1, 1, 1), c2=(0, 0, 0),
            p5=0.0, p6=0.0):
        if image is not None:
            if isinstance(image, str):
                from pbrt_tpu.film.io import read_image
                img = read_image(image)          # EXR/PFM linear, LDR->2.2
            else:
                img = np.asarray(image, np.float32)
            self.images.append(build_pyramid(_resize_bilinear(img, RES,
                                                              RES)))
        else:
            self.images.append(
                build_pyramid(np.ones((RES, RES, 3), np.float32)))
        self.types.append(ttype)
        self.params.append(np.asarray(
            [uscale, vscale, udelta, vdelta, wscale, p5, p6, 0],
            np.float32))
        self.c1.append(np.asarray(c1, np.float32))
        self.c2.append(np.asarray(c2, np.float32))
        return len(self.types) - 1

    def arrays(self):
        return (np.stack(self.images), np.asarray(self.types, np.int32),
                np.stack(self.params), np.stack(self.c1), np.stack(self.c2))
