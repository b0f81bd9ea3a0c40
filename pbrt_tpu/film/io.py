"""Image output: minimal EXR codec, PNG/PFM, and the fork's ISET .dat.

Reference layer: src/core/imageio.{h,cpp} (EXR/TGA/PNG/PFM dispatch) + the
fork's spectral `.dat` writer (film.cpp:262-305).  The EXR here is a
self-contained uncompressed float32 scanline writer/reader (the environment
has no OpenEXR binding); any EXR-aware tool can open its output.
"""

from __future__ import annotations

import os
import struct

import numpy as np


# ---------------------------------------------------------------------------
# ISET spectral .dat (fork format, film.cpp:262-305)
# ---------------------------------------------------------------------------

def write_dat(path, spectral, scale=1.0):
    """spectral: [H,W,31] raw per-pixel spectral sums.

    Format: text "W H 31\\n" + "v3 \\n", then float64 binary, band-
    sequential (all pixels of band 0 row-major, then band 1, ...).
    """
    h, w, ns = spectral.shape
    base, _ = os.path.splitext(path)
    out = base + ".dat"
    with open(out, "w") as f:
        f.write(f"{w} {h} {ns}\n")
        f.write("v3 \n")
    data = np.asarray(spectral, np.float64) * scale
    with open(out, "ab") as f:
        # [H,W,31] -> band-major [31, H*W]
        f.write(np.ascontiguousarray(
            data.reshape(-1, ns).T).tobytes())
    return out


def read_dat(path):
    """Inverse of write_dat -> [H,W,ns] float64."""
    with open(path, "rb") as f:
        header = f.readline().split()
        w, h, ns = (int(x) for x in header[:3])
        flag = f.readline().strip()
        data = np.frombuffer(f.read(), dtype=np.float64,
                             count=w * h * ns)
    img = data.reshape(ns, h * w).T.reshape(h, w, ns)
    return img, flag.decode()


# ---------------------------------------------------------------------------
# EXR (uncompressed float scanlines)
# ---------------------------------------------------------------------------

def _attr(name, atype, payload):
    return (name.encode() + b"\x00" + atype.encode() + b"\x00"
            + struct.pack("<i", len(payload)) + payload)


def write_exr(path, rgb):
    """rgb: [H,W,3] float32 -> scanline EXR, compression=NONE."""
    rgb = np.asarray(rgb, np.float32)
    h, w = rgb.shape[:2]
    channels = b""
    for name in (b"B", b"G", b"R"):
        channels += name + b"\x00" + struct.pack("<iiii", 2, 0, 1, 1)
    channels += b"\x00"
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = b""
    header += _attr("channels", "chlist", channels)
    header += _attr("compression", "compression", b"\x00")
    header += _attr("dataWindow", "box2i", box)
    header += _attr("displayWindow", "box2i", box)
    header += _attr("lineOrder", "lineOrder", b"\x00")
    header += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0))
    header += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"
    magic = struct.pack("<i", 20000630) + struct.pack("<i", 2)
    offset0 = len(magic) + len(header) + 8 * h
    line_size = 8 + 3 * 4 * w
    offsets = struct.pack("<" + "Q" * h,
                          *[offset0 + i * line_size for i in range(h)])
    with open(path, "wb") as f:
        f.write(magic + header + offsets)
        for y in range(h):
            f.write(struct.pack("<ii", y, 3 * 4 * w))
            # channels alphabetical: B, G, R — each a full row
            f.write(np.ascontiguousarray(rgb[y, :, 2]).tobytes())
            f.write(np.ascontiguousarray(rgb[y, :, 1]).tobytes())
            f.write(np.ascontiguousarray(rgb[y, :, 0]).tobytes())
    return path


_EXR_TYPE_BYTES = {0: 4, 1: 2, 2: 4}       # UINT, HALF, FLOAT


def _exr_unpredict(raw):
    """Undo the EXR ZIP post-deflate transform: delta-reconstruct then
    de-interleave the two byte planes (OpenEXR ImfZip.cpp)."""
    t = np.frombuffer(raw, np.uint8).astype(np.int16)
    # t[i] = t[i-1] + t[i] - 128  (cumulative)
    d = t.copy()
    d[1:] -= 128
    d = np.cumsum(d).astype(np.uint8)
    # interleave: out[0::2] = first half, out[1::2] = second half
    half = (len(d) + 1) // 2
    out = np.empty(len(d), np.uint8)
    out[0::2] = d[:half]
    out[1::2] = d[half:]
    return out.tobytes()


def read_exr(path):
    """Scanline EXR reader: NONE / ZIPS / ZIP decoded in pure numpy,
    HALF / FLOAT / UINT channels; every other compression (PIZ, PXR24,
    B44, DWA...) decodes through the system OpenEXR via the native shim
    (native/exr_reader.cc) — the same library the reference uses for ALL
    its EXR io (imageio.cpp:124+)."""
    import zlib
    with open(path, "rb") as f:
        data = f.read()
    if struct.unpack_from("<i", data, 0)[0] != 20000630:
        raise ValueError("not an EXR")
    pos = 8
    attrs = {}
    while data[pos] != 0:
        e = data.index(b"\x00", pos)
        name = data[pos:e].decode(); pos = e + 1
        e = data.index(b"\x00", pos)
        atype = data[pos:e].decode(); pos = e + 1
        size = struct.unpack_from("<i", data, pos)[0]; pos += 4
        attrs[name] = (atype, data[pos:pos + size]); pos += size
    pos += 1
    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"][1])
    w, h = x1 - x0 + 1, y1 - y0 + 1
    comp = attrs["compression"][1][0]
    if comp not in (0, 2, 3):
        from pbrt_tpu.native.build import read_exr_native
        rgba = read_exr_native(path)
        if rgba is not None:
            return rgba[..., :3].astype(np.float32)
        raise ValueError(f"EXR compression {comp} not supported "
                         "(NONE/ZIPS/ZIP only)")
    lines_per_block = {0: 1, 2: 1, 3: 16}[comp]
    # channel list (file order = sorted names; data is stored per
    # scanline in this order)
    ch = []
    cdata = attrs["channels"][1]
    cpos = 0
    while cdata[cpos] != 0:
        e = cdata.index(b"\x00", cpos)
        cname = cdata[cpos:e].decode()
        ptype = struct.unpack_from("<i", cdata, e + 1)[0]
        ch.append((cname, ptype))
        cpos = e + 1 + 16
    ch_names = [c[0] for c in ch]
    line_bytes = sum(_EXR_TYPE_BYTES[t] for _, t in ch) * w

    n_blocks = (h + lines_per_block - 1) // lines_per_block
    pos += 8 * n_blocks            # offset table
    img = np.zeros((h, w, len(ch)), np.float32)
    for _ in range(n_blocks):
        yy, sz = struct.unpack_from("<ii", data, pos); pos += 8
        nl = min(lines_per_block, y1 - yy + 1)
        payload = data[pos:pos + sz]; pos += sz
        expect = line_bytes * nl
        if comp in (2, 3) and sz < expect:
            payload = _exr_unpredict(zlib.decompress(payload))
        lpos = 0
        for li in range(nl):
            y = yy - y0 + li
            for ci, (cname, ptype) in enumerate(ch):
                nb = _EXR_TYPE_BYTES[ptype]
                buf = payload[lpos:lpos + nb * w]; lpos += nb * w
                if ptype == 2:
                    row = np.frombuffer(buf, np.float32, w)
                elif ptype == 1:
                    row = np.frombuffer(buf, np.float16, w).astype(np.float32)
                else:
                    row = np.frombuffer(buf, np.uint32, w).astype(np.float32)
                if 0 <= y < h:
                    img[y, :, ci] = row
    # reorder to RGB if possible
    if set("RGB") <= set(ch_names):
        idx = [ch_names.index(c) for c in "RGB"]
        return img[:, :, idx]
    if "Y" in ch_names:            # luminance-only maps
        yimg = img[:, :, ch_names.index("Y")]
        return np.repeat(yimg[:, :, None], 3, axis=2)
    return img


# ---------------------------------------------------------------------------
# PFM / PNG / TGA (reference imageio.cpp:84-120)
# ---------------------------------------------------------------------------

def write_pfm(path, rgb):
    rgb = np.asarray(rgb, np.float32)
    h, w = rgb.shape[:2]
    with open(path, "wb") as f:
        f.write(b"PF\n" + f"{w} {h}\n".encode() + b"-1.000000\n")
        f.write(np.ascontiguousarray(rgb[::-1]).tobytes())
    return path


def read_pfm(path):
    with open(path, "rb") as f:
        assert f.readline().strip() in (b"PF", b"Pf")
        w, h = (int(x) for x in f.readline().split())
        scale = float(f.readline())
        data = np.frombuffer(f.read(), "<f4" if scale < 0 else ">f4")
    return data.reshape(h, w, -1)[::-1]


def _srgb_encode(x):
    x = np.clip(x, 0.0, 1.0)
    return np.where(x <= 0.0031308, 12.92 * x,
                    1.055 * x ** (1 / 2.4) - 0.055)


def write_png(path, rgb, gamma=True):
    from PIL import Image
    img = _srgb_encode(np.asarray(rgb)) if gamma else np.clip(rgb, 0, 1)
    Image.fromarray((img * 255 + 0.5).astype(np.uint8)).save(path)
    return path


def write_image(path, rgb):
    """Extension dispatch (reference: imageio.cpp WriteImage)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".exr":
        return write_exr(path, rgb)
    if ext == ".pfm":
        return write_pfm(path, rgb)
    if ext in (".png", ".tga", ".jpg", ".bmp"):
        return write_png(path, rgb)
    raise ValueError(f"unsupported image extension {ext}")


def read_image(path):
    ext = os.path.splitext(path)[1].lower()
    if ext == ".exr":
        return read_exr(path)
    if ext == ".pfm":
        return read_pfm(path)
    from PIL import Image
    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return img ** 2.2
