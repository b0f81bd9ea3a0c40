"""Typed parameter lists (reference: src/core/paramset.{h,cpp}).

Parses pbrt's `"type name" [values]` declarations into a dict-backed
ParamSet with the reference's Find/FindOne lookup semantics, spectrum
promotion from rgb/xyz/blackbody/sampled pairs/.spd files
(paramset.cpp:110-187), and unused-parameter warnings (ReportUnused).
"""

from __future__ import annotations

import os
import numpy as np

from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.parser.tokenizer import unquote, is_quoted

PARAM_TYPES = {"integer", "float", "bool", "string", "point", "point2",
               "point3", "vector", "vector2", "vector3", "normal", "normal3",
               "rgb", "color", "xyz", "spectrum", "blackbody", "texture"}


class ParamSet:
    def __init__(self, scene_dir="."):
        self.items = {}       # name -> (type, values list)
        self.used = set()
        self.scene_dir = scene_dir

    def add(self, ptype, name, values):
        self.items[name] = (ptype, values)

    # -- lookups (reference FindOne*) --------------------------------------
    def _get(self, name):
        if name in self.items:
            self.used.add(name)
            return self.items[name]
        return None

    def find_one_float(self, name, default):
        it = self._get(name)
        return float(it[1][0]) if it else default

    def find_one_int(self, name, default):
        it = self._get(name)
        return int(it[1][0]) if it else default

    def find_one_bool(self, name, default):
        it = self._get(name)
        if not it:
            return default
        v = it[1][0]
        return v in (True, "true", "\"true\"", 1)

    def find_one_string(self, name, default):
        it = self._get(name)
        return str(it[1][0]) if it else default

    def find_one_filename(self, name, default=""):
        s = self.find_one_string(name, "")
        if not s:
            return default
        return os.path.join(self.scene_dir, s) if not os.path.isabs(s) else s

    def find_one_point(self, name, default):
        it = self._get(name)
        if not it:
            return np.asarray(default, np.float64)
        return np.asarray(it[1][:3], np.float64)

    find_one_vector = find_one_point
    find_one_normal = find_one_point

    def find_floats(self, name):
        it = self._get(name)
        return np.asarray(it[1], np.float64) if it else None

    def find_ints(self, name):
        it = self._get(name)
        return np.asarray(it[1], np.int64) if it else None

    def find_points(self, name):
        it = self._get(name)
        if not it:
            return None
        return np.asarray(it[1], np.float64).reshape(-1, 3)

    def find_point2s(self, name):
        it = self._get(name)
        if not it:
            return None
        return np.asarray(it[1], np.float64).reshape(-1, 2)

    def find_texture(self, name):
        it = self._get(name)
        if it and it[0] == "texture":
            return str(it[1][0])
        return None

    def find_one_spectrum(self, name, default, kind="illuminant"):
        """Returns a [31] numpy spectrum.  default: scalar or [31] array.

        Handles rgb/color, xyz, blackbody [T scale]..., spectrum inline
        [l v l v ...] and "file.spd" (reference paramset.cpp:110-187).

        kind defaults to "illuminant" because the reference's parser
        converts EVERY rgb/color parameter — including reflectances —
        with SpectrumType::Illuminant (AddRGBSpectrum at
        paramset.cpp:110-120 calls Spectrum::FromRGB with its default
        argument, spectrum.h:428-429); matching that quirk is required
        for band-level radiance parity with PBRT_SAMPLED_SPECTRUM
        builds.
        """
        it = self._get(name)
        if not it:
            if np.isscalar(default):
                return np.full(spec.N_SPECTRAL_SAMPLES, default, np.float32)
            return np.asarray(default, np.float32)
        ptype, vals = it
        if ptype in ("rgb", "color"):
            return spec.from_rgb_np(np.asarray(vals[:3], np.float64), kind)
        if ptype == "xyz":
            rgb = np.asarray(vals[:3], np.float64) @ spec.XYZ_TO_RGB.T
            return spec.from_rgb_np(rgb, kind)
        if ptype == "blackbody":
            out = np.zeros(spec.N_SPECTRAL_SAMPLES)
            for i in range(0, len(vals), 2):
                T = float(vals[i])
                scale = float(vals[i + 1]) if i + 1 < len(vals) else 1.0
                out = out + spec.blackbody_spectrum(T, scale)
            return out.astype(np.float32)
        if ptype == "spectrum":
            if isinstance(vals[0], str):
                lam, v = read_spd(os.path.join(self.scene_dir, vals[0])
                                  if not os.path.isabs(vals[0]) else vals[0])
                return spec.from_sampled(lam, v).astype(np.float32)
            arr = np.asarray(vals, np.float64)
            return spec.from_sampled(arr[0::2], arr[1::2]).astype(np.float32)
        if ptype == "float":
            return np.full(spec.N_SPECTRAL_SAMPLES, float(vals[0]), np.float32)
        raise ValueError(f"param {name}: type {ptype} is not a spectrum")

    def report_unused(self, where, warn):
        for name in self.items:
            if name not in self.used:
                warn(f"parameter \"{name}\" unused in {where}")


def read_spd(path):
    """Read whitespace-separated (lambda, value) pairs — the reference's
    ReadFloatFile + .spd convention (floatfile.cpp)."""
    nums = []
    with open(path) as f:
        for line in f:
            line = line.split("#")[0]
            nums.extend(float(x) for x in line.split())
    arr = np.asarray(nums)
    return arr[0::2], arr[1::2]


def parse_param_list(stream, scene_dir="."):
    """Consume `"type name" [values...]` declarations until a non-quoted
    token (the next directive) and return a ParamSet."""
    ps = ParamSet(scene_dir)
    while True:
        tok = stream.peek()
        if tok is None or not is_quoted(tok):
            return ps
        decl = unquote(stream.next()).split()
        if len(decl) == 1:
            # a bare quoted string that is NOT a param decl (e.g. the name
            # argument of the next directive) — push back and stop
            stream.push('"' + decl[0] + '"')
            return ps
        ptype, name = decl[0], decl[1]
        if ptype not in PARAM_TYPES:
            stream.push('"' + " ".join(decl) + '"')
            return ps
        values = []
        tok = stream.next()
        if tok == "[":
            while True:
                tok = stream.next()
                if tok is None:
                    raise ValueError("unterminated [ in param list")
                if tok == "]":
                    break
                values.append(_convert(tok))
        else:
            values.append(_convert(tok))
        ps.add(ptype, name, values)


def _convert(tok):
    if is_quoted(tok):
        s = unquote(tok)
        return s
    if tok == "true":
        return True
    if tok == "false":
        return False
    try:
        return int(tok)
    except ValueError:
        return float(tok)
