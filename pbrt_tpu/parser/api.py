"""pbrt scene-API state machine (reference: src/core/api.{h,cpp}).

Implements the directive semantics of the reference's 40 pbrt* calls —
CTM stacks, graphics-state attribute stacks, named materials/textures,
object instancing, world block — driving a SceneBuilder and collecting
render options, then compiling everything into a RenderJob at WorldEnd
(the analog of RenderOptions::MakeScene/MakeIntegrator/MakeCamera,
api.cpp:1739-1819).

Deviations from the reference are breadth-of-implementation only (each
factory lists what it supports); the grammar and state semantics match.
"""

from __future__ import annotations

import copy
import os
import logging
from dataclasses import dataclass, field

import numpy as np

from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.core import transform as tfm
from pbrt_tpu.parser.tokenizer import (TokenStream, tokenize_file, unquote,
                                       is_quoted)
from pbrt_tpu.parser.paramset import ParamSet, parse_param_list
from pbrt_tpu.scene import ir
from pbrt_tpu.scene.ir import MaterialSpec, SceneBuilder
from pbrt_tpu.materials.metal_data import conductor_eta_k

log = logging.getLogger("pbrt_tpu")


@dataclass
class GraphicsState:
    """reference: api.cpp:212+ GraphicsState."""
    material_id: int = 0
    material_name: str = "matte"
    area_light: dict | None = None
    reverse_orientation: bool = False
    float_textures: dict = field(default_factory=dict)
    spectrum_textures: dict = field(default_factory=dict)
    named_materials: dict = field(default_factory=dict)
    inside_medium: str = ""
    outside_medium: str = ""

    def clone(self):
        g = copy.copy(self)
        g.float_textures = dict(self.float_textures)
        g.spectrum_textures = dict(self.spectrum_textures)
        g.named_materials = dict(self.named_materials)
        return g


@dataclass
class RenderJob:
    """Everything WorldEnd produced; consumed by the render CLI / tests."""
    scene: object
    builder: SceneBuilder
    camera_kind: str
    camera_params: dict
    cam_to_world: tfm.Transform
    film_width: int
    film_height: int
    film_filename: str
    film_diagonal: float
    film_scale: float
    spectral_flag: bool
    crop_window: tuple
    filter_name: str
    filter_params: dict
    sampler_kind: str
    spp: int
    integrator_kind: str
    integrator_params: dict
    instance_names: dict
    material_names: dict
    media: dict
    max_sample_luminance: float = 1e30
    # names of media bound to primitives via MediumInterface — these
    # are handled per-lane in volpath, not as the global medium
    prim_media_names: tuple = ()
    # second camera keyframe (two-sample CTM camera motion blur); None
    # for static cameras
    cam_to_world1: object = None


class PbrtAPI:
    """State machine; feed directives via parse()."""

    def __init__(self, scene_dir="."):
        self.scene_dir = scene_dir
        self.ctm = [tfm.Transform(), tfm.Transform()]  # two time samples
        self.active_bits = 3
        self.transform_stack = []
        self.named_coord_systems = {}
        self.graphics = GraphicsState()
        self.graphics_stack = []
        self.builder = SceneBuilder()
        self.in_world = False
        # options (reference RenderOptions)
        self.camera_kind = "perspective"
        self.camera_params = ParamSet()
        self.camera_to_world = tfm.Transform()
        self.camera_to_world1 = None
        self.film_params = ParamSet()
        self.filter_name = "box"
        self.filter_params = ParamSet()
        self.sampler_kind = "halton"
        self.sampler_params = ParamSet()
        self.integrator_kind = "path"
        self.integrator_params = ParamSet()
        self.accel_kind = "bvh"
        self.transform_times = (0.0, 1.0)
        self.media = {}
        self._medium_ids = {}          # name -> per-prim media-table idx
        self._camera_medium_name = ""
        # instancing
        self.objects = {}
        self.current_object = None
        self.next_instance_id = 1
        self.instance_names = {}
        self._material_cache = {}
        # seed a default matte material id 0
        self._default_mat = self.builder.add_material(
            MaterialSpec(type=ir.MAT_MATTE,
                         kd=np.full(31, 0.5, np.float32), name="matte"))
        self.graphics.material_id = self._default_mat

    # ------------------------------------------------------------------ ctm
    def _apply(self, t: tfm.Transform):
        for i in range(2):
            if self.active_bits & (1 << i):
                self.ctm[i] = self.ctm[i] * t

    # ------------------------------------------------------------- parsing
    def parse_file(self, path):
        self.scene_dir = os.path.dirname(os.path.abspath(path))
        stream = TokenStream(tokenize_file(path), path)
        return self._parse(stream)

    def parse_string(self, text, scene_dir="."):
        from pbrt_tpu.parser.tokenizer import tokenize
        self.scene_dir = scene_dir
        return self._parse(TokenStream(tokenize(text)))

    def _params(self, stream):
        return parse_param_list(stream, self.scene_dir)

    def _parse(self, stream):
        job = None
        while True:
            tok = stream.next()
            if tok is None:
                break
            handler = getattr(self, "_d_" + tok, None)
            if handler is None:
                log.warning("unknown directive %r — skipped", tok)
                continue
            result = handler(stream)
            if result is not None:
                job = result
        return job

    # -------------------------------------------------------- transforms
    def _d_Identity(self, s):
        for i in range(2):
            if self.active_bits & (1 << i):
                self.ctm[i] = tfm.Transform()

    def _d_Translate(self, s):
        x, y, z = (float(s.next()) for _ in range(3))
        self._apply(tfm.translate(x, y, z))

    def _d_Scale(self, s):
        x, y, z = (float(s.next()) for _ in range(3))
        self._apply(tfm.scale(x, y, z))

    def _d_Rotate(self, s):
        a, x, y, z = (float(s.next()) for _ in range(4))
        self._apply(tfm.rotate(a, x, y, z))

    def _d_LookAt(self, s):
        v = [float(s.next()) for _ in range(9)]
        # LookAt gives world-to-camera = inverse(cam_to_world)
        c2w = tfm.look_at(v[0:3], v[3:6], v[6:9])
        self._apply(c2w.inverse())

    def _read_matrix(self, s):
        vals = []
        tok = s.next()
        assert tok == "[", "Transform expects [ 16 floats ]"
        while True:
            tok = s.next()
            if tok == "]":
                break
            vals.append(float(tok))
        # pbrt matrices are column-major in the file
        return tfm.Transform(np.asarray(vals).reshape(4, 4).T)

    def _d_Transform(self, s):
        t = self._read_matrix(s)
        for i in range(2):
            if self.active_bits & (1 << i):
                self.ctm[i] = t

    def _d_ConcatTransform(self, s):
        self._apply(self._read_matrix(s))

    def _d_CoordinateSystem(self, s):
        name = unquote(s.next())
        self.named_coord_systems[name] = [tfm.Transform(self.ctm[0].m),
                                          tfm.Transform(self.ctm[1].m)]

    def _d_CoordSysTransform(self, s):
        name = unquote(s.next())
        if name in self.named_coord_systems:
            self.ctm = [tfm.Transform(t.m)
                        for t in self.named_coord_systems[name]]
        else:
            log.warning("unknown coordinate system %r", name)

    def _d_ActiveTransform(self, s):
        which = s.next()
        self.active_bits = {"StartTime": 1, "EndTime": 2, "All": 3}.get(
            which, 3)

    def _d_TransformTimes(self, s):
        self.transform_times = (float(s.next()), float(s.next()))

    def _d_TransformBegin(self, s):
        self.transform_stack.append(
            ([tfm.Transform(self.ctm[0].m), tfm.Transform(self.ctm[1].m)],
             self.active_bits))

    def _d_TransformEnd(self, s):
        self.ctm, self.active_bits = self.transform_stack.pop()

    # ------------------------------------------------------------ options
    def _d_Camera(self, s):
        self.camera_kind = unquote(s.next())
        self.camera_params = self._params(s)
        # camera-to-world = inverse(CTM)
        self.camera_to_world = self.ctm[0].inverse()
        import numpy as _np
        self.camera_to_world1 = (self.ctm[1].inverse()
                                 if not _np.allclose(self.ctm[1].m,
                                                     self.ctm[0].m)
                                 else None)
        self.named_coord_systems["camera"] = [self.ctm[0], self.ctm[1]]
        # camera exists in the currently-active medium (api.cpp
        # RenderOptions::CameraMedium); resolved at WorldEnd since
        # MakeNamedMedium may not have been seen yet
        self._camera_medium_name = self.graphics.inside_medium

    def _d_Film(self, s):
        unquote(s.next())  # "image"
        self.film_params = self._params(s)

    def _d_PixelFilter(self, s):
        self.filter_name = unquote(s.next())
        self.filter_params = self._params(s)

    def _d_Sampler(self, s):
        self.sampler_kind = unquote(s.next())
        self.sampler_params = self._params(s)

    def _d_Integrator(self, s):
        self.integrator_kind = unquote(s.next())
        self.integrator_params = self._params(s)

    def _d_Accelerator(self, s):
        # reference dispatch api.cpp:788-801 (bvh | kdtree).  The kd-tree
        # here maps to spatial-median splits in the same octant-threaded
        # flattened layout (a kd-style BVH: no primitive duplication)
        self.accel_kind = unquote(s.next())
        ps = self._params(s)
        ps.report_unused("accelerator", log.warning)

    def _d_Include(self, s):
        name = unquote(s.next())
        path = name if os.path.isabs(name) else os.path.join(
            self.scene_dir, name)
        s.include(tokenize_file(path))

    # -------------------------------------------------------- world block
    def _d_WorldBegin(self, s):
        self.in_world = True
        self.ctm = [tfm.Transform(), tfm.Transform()]
        self.active_bits = 3
        self.named_coord_systems["world"] = [tfm.Transform(), tfm.Transform()]

    def _d_AttributeBegin(self, s):
        self.graphics_stack.append(self.graphics.clone())
        self._d_TransformBegin(s)

    def _d_AttributeEnd(self, s):
        self.graphics = self.graphics_stack.pop()
        self._d_TransformEnd(s)

    def _d_ReverseOrientation(self, s):
        self.graphics.reverse_orientation = \
            not self.graphics.reverse_orientation

    def _d_ObjectBegin(self, s):
        self._d_AttributeBegin(s)
        self.current_object = unquote(s.next())
        self.objects[self.current_object] = []

    def _d_ObjectEnd(self, s):
        self.current_object = None
        self._d_AttributeEnd(s)

    def _d_ObjectInstance(self, s):
        name = unquote(s.next())
        shapes = self.objects.get(name)
        if shapes is None:
            log.warning("unknown object instance %r", name)
            return
        inst_id = self.next_instance_id
        self.next_instance_id += 1
        self.instance_names[inst_id] = name
        xf = self.ctm[0]
        for entry in shapes:
            kind = entry[0]
            if kind == "mesh":
                _, verts, idx, norms, uvs, mat, light = entry
                self.builder.add_triangle_mesh(
                    verts, idx, mat, normals=norms, uvs=uvs,
                    light_id=light, instance_id=inst_id,
                    object_to_world=xf)
            else:
                _, qtype, o2w, params, mat, light, flip = entry
                self.builder.add_quadric(qtype, xf * o2w, params, mat,
                                         light_id=light, instance_id=inst_id,
                                         flip_normal=flip)

    # ------------------------------------------------------------- media
    def _d_MakeNamedMedium(self, s):
        name = unquote(s.next())
        ps = self._params(s)
        # grid media need the CTM at creation (api.cpp MakeMedium passes
        # curTransform as medium2world)
        import pbrt_tpu.core.transform as _tfm
        self.media[name] = {"name": name, "params": ps,
                            "type": ps.find_one_string("type",
                                                       "homogeneous"),
                            "m2w": _tfm.Transform(self.ctm[0].m)}

    def _medium_index(self, name):
        """Resolve a named medium to a per-primitive media-table index
        (homogeneous AND grid: GridDensityMedium binds through
        MediumInterface like the reference, api.cpp pbrtMediumInterface
        + grid.cpp)."""
        if not name:
            return -1
        if name in self._medium_ids:
            return self._medium_ids[name]
        m = self.media.get(name)
        idx = -1
        if m is None:
            log.warning("MediumInterface names unknown medium %r", name)
        else:
            ps = m["params"]
            default_a, default_s = 1.0, 1.0
            preset = ps.find_one_string("preset", "")
            if preset:
                from pbrt_tpu.media.presets import (
                    get_medium_scattering_properties)
                got = get_medium_scattering_properties(preset)
                if got is not None:
                    default_a, default_s = got
            scale = ps.find_one_float("scale", 1.0)
            sig_a = ps.find_one_spectrum("sigma_a", default_a) * scale
            sig_s = ps.find_one_spectrum("sigma_s", default_s) * scale
            g = ps.find_one_float("g", 0.0)
            if m["type"] in ("heterogeneous", "grid"):
                import numpy as _np
                nx = ps.find_one_int("nx", 1)
                ny = ps.find_one_int("ny", 1)
                nz = ps.find_one_int("nz", 1)
                dvals = ps.find_floats("density")
                dens = (_np.asarray(dvals, _np.float32)
                        .reshape(nz, ny, nx)
                        if dvals is not None
                        else _np.ones((1, 1, 1), _np.float32))
                p0 = _np.asarray(ps.find_one_point("p0", [0, 0, 0]))
                p1 = _np.asarray(ps.find_one_point("p1", [1, 1, 1]))
                # medium2world = CTM-at-creation * translate(p0)
                #                * scale(p1-p0)  (medium.cpp data2Medium)
                d2m = _np.eye(4)
                d2m[:3, 3] = p0
                for i in range(3):
                    d2m[i, i] = p1[i] - p0[i]
                m2w = _np.asarray(m["m2w"].m, _np.float64) @ d2m
                w2m = _np.linalg.inv(m2w).astype(_np.float32)
                idx = self.builder.add_medium_record(
                    sig_a, sig_s, g, density=dens, world_to_medium=w2m)
            else:
                idx = self.builder.add_medium_record(sig_a, sig_s, g)
        self._medium_ids[name] = idx
        return idx

    def _d_MediumInterface(self, s):
        self.graphics.inside_medium = unquote(s.next())
        tok = s.peek()
        if is_quoted(tok):
            self.graphics.outside_medium = unquote(s.next())

    # ----------------------------------------------------------- textures
    def _d_Texture(self, s):
        name = unquote(s.next())
        ttype = unquote(s.next())       # "float" | "color"/"spectrum"
        tclass = unquote(s.next())      # constant/scale/imagemap/...
        ps = self._params(s)
        value = self._make_texture(ttype, tclass, ps)
        if ttype == "float":
            self.graphics.float_textures[name] = value
        else:
            self.graphics.spectrum_textures[name] = value

    def _make_texture(self, ttype, tclass, ps):
        """Texture factory (reference: src/textures/* dispatch
        api.cpp:627-697).  Returns ("const", value) or ("tex", id) where
        id indexes the device texture table."""
        from pbrt_tpu.textures import textures as texmod
        kind = "reflectance"
        reg = self.builder.textures

        def rgb_of(spectrum31):
            return spec.to_rgb_np(np.asarray(spectrum31, np.float32))

        uscale = ps.find_one_float("uscale", 1.0)
        vscale = ps.find_one_float("vscale", 1.0)
        udelta = ps.find_one_float("udelta", 0.0)
        vdelta = ps.find_one_float("vdelta", 0.0)
        wscale = ps.find_one_float("scale", 1.0)
        if tclass == "constant":
            if ttype == "float":
                return ("const", ps.find_one_float("value", 1.0))
            return ("const", ps.find_one_spectrum("value", 1.0, kind))
        if tclass == "scale":
            t1 = self._resolve_tex_value(ps, "tex1", 1.0, ttype)
            t2 = self._resolve_tex_value(ps, "tex2", 1.0, ttype)
            return ("const", t1 * t2)
        if tclass == "mix":
            t1 = self._resolve_tex_value(ps, "tex1", 0.0, ttype)
            t2 = self._resolve_tex_value(ps, "tex2", 1.0, ttype)
            amt = ps.find_one_float("amount", 0.5)
            return ("const", (1 - amt) * t1 + amt * t2)
        if tclass == "bilerp":
            vals = [self._resolve_tex_value(ps, f"v{i:02d}", 0.0, ttype)
                    for i in ("00", "01", "10", "11")]
            return ("const", sum(vals) / 4)
        if tclass == "imagemap":
            fname = ps.find_one_filename("filename", "")
            try:
                tid = reg.add(texmod.TEX_IMAGE, image=fname, uscale=uscale,
                              vscale=vscale, udelta=udelta, vdelta=vdelta)
                return ("tex", tid)
            except Exception as e:
                log.warning("imagemap %r load failed (%s); using 0.5",
                            fname, e)
                return ("const", 0.5 if ttype == "float"
                        else np.full(31, 0.5, np.float32))
        if tclass == "checkerboard":
            c1 = self._resolve_tex_value(ps, "tex1", 1.0, "color")
            c2 = self._resolve_tex_value(ps, "tex2", 0.0, "color")
            tid = reg.add(texmod.TEX_CHECKER, uscale=uscale, vscale=vscale,
                          udelta=udelta, vdelta=vdelta,
                          c1=rgb_of(c1), c2=rgb_of(c2))
            return ("tex", tid)
        if tclass == "uv":
            return ("tex", reg.add(texmod.TEX_UV, uscale=uscale,
                                   vscale=vscale))
        if tclass == "dots":
            c1 = self._resolve_tex_value(ps, "inside", 1.0, "color")
            c2 = self._resolve_tex_value(ps, "outside", 0.0, "color")
            return ("tex", reg.add(texmod.TEX_DOTS, uscale=uscale,
                                   vscale=vscale, c1=rgb_of(c1),
                                   c2=rgb_of(c2)))
        if tclass in ("fbm", "wrinkled", "marble", "windy"):
            tt = {"fbm": texmod.TEX_FBM, "wrinkled": texmod.TEX_WRINKLED,
                  "marble": texmod.TEX_MARBLE,
                  "windy": texmod.TEX_WINDY}[tclass]
            return ("tex", reg.add(tt, wscale=wscale))
        if tclass == "ptex":
            # per-face texture baked to a tile atlas (textures/ptex.py;
            # reference textures/ptex.cpp uses faceIndex the same way)
            from pbrt_tpu.textures import ptex as ptexmod
            fname = ps.find_one_filename("filename", "")
            try:
                pt = ptexmod.read_ptex(fname)
                atlas, tpr, tile = ptexmod.bake_atlas(pt["faces"])
                if len(pt["faces"]) > tpr * tpr:
                    log.warning("ptex %r: %d faces exceed the %dx%d "
                                "atlas; extra faces clamp to the last "
                                "tile", fname, len(pt["faces"]), tpr, tpr)
                gamma = ps.find_one_float("gamma", 1.0)
                scale = ps.find_one_float("scale", 1.0)
                if gamma != 1.0:
                    atlas = np.power(np.maximum(atlas, 0.0), gamma)
                return ("tex", reg.add(texmod.TEX_PTEX,
                                       image=atlas * scale,
                                       p5=float(tpr), p6=float(tile)))
            except Exception as e:
                log.warning("ptex file %r unusable (%s) -> 0.5", fname, e)
                return ("const", 0.5 if ttype == "float"
                        else np.full(31, 0.5, np.float32))
        log.warning("texture class %r unsupported; using 0.5", tclass)
        return ("const", 0.5 if ttype == "float"
                else np.full(31, 0.5, np.float32))

    def _resolve_tex_value(self, ps, name, default, ttype):
        """Constant value of a possibly-texture param (for folding)."""
        tex = ps.find_texture(name)
        if tex is not None:
            table = (self.graphics.float_textures if ttype == "float"
                     else self.graphics.spectrum_textures)
            entry = table.get(tex)
            if entry is not None and entry[0] == "const":
                return entry[1]
            log.warning("texture %r folded to 0.5 inside %s", tex, name)
            return (0.5 if ttype == "float"
                    else np.full(31, 0.5, np.float32))
        if ttype == "float":
            return ps.find_one_float(name, default)
        return ps.find_one_spectrum(name, default)

    # ---------------------------------------------------------- materials
    def _d_Material(self, s):
        mname = unquote(s.next())
        ps = self._params(s)
        self.graphics.material_id = self._make_material(mname, ps)
        self.graphics.material_name = mname

    def _d_MakeNamedMaterial(self, s):
        name = unquote(s.next())
        ps = self._params(s)
        mtype = ps.find_one_string("type", "matte")
        self.graphics.named_materials[name] = self._make_material(
            mtype, ps, name=name)

    def _d_NamedMaterial(self, s):
        name = unquote(s.next())
        mid = self.graphics.named_materials.get(name)
        if mid is None:
            log.warning("unknown named material %r", name)
            return
        self.graphics.material_id = mid
        self.graphics.material_name = name

    def _spectrum_or_texture(self, ps, name, default, kind="illuminant"):
        # kind follows the reference parser: rgb/color params — even
        # reflectances — convert with SpectrumType::Illuminant
        # (paramset.cpp:116 + spectrum.h:429 default argument)
        """Returns (spectrum [31], tex_id) — tex_id -1 for constants."""
        tex = ps.find_texture(name)
        if tex is not None:
            entry = self.graphics.spectrum_textures.get(tex)
            if entry is None:
                fentry = self.graphics.float_textures.get(tex)
                if fentry is not None:
                    if fentry[0] == "const":
                        return (np.full(31, float(fentry[1]), np.float32),
                                -1)
                    return np.full(31, 0.5, np.float32), fentry[1]
                log.warning("unknown texture %r", tex)
                return np.full(31, 0.5, np.float32), -1
            if entry[0] == "const":
                return np.asarray(entry[1], np.float32), -1
            return np.full(31, 0.5, np.float32), entry[1]
        return ps.find_one_spectrum(name, default, kind), -1

    def _float_or_texture(self, ps, name, default):
        tex = ps.find_texture(name)
        if tex is not None:
            entry = self.graphics.float_textures.get(tex)
            if entry is not None and entry[0] == "const":
                return float(entry[1])
            return default
        return ps.find_one_float(name, default)

    def _make_material(self, mname, ps, name=""):
        """Factory (reference dispatch api.cpp:552-625 + materials/*.cpp
        defaults).  Returns builder material id."""
        m = MaterialSpec(name=name or mname)
        # extension param: NDF selector for microfacet materials (the
        # reference only uses BeckmannDistribution in tests/bsdftest —
        # microfacet.h:80 — but exposes no scene param; we accept one)
        m.distribution = ps.find_one_string("distribution", "ggx")
        if mname in ("", "none"):
            m.type = ir.MAT_NONE
        elif mname == "matte":
            m.type = ir.MAT_MATTE
            m.kd, m.kd_tex = self._spectrum_or_texture(ps, "Kd", 0.5)
            m.sigma = self._float_or_texture(ps, "sigma", 0.0)
        elif mname == "plastic":
            m.type = ir.MAT_PLASTIC
            m.kd, m.kd_tex = self._spectrum_or_texture(ps, "Kd", 0.25)
            m.ks, m.ks_tex = self._spectrum_or_texture(ps, "Ks", 0.25)
            r = self._float_or_texture(ps, "roughness", 0.1)
            m.rough_u = m.rough_v = r
            m.remap_roughness = ps.find_one_bool("remaproughness", True)
        elif mname == "mirror":
            m.type = ir.MAT_MIRROR
            m.kr = self._spectrum_or_texture(ps, "Kr", 0.9)[0]
        elif mname == "glass":
            m.kr = self._spectrum_or_texture(ps, "Kr", 1.0)[0]
            m.kt = self._spectrum_or_texture(ps, "Kt", 1.0)[0]
            m.eta = self._float_or_texture(
                ps, "eta", self._float_or_texture(ps, "index", 1.5))
            ur = self._float_or_texture(ps, "uroughness", 0.0)
            vr = self._float_or_texture(ps, "vroughness", 0.0)
            m.rough_u, m.rough_v = ur, vr
            m.type = ir.MAT_ROUGHGLASS if (ur > 0 or vr > 0) else ir.MAT_GLASS
            m.remap_roughness = ps.find_one_bool("remaproughness", True)
        elif mname == "metal":
            m.type = ir.MAT_METAL
            eta_d, k_d = conductor_eta_k("Cu")
            m.eta_spec = ps.find_one_spectrum("eta", eta_d)
            m.k_spec = ps.find_one_spectrum("k", k_d)
            r = self._float_or_texture(ps, "roughness", 0.01)
            m.rough_u = self._float_or_texture(ps, "uroughness", r)
            m.rough_v = self._float_or_texture(ps, "vroughness", r)
            m.ks = np.ones(31, np.float32)
            m.remap_roughness = ps.find_one_bool("remaproughness", True)
        elif mname == "uber":
            m.type = ir.MAT_UBER
            m.kd, m.kd_tex = self._spectrum_or_texture(ps, "Kd", 0.25)
            m.ks, m.ks_tex = self._spectrum_or_texture(ps, "Ks", 0.25)
            m.kr = self._spectrum_or_texture(ps, "Kr", 0.0)[0]
            m.kt = self._spectrum_or_texture(ps, "Kt", 0.0)[0]
            r = self._float_or_texture(ps, "roughness", 0.1)
            m.rough_u = self._float_or_texture(ps, "uroughness", r)
            m.rough_v = self._float_or_texture(ps, "vroughness", r)
            m.eta = self._float_or_texture(ps, "eta", 1.5)
            m.opacity = ps.find_one_spectrum("opacity", 1.0)
            m.remap_roughness = ps.find_one_bool("remaproughness", True)
        elif mname == "substrate":
            m.type = ir.MAT_SUBSTRATE
            m.kd, m.kd_tex = self._spectrum_or_texture(ps, "Kd", 0.5)
            m.ks, m.ks_tex = self._spectrum_or_texture(ps, "Ks", 0.5)
            m.rough_u = self._float_or_texture(ps, "uroughness", 0.1)
            m.rough_v = self._float_or_texture(ps, "vroughness", 0.1)
            m.remap_roughness = ps.find_one_bool("remaproughness", True)
        elif mname == "translucent":
            m.type = ir.MAT_TRANSLUCENT
            m.kd, m.kd_tex = self._spectrum_or_texture(ps, "Kd", 0.25)
            m.ks, m.ks_tex = self._spectrum_or_texture(ps, "Ks", 0.25)
            m.kr = self._spectrum_or_texture(ps, "reflect", 0.5)[0]
            m.kt = self._spectrum_or_texture(ps, "transmit", 0.5)[0]
            m.rough_u = m.rough_v = self._float_or_texture(
                ps, "roughness", 0.1)
        elif mname == "retroreflective":
            # fork material (materials/retroreflective.cpp)
            m.type = ir.MAT_RETRO
            m.kd, m.kd_tex = self._spectrum_or_texture(ps, "Kd", 0.5)
            m.ks, m.ks_tex = self._spectrum_or_texture(ps, "Ks", 0.5)
            m.rough_u = m.rough_v = self._float_or_texture(
                ps, "roughness", 0.1)
        elif mname == "disney":
            # materials/disney.cpp: full principled BSDF.  Roughness +
            # anisotropic are folded into GGX alphas here (aspect
            # remap, disney.cpp ComputeScatteringFunctions); the lobe
            # weights travel in the mat_disney[8] block.
            m.type = ir.MAT_DISNEY
            m.kd = self._spectrum_or_texture(ps, "color", 0.5)[0]
            rough = self._float_or_texture(ps, "roughness", 0.5)
            aniso = self._float_or_texture(ps, "anisotropic", 0.0)
            aspect = float(np.sqrt(max(1.0 - 0.9 * aniso, 1e-4)))
            m.rough_u = max(rough * rough / aspect, 1e-3)
            m.rough_v = max(rough * rough * aspect, 1e-3)
            m.remap_roughness = False
            m.eta = self._float_or_texture(ps, "eta", 1.5)
            metallic = self._float_or_texture(ps, "metallic", 0.0)
            strans = self._float_or_texture(ps, "spectrans", 0.0)
            m.disney = (
                metallic,
                self._float_or_texture(ps, "speculartint", 0.0),
                self._float_or_texture(ps, "sheen", 0.0),
                self._float_or_texture(ps, "sheentint", 0.5),
                self._float_or_texture(ps, "clearcoat", 0.0),
                self._float_or_texture(ps, "clearcoatgloss", 1.0),
                strans,
                aniso)
            # specTrans transmits sqrt(baseColor) (disney.cpp thin=false)
            m.kt = np.sqrt(np.maximum(np.asarray(m.kd, np.float32), 0.0))
        elif mname == "mix":
            # materials/mixmat.cpp: blend two named materials by `amount`;
            # realized as stochastic per-ray selection (unbiased)
            m.type = ir.MAT_MIX
            n1 = ps.find_one_string("namedmaterial1", "").strip('"')
            n2 = ps.find_one_string("namedmaterial2", "").strip('"')
            m.mix_a = self.graphics.named_materials.get(n1, -1)
            m.mix_b = self.graphics.named_materials.get(n2, -1)
            amt = ps.find_one_spectrum("amount", 0.5)
            m.mix_amt = float(np.asarray(amt).mean())
            if m.mix_a < 0 or m.mix_b < 0:
                log.warning("mix references unknown materials %r/%r -> "
                            "matte", n1, n2)
                m.type = ir.MAT_MATTE
                m.kd = np.full(31, 0.5, np.float32)
        elif mname == "hair":
            # materials/hair.cpp CreateHairMaterial: sigma_a directly,
            # or from color (inverse-fit), or from melanin concentration
            m.type = ir.MAT_HAIR
            bm = ps.find_one_float("beta_m", 0.3)
            bn = ps.find_one_float("beta_n", 0.3)
            sig = np.asarray(ps.find_one_spectrum("sigma_a", -1.0),
                             np.float32).reshape(-1)
            col = np.asarray(ps.find_one_spectrum("color", -1.0),
                             np.float32).reshape(-1)
            if (sig >= 0).all():
                sigma_a = sig
            elif (col >= 0).all():
                c = np.clip(col, 1e-4, 1.0)
                denom = (5.969 - 0.215 * bn + 2.532 * bn ** 2
                         - 10.73 * bn ** 3 + 5.574 * bn ** 4
                         + 0.245 * bn ** 5)
                sigma_a = (np.log(c) / denom) ** 2
            else:
                ce = ps.find_one_float("eumelanin", 1.3)
                cp = ps.find_one_float("pheomelanin", 0.0)
                rgb = (ce * np.array([0.419, 0.697, 1.37])
                       + cp * np.array([0.187, 0.4, 1.05]))
                s_max = max(float(rgb.max()), 1e-6)
                sigma_a = np.asarray(
                    spec.from_rgb_np(rgb / s_max, "reflectance"),
                    np.float32) * s_max
            # slot reuse: kd=sigma_a spectrum, rough_u/v=beta_m/beta_n,
            # sigma=alpha (degrees), eta=1.55 (keratin)
            m.kd = sigma_a
            m.rough_u, m.rough_v = bm, bn
            m.remap_roughness = False
            m.sigma = ps.find_one_float("alpha", 2.0)
            m.eta = ps.find_one_float("eta", 1.55)
        elif mname == "fourier":
            # materials/fourier.cpp: SCATFUN measured BSDF, baked at
            # compile into a (muI,muO,phi) lattice (materials/fourier.py)
            fname = ps.find_one_filename("bsdffile", "")
            try:
                from pbrt_tpu.materials import fourier as fouriermod
                tab = fouriermod.read_bsdf(fname)
                grid = fouriermod.bake_grid(tab)
                m.type = ir.MAT_FOURIER
                m.eta = tab["eta"]
                m.fourier_id = self.builder.add_fourier_grid(grid)
            except Exception as e:
                log.warning("fourier bsdffile %r unusable (%s) -> matte",
                            fname, e)
                m.type = ir.MAT_MATTE
                m.kd = np.full(31, 0.5, np.float32)
        elif mname in ("subsurface", "kdsubsurface"):
            # materials/subsurface.cpp:60-88 / kdsubsurface.cpp.
            # Full TabulatedBSSRDF: the beam-diffusion profile table +
            # per-channel (sigma_t, rho) ride the material record; the
            # path integrator relocates transmitted lanes with probe
            # rays (bssrdf.cpp Sample_S).  kd keeps the table's
            # effective albedo so integrators without a probe pass
            # (bdpt/sppm/whitted) fall back to the diffusion limit.
            from pbrt_tpu.materials import bssrdf as bssrdfmod

            def _mag_spectrum(rgb):
                rgb = np.asarray(rgb, np.float64)
                s = max(float(rgb.max()), 1e-9)
                return np.asarray(spec.from_rgb_np(rgb / s, "reflectance"),
                                  np.float32) * s

            g = ps.find_one_float("g", 0.0)
            eta = ps.find_one_float("eta", 1.33)
            scale = ps.find_one_float("scale", 1.0)
            table = bssrdfmod.compute_beam_diffusion_bssrdf(g, eta)
            if mname == "subsurface":
                default_a = _mag_spectrum([0.0011, 0.0024, 0.014])
                default_s = _mag_spectrum([2.55, 3.21, 3.77])
                pname = ps.find_one_string("name", "")
                if pname:
                    from pbrt_tpu.media.presets import (
                        get_medium_scattering_properties)
                    got = get_medium_scattering_properties(pname)
                    if got is not None:
                        default_a, default_s = got
                        g = 0.0  # database stores reduced coefficients
                sig_a = ps.find_one_spectrum("sigma_a", default_a) * scale
                sig_s = ps.find_one_spectrum("sigma_s", default_s) * scale
            else:
                kd_t = ps.find_one_spectrum("Kd", 0.5)
                mfp = ps.find_one_spectrum("mfp", 1.0) * scale
                sig_a, sig_s = bssrdfmod.subsurface_from_diffuse(
                    table, np.asarray(kd_t, np.float64),
                    np.asarray(mfp, np.float64))
            sigp_s = sig_s * (1.0 - g)
            sigp_t = np.maximum(sig_a + sigp_s, 1e-9)
            rho_p = sigp_s / sigp_t
            rho_eff = np.interp(rho_p, table["rho"], table["rho_eff"])
            m.type = ir.MAT_SUBSURFACE
            m.bssrdf_id = self.builder.add_bssrdf_table(table)
            sigma_t = np.maximum(np.asarray(sig_a + sig_s, np.float64),
                                 0.0)
            m.sss_sigma_t = sigma_t.astype(np.float32)
            m.sss_rho = (np.asarray(sig_s, np.float64)
                         / np.maximum(sigma_t, 1e-12)).astype(np.float32)
            m.kd = np.clip(rho_eff, 0.0, 1.0).astype(np.float32)
            m.ks = (np.asarray(
                self._spectrum_or_texture(ps, "Kr", 1.0)[0], np.float32)
                * np.float32(0.05))
            m.eta = eta
            # reference default is a SMOOTH FresnelSpecular interface
            # (subsurface.cpp:127-129: uroughness/vroughness default 0)
            m.rough_u = ps.find_one_float("uroughness", 0.0)
            m.rough_v = ps.find_one_float("vroughness", m.rough_u)
            m.remap_roughness = ps.find_one_bool("remaproughness", True)
        else:
            log.warning("unknown material %r -> matte", mname)
            m.type = ir.MAT_MATTE
        # bump map binding (any material; reference material.h Bump)
        btex = ps.find_texture("bumpmap")
        if btex is not None:
            entry = self.graphics.float_textures.get(btex)
            if entry is not None and entry[0] == "tex":
                m.bump_tex = entry[1]
        ps.report_unused(f"material {mname}", log.warning)
        return self.builder.add_material(m)

    # ------------------------------------------------------------- lights
    def _d_LightSource(self, s):
        lname = unquote(s.next())
        ps = self._params(s)
        xf = self.ctm[0]
        sc = ps.find_one_spectrum("scale", 1.0, "illuminant")
        if lname == "point":
            I = ps.find_one_spectrum("I", 1.0, "illuminant") * sc
            p = xf.apply_point(ps.find_one_point("from", [0, 0, 0]))
            self.builder.add_point_light(p, I)
        elif lname == "spot":
            I = ps.find_one_spectrum("I", 1.0, "illuminant") * sc
            frm = xf.apply_point(ps.find_one_point("from", [0, 0, 0]))
            to = xf.apply_point(ps.find_one_point("to", [0, 0, 1]))
            cone = ps.find_one_float("coneangle", 30.0)
            delta = ps.find_one_float("conedeltaangle", 5.0)
            self.builder.add_spot_light(
                frm, np.asarray(to) - np.asarray(frm), I,
                float(np.cos(np.radians(cone))),
                float(np.cos(np.radians(cone - delta))))
        elif lname == "distant":
            L = ps.find_one_spectrum("L", 1.0, "illuminant") * sc
            frm = xf.apply_point(ps.find_one_point("from", [0, 0, 0]))
            to = xf.apply_point(ps.find_one_point("to", [0, 0, 1]))
            self.builder.add_distant_light(np.asarray(to) - np.asarray(frm), L)
        elif lname in ("infinite", "exinfinite"):
            L = ps.find_one_spectrum("L", 1.0, "illuminant") * sc
            mapname = ps.find_one_filename("mapname", "")
            env = None
            if mapname:
                env = _load_env_map(mapname, L)
            self.builder.add_infinite_light(L, env_map=env, light_to_world=xf)
        elif lname in ("goniometric", "projection"):
            from pbrt_tpu.textures import textures as texmod
            I = ps.find_one_spectrum("I", 1.0, "illuminant") * sc
            p = xf.apply_point(np.zeros(3))
            d = xf.apply_normal(np.asarray([0.0, 0.0, 1.0]))
            d = d / max(np.linalg.norm(d), 1e-12)
            mapname = ps.find_one_filename("mapname", "")
            tex_id = 0
            if mapname:
                try:
                    tex_id = self.builder.textures.add(texmod.TEX_IMAGE,
                                                       image=mapname)
                except Exception as e:
                    log.warning("light map %r failed (%s)", mapname, e)
            fov = ps.find_one_float("fov", 45.0)
            ltype = (ir.LIGHT_GONIO if lname == "goniometric"
                     else ir.LIGHT_PROJECTION)
            self.builder.add_light(
                type=ltype, pos=np.asarray(p, np.float32),
                dir=d.astype(np.float32), L=np.asarray(I, np.float32),
                params=np.array([0, 0, tex_id,
                                 np.cos(np.radians(fov) / 2)], np.float32))
        else:
            log.warning("unknown light %r — skipped", lname)
        ps.report_unused(f"light {lname}", log.warning)

    def _d_AreaLightSource(self, s):
        lname = unquote(s.next())
        ps = self._params(s)
        L = ps.find_one_spectrum("L", 1.0, "illuminant") * \
            ps.find_one_spectrum("scale", 1.0, "illuminant")
        self.graphics.area_light = {
            "L": L, "twosided": ps.find_one_bool("twosided", False),
            "samples": ps.find_one_int(
                "nsamples", ps.find_one_int("samples", 1))}

    # ------------------------------------------------------------- shapes
    def _d_Shape(self, s):
        sname = unquote(s.next())
        ps = self._params(s)
        xf = self.ctm[0]
        g = self.graphics
        light_id = -1
        if g.area_light is not None:
            light_id = self.builder.add_area_light(
                g.area_light["L"], g.area_light["twosided"])
        mat = g.material_id
        flip = g.reverse_orientation
        inst = self.next_instance_id
        self.next_instance_id += 1
        self.instance_names[inst] = f"{sname}_{inst}"
        # per-primitive MediumInterface (api.cpp pbrtMediumInterface):
        # resolve the active inside/outside named media to table indices
        self.builder.current_medium = (
            self._medium_index(g.inside_medium),
            self._medium_index(g.outside_medium))

        def record_or_add_mesh(verts, idx, norms=None, uvs=None):
            # two-sample CTM => mesh motion blur: both keyframes'
            # world-space vertices (reference: AnimatedTransform on the
            # TransformedPrimitive, primitive.cpp:73-89 +
            # transform.cpp:255+ — here baked as per-vertex linear
            # motion between the TransformTimes keyframes)
            import numpy as _np
            xf1 = (self.ctm[1] if not _np.allclose(self.ctm[1].m, xf.m)
                   else None)
            if self.current_object is not None:
                # store in object space of definition (apply CTM now; the
                # instance transform is applied on top, like the reference's
                # TransformedPrimitive, primitive.cpp:73-89)
                if xf1 is not None:
                    log.warning(
                        "mesh motion blur inside ObjectBegin/%s is not "
                        "propagated through instances; second keyframe "
                        "ignored", self.current_object)
                wv = xf.apply_point(np.asarray(verts, np.float64))
                wn = (xf.apply_normal(np.asarray(norms, np.float64))
                      if norms is not None else None)
                self.objects[self.current_object].append(
                    ("mesh", wv, idx, wn, uvs, mat, light_id))
            else:
                self.builder.add_triangle_mesh(
                    verts, idx, mat, normals=norms, uvs=uvs,
                    light_id=light_id, instance_id=inst,
                    flip_normal=flip, object_to_world=xf,
                    object_to_world1=xf1)

        def record_or_add_quadric(qtype, params):
            # two-sample CTM => quadric motion blur (reference:
            # TransformSet x2, api.cpp:137-166; AnimatedTransform on
            # the primitive, transform.cpp:255+)
            import numpy as _np
            xf1 = (self.ctm[1] if not _np.allclose(self.ctm[1].m, xf.m)
                   else None)
            if self.current_object is not None:
                self.objects[self.current_object].append(
                    ("quadric", qtype, xf, params, mat, light_id, flip))
            else:
                self.builder.add_quadric(qtype, xf, params, mat,
                                         light_id=light_id, instance_id=inst,
                                         flip_normal=flip,
                                         object_to_world1=xf1)

        if sname == "trianglemesh":
            verts = ps.find_points("P")
            idx = ps.find_ints("indices").reshape(-1, 3)
            norms = ps.find_points("N")
            uvs = ps.find_point2s("uv")
            if uvs is None:
                uvs = ps.find_point2s("st")
            record_or_add_mesh(verts, idx, norms, uvs)
        elif sname == "plymesh":
            from pbrt_tpu.shapes.ply import read_ply
            fname = ps.find_one_filename("filename")
            verts, idx, norms, uvs = read_ply(fname)
            record_or_add_mesh(verts, idx, norms, uvs)
        elif sname == "sphere":
            r = ps.find_one_float("radius", 1.0)
            zmin = ps.find_one_float("zmin", -r)
            zmax = ps.find_one_float("zmax", r)
            phimax = np.radians(ps.find_one_float("phimax", 360.0))
            record_or_add_quadric(ir.PRIM_SPHERE, (r, zmin, zmax, phimax))
        elif sname == "cylinder":
            r = ps.find_one_float("radius", 1.0)
            zmin = ps.find_one_float("zmin", -1.0)
            zmax = ps.find_one_float("zmax", 1.0)
            phimax = np.radians(ps.find_one_float("phimax", 360.0))
            record_or_add_quadric(ir.PRIM_CYLINDER, (r, zmin, zmax, phimax))
        elif sname == "disk":
            h = ps.find_one_float("height", 0.0)
            r = ps.find_one_float("radius", 1.0)
            ir_ = ps.find_one_float("innerradius", 0.0)
            phimax = np.radians(ps.find_one_float("phimax", 360.0))
            record_or_add_quadric(ir.PRIM_DISK, (r, h, ir_, phimax))
        elif sname == "cone":
            r = ps.find_one_float("radius", 1.0)
            h = ps.find_one_float("height", 1.0)
            phimax = np.radians(ps.find_one_float("phimax", 360.0))
            record_or_add_quadric(ir.PRIM_CONE, (r, 0.0, h, phimax))
        elif sname == "paraboloid":
            r = ps.find_one_float("radius", 1.0)
            z0 = ps.find_one_float("zmin", 0.0)
            z1 = ps.find_one_float("zmax", 1.0)
            phimax = np.radians(ps.find_one_float("phimax", 360.0))
            record_or_add_quadric(ir.PRIM_PARABOLOID, (r, z0, z1, phimax))
        elif sname == "hyperboloid":
            # shapes/hyperboloid.cpp: surface swept by segment p1->p2
            # rotated phimax about z; tessellated at compile (the
            # accelerator then sees only triangles, like curve/nurbs)
            from pbrt_tpu.shapes.nurbs import tessellate_hyperboloid
            p1 = ps.find_points("p1")
            p2 = ps.find_points("p2")
            p1 = p1[0] if p1 is not None else np.array([0.0, 0.0, 0.0])
            p2 = p2[0] if p2 is not None else np.array([1.0, 1.0, 1.0])
            phimax = np.radians(ps.find_one_float("phimax", 360.0))
            verts, idx = tessellate_hyperboloid(p1, p2, phimax)
            record_or_add_mesh(verts, idx)
        elif sname == "loopsubdiv":
            from pbrt_tpu.shapes.subdiv import loop_subdivide
            verts = ps.find_points("P")
            idx = ps.find_ints("indices").reshape(-1, 3)
            levels = ps.find_one_int("levels",
                                     ps.find_one_int("nlevels", 3))
            verts, idx, norms = loop_subdivide(verts, idx, levels)
            record_or_add_mesh(verts, idx, norms=norms)
        elif sname == "heightfield":
            nu = ps.find_one_int("nu", 2)
            nv = ps.find_one_int("nv", 2)
            z = ps.find_floats("Pz").reshape(nv, nu)
            xs, ys = np.meshgrid(np.linspace(0, 1, nu),
                                 np.linspace(0, 1, nv))
            verts = np.stack([xs, ys, z], -1).reshape(-1, 3)
            idx = []
            for j in range(nv - 1):
                for i in range(nu - 1):
                    a = j * nu + i
                    idx += [[a, a + 1, a + nu + 1], [a, a + nu + 1, a + nu]]
            record_or_add_mesh(verts, np.asarray(idx))
        elif sname == "curve":
            from pbrt_tpu.shapes.curve import curve_from_params
            P_cp = ps.find_points("P")
            w = ps.find_one_float("width", 1.0)
            n0 = ps.find_points("N")
            verts, idx, uvs = curve_from_params(
                P_cp,
                degree=ps.find_one_int("degree", 3),
                basis=ps.find_one_string("basis", "bezier"),
                width0=ps.find_one_float("width0", w),
                width1=ps.find_one_float("width1", w),
                curve_type=ps.find_one_string("type", "flat"),
                normal0=n0[0] if n0 is not None else None)
            record_or_add_mesh(verts, idx, None, uvs)
        elif sname == "nurbs":
            # shapes/nurbs.cpp tessellates to a triangle mesh at
            # creation; same here (Cox-de Boor eval in shapes/nurbs.py)
            from pbrt_tpu.shapes.nurbs import tessellate_nurbs
            nu_ = ps.find_one_int("nu", 0)
            nv_ = ps.find_one_int("nv", 0)
            uk = ps.find_floats("uknots")
            vk = ps.find_floats("vknots")
            Pw = ps.find_floats("Pw")
            P = ps.find_points("P")
            if nu_ <= 0 or nv_ <= 0 or uk is None or vk is None or \
                    (P is None and Pw is None):
                log.warning("nurbs missing required params — skipped")
            else:
                uo = ps.find_one_int("uorder", 3)
                vo = ps.find_one_int("vorder", 3)
                verts, idx, uvs = tessellate_nurbs(
                    nu_, nv_, uo, vo, uk, vk,
                    ps.find_one_float("u0", float(uk[uo - 1])),
                    ps.find_one_float("u1", float(uk[nu_])),
                    ps.find_one_float("v0", float(vk[vo - 1])),
                    ps.find_one_float("v1", float(vk[nv_])),
                    P=P, Pw=Pw)
                record_or_add_mesh(verts, idx, None, uvs)
        else:
            log.warning("unknown shape %r — skipped", sname)
        ps.report_unused(f"shape {sname}", log.warning)

    # ------------------------------------------------------------ finish
    def _d_WorldEnd(self, s):
        self.in_world = False
        self.builder.camera_medium = self._medium_index(
            self._camera_medium_name)
        fp = self.film_params
        width = fp.find_one_int("xresolution", 1280)
        height = fp.find_one_int("yresolution", 720)
        crop = fp.find_floats("cropwindow")
        crop = tuple(crop) if crop is not None else (0.0, 1.0, 0.0, 1.0)
        filt_params = {}
        for k in ("alpha", "B", "C", "tau"):
            v = self.filter_params.find_one_float(k, None) \
                if k in self.filter_params.items else None
            if v is not None:
                filt_params[k] = v
        radius = None
        xw = self.filter_params.find_one_float("xwidth", -1.0)
        yw = self.filter_params.find_one_float("ywidth", -1.0)
        if xw > 0 or yw > 0:
            radius = (xw if xw > 0 else 2.0, yw if yw > 0 else 2.0)
        if radius is not None:
            filt_params["radius"] = radius

        ip = self.integrator_params
        integ_params = {
            "maxdepth": ip.find_one_int("maxdepth", 5),
            "rrthreshold": ip.find_one_float("rrthreshold", 1.0),
            "lightsamplestrategy": ip.find_one_string(
                "lightsamplestrategy", "spatial"),
            "numCABands": ip.find_one_int("numCABands", 4),
            "strategy": ip.find_one_string("strategy", "depth"),
            "cossample": ip.find_one_bool("cossample", True),
            "radius": (ip.find_one_float("radius", 0.0) or None),
            "chains": ip.find_one_int("chains", 4096),
            "bootstrapsamples": ip.find_one_int("bootstrapsamples", 65536),
            "sigma": ip.find_one_float("sigma", 0.01),
            "largestepprobability": ip.find_one_float(
                "largestepprobability", 0.3),
            "mutationsperpixel": ip.find_one_int("mutationsperpixel", 100),
            "iterations": ip.find_one_int(
                "iterations", ip.find_one_int("numiterations", 64)),
        }
        cp = self.camera_params
        cam_params = {
            "fov": cp.find_one_float("fov", 90.0),
            "lensradius": cp.find_one_float("lensradius", 0.0),
            "focaldistance": cp.find_one_float("focaldistance", 1e6),
            "shutteropen": cp.find_one_float("shutteropen", 0.0),
            "shutterclose": cp.find_one_float("shutterclose", 1.0),
            "screenwindow": cp.find_floats("screenwindow"),
            "lensfile": cp.find_one_filename("lensfile", ""),
            "aperturediameter": cp.find_one_float("aperturediameter", 1.0),
            "filmdistance": cp.find_one_float("filmdistance", 70.0),
            "filmdiag": cp.find_one_float("filmdiag", 35.0),
        }
        # kdtree: a real SAH kd-tree (accel/kdtree.py, reference
        # kdtreeaccel.cpp) with primitive duplication, traversed by
        # lockstep kd-restart; the BVH is still built (the dense TPU
        # kernel takes its leaf order), but CPU-path intersections run
        # the kd-tree when selected
        scene = self.builder.build(split_method="sah",
                                   accel=self.accel_kind)
        return RenderJob(
            scene=scene, builder=self.builder,
            camera_kind=self.camera_kind, camera_params=cam_params,
            cam_to_world=self.camera_to_world,
            cam_to_world1=self.camera_to_world1,
            film_width=width, film_height=height,
            film_filename=fp.find_one_string("filename", "pbrt.exr"),
            film_diagonal=fp.find_one_float("diagonal", 35.0),
            film_scale=fp.find_one_float("scale", 1.0),
            spectral_flag=fp.find_one_bool("spectralFlag", True),
            max_sample_luminance=fp.find_one_float("maxsampleluminance",
                                                   1e30),
            crop_window=crop,
            filter_name=self.filter_name, filter_params=filt_params,
            sampler_kind=_map_sampler(self.sampler_kind),
            spp=self.sampler_params.find_one_int("pixelsamples", 16),
            integrator_kind=self.integrator_kind,
            integrator_params=integ_params,
            instance_names=self.instance_names,
            material_names=self.builder.material_names,
            media=self.media,
            prim_media_names=tuple(
                n for n, i in self._medium_ids.items() if i >= 0))


def _map_sampler(kind):
    kind = {"random": "independent", "lowdiscrepancy": "zerotwosequence",
            "02sequence": "zerotwosequence"}.get(kind, kind)
    from pbrt_tpu.samplers.samplers import SAMPLER_TYPES
    if kind not in SAMPLER_TYPES:
        log.warning("unknown sampler %r; using halton", kind)
        return "halton"
    return kind


def _load_env_map(path, scale):
    """Load an env map image into [H,W,31] spectra."""
    from pbrt_tpu.film.io import read_image
    img = read_image(path)
    s = spec.from_rgb_np(img, "illuminant")
    return s * scale[None, None, :]


def parse_scene(path):
    """Top-level: parse a .pbrt file -> RenderJob (reference:
    pbrtParseFile, api.h:91)."""
    api = PbrtAPI()
    job = api.parse_file(path)
    if job is None:
        raise ValueError(f"{path}: no WorldEnd — nothing to render")
    return job
