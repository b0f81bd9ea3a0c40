"""Scene intermediate representation: flat device tensors.

This is the TPU analog of the reference's `RenderOptions::MakeScene`
(api.cpp:1739) + `Scene` (scene.h:50-80) + `GeometricPrimitive` tables:
the object graph is compiled host-side into a pytree of SoA tensors —
BVH nodes, primitive SoA, material/light tables — that the wavefront
kernels index with gathers.  Everything is static-shape.

Primitive encoding: unified table with a type tag; triangles carry
(v0, e1, e2) plus optional shading normals/uvs; quadrics (sphere, cylinder,
disk, cone, paraboloid, hyperboloid) reference a quadric table holding
world<->object transforms and parameters (reference shapes:
src/shapes/{triangle,sphere,...}.cpp).

The fork's metadata ids (instanceId / materialId, interaction.h:154-155)
are first-class columns so the `metadata` integrator is a gather.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax.numpy as jnp
from flax import struct

from pbrt_tpu.accel.bvh import build_bvh
from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.core.transform import Transform

# primitive type tags
PRIM_TRIANGLE = 0
PRIM_SPHERE = 1
PRIM_CYLINDER = 2
PRIM_DISK = 3
PRIM_CONE = 4
PRIM_PARABOLOID = 5
PRIM_HYPERBOLOID = 6

# light type tags
LIGHT_POINT = 0
LIGHT_DISTANT = 1
LIGHT_AREA = 2          # references emissive primitive range
LIGHT_INFINITE = 3
LIGHT_SPOT = 4
LIGHT_GONIO = 5
LIGHT_PROJECTION = 6


@struct.dataclass
class SceneData:
    """Device-side scene: the pytree passed into render kernels."""
    # --- BVH (octant-threaded layout; see accel/bvh.py) ---
    bvh_packed: jnp.ndarray    # [N,8] lo,hi,bitcast(leaf_bits),axis
    bvh_hit: jnp.ndarray       # [8,N] per-octant enter links
    bvh_miss: jnp.ndarray      # [8,N] per-octant skip links

    # --- primitive SoA (BVH-leaf order) ---
    prim_type: jnp.ndarray     # [P]
    tri_packed: jnp.ndarray    # [P,12] v0,e1,e2,pad — one-gather layout
    # make_hit's one-gather layout (all per-prim surface data a winning
    # lane needs in a single row, instead of ~9 per-table lookups):
    # cols 0:24 f32 e1,e2,ns0,ns1,ns2,uv0,uv1,uv2,pad; cols 24:32 are
    # int32 type,quad_idx,material,light,instance,flip,face bit-viewed
    # as f32 so the whole record is ONE gather (bitcast back in make_hit)
    shade_all: jnp.ndarray     # [P,32]
    tri_v0: jnp.ndarray        # [P,3]
    tri_e1: jnp.ndarray        # [P,3]
    tri_e2: jnp.ndarray        # [P,3]
    tri_ns: jnp.ndarray        # [P,3,3] shading normals (0 => use geometric)
    tri_uv: jnp.ndarray        # [P,3,2]
    quad_idx: jnp.ndarray      # [P] index into quadric table (-1 for tris)
    prim_material: jnp.ndarray  # [P]
    prim_light: jnp.ndarray    # [P] area-light index or -1
    prim_instance: jnp.ndarray  # [P] fork instanceId (mesh id)
    prim_flip_normal: jnp.ndarray  # [P] bool (ReverseOrientation ^ swapsHandedness)

    # --- quadric table ---
    quad_o2w: jnp.ndarray      # [Q,4,4]
    quad_w2o: jnp.ndarray      # [Q,4,4]
    quad_params: jnp.ndarray   # [Q,4] (radius/zmin/zmax/phimax; type-specific)
    quad_type: jnp.ndarray     # [Q] PRIM_* tag per quadric
    quad_prim: jnp.ndarray     # [Q] prim index (BVH order) of each quadric

    # --- material table (tagged union of per-type params) ---
    mat_type: jnp.ndarray      # [M]
    mat_kd: jnp.ndarray        # [M,31]
    mat_ks: jnp.ndarray        # [M,31]
    mat_kr: jnp.ndarray        # [M,31]
    mat_kt: jnp.ndarray        # [M,31]
    mat_rough_u: jnp.ndarray   # [M]
    mat_rough_v: jnp.ndarray   # [M]
    mat_eta: jnp.ndarray       # [M] scalar IoR (dielectrics)
    mat_eta_spec: jnp.ndarray  # [M,31] conductor eta(lambda)
    mat_k_spec: jnp.ndarray    # [M,31] conductor k(lambda)
    mat_sigma: jnp.ndarray     # [M] oren-nayar sigma (degrees)
    mat_opacity: jnp.ndarray   # [M,31] (uber)
    mat_remap_rough: jnp.ndarray  # [M] bool: remaproughness
    # texture hooks: index into texture table per slot (-1 = constant above)
    mat_kd_tex: jnp.ndarray    # [M]
    mat_ks_tex: jnp.ndarray    # [M]
    mat_bump_tex: jnp.ndarray  # [M]
    # mix material (materials/mixmat.cpp): stochastic select a vs b
    mat_mix_a: jnp.ndarray     # [M] material id of namedmaterial1
    mat_mix_b: jnp.ndarray     # [M] material id of namedmaterial2
    mat_mix_amt: jnp.ndarray   # [M] P(select a)
    # disney material extras (materials/disney.cpp):
    # [metallic, specTint, sheen, sheenTint, clearcoat, ccGloss,
    #  specTrans, anisotropic]
    mat_disney: jnp.ndarray    # [M,8]
    # fourier (measured) BSDFs baked to (muI,muO,phi) lattices at scene
    # compile (materials/fourier.py bake_grid)
    fourier_grid: jnp.ndarray  # [F,NM,NM,NP,3]
    mat_fourier_id: jnp.ndarray  # [M] index into fourier_grid or -1
    # Catmull-Rom sampling marginals baked from the lattice
    # (materials/fourier.py bake_cr_tables)
    fourier_a0: jnp.ndarray       # [F, NMi, NMo] phi-avg lum * |mu_i|
    fourier_lum: jnp.ndarray      # [F, NMi, NMo, NP] luminance lattice
    # tabulated BSSRDF diffusion profiles, one table per distinct
    # (g, eta) (core/bssrdf.cpp ComputeBeamDiffusionBSSRDF); the rho /
    # optical-radius grids are construction-time constants shared by
    # every table
    bssrdf_profile: jnp.ndarray   # [T,NR,NK] 2*pi*r-weighted profile
    bssrdf_cdf: jnp.ndarray       # [T,NR,NK] per-rho-row radius CDF
    bssrdf_rho: jnp.ndarray       # [NR]
    bssrdf_radius: jnp.ndarray    # [NK]
    mat_bssrdf_id: jnp.ndarray    # [M] table idx or -1
    mat_sss_sigma_t: jnp.ndarray  # [M,31] extinction (world units)
    mat_sss_rho: jnp.ndarray      # [M,31] single-scatter albedo
    # every per-material column packed into one [2M, MPK_COLS] table
    # (layout: MPK_* constants below; rows = [bf16-hi(t); t - hi]).
    # XLA's TPU gather lowers to a slow per-row loop (~9ms/pass for the
    # ~15 separate gathers at B=65k); a one-hot [B,2M] @ [2M,C] matmul
    # on the MXU fetches the whole record at full speed instead.  The
    # hi/lo split keeps DEFAULT (1-pass bf16) matmul precision while
    # reconstructing the f32 values to ~2^-17 relative (exactly on CPU,
    # where f32 matmuls are true f32) — see bsdf.gather_materials
    mat_packed: jnp.ndarray       # [2M, MPK_COLS] f32
    # per-primitive MediumInterface (homogeneous media table; the
    # reference's MediumInterface nesting, api.cpp MediumInterface)
    prim_medium_in: jnp.ndarray   # [P] medium idx inside or -1
    prim_medium_out: jnp.ndarray  # [P] medium idx outside or -1
    med_sigma_a: jnp.ndarray      # [K,31]
    med_sigma_s: jnp.ndarray      # [K,31]
    med_g: jnp.ndarray            # [K]
    # per-medium density grids (GridDensityMedium bound through
    # MediumInterface, grid.cpp:46+): padded to the max extents across
    # the scene's grid media; homogeneous rows carry a 1x1x1 ones grid
    med_density: jnp.ndarray      # [K, DZ, DY, DX]
    med_dims: jnp.ndarray         # [K,3] (nz,ny,nx) actual extents
    med_w2m: jnp.ndarray          # [K,4,4] world -> unit-cube medium
    med_inv_maxd: jnp.ndarray     # [K] 1/max density (majorant helper)
    med_is_grid: jnp.ndarray      # [K] bool

    # --- light table ---
    light_type: jnp.ndarray    # [L]
    light_L: jnp.ndarray       # [L,31] radiance / intensity / emission
    light_pos: jnp.ndarray     # [L,3]
    light_dir: jnp.ndarray     # [L,3] (distant/spot)
    light_params: jnp.ndarray  # [L,4] type-specific (spot cos angles, etc.)
    light_quad: jnp.ndarray    # [L] quadric idx for sphere area lights (-1)
    light_two_sided: jnp.ndarray  # [L] bool
    # mesh area lights: padded per-light triangle list + area CDF
    light_tri_idx: jnp.ndarray   # [L,T] prim indices (post-BVH order), -1 pad
    light_tri_cdf: jnp.ndarray   # [L,T+1] area cdf
    light_area: jnp.ndarray      # [L] total area (or sphere area)
    # mesh light-tri geometry flattened to one row per (light, tri) so
    # NEE fetches v0,e1,e2,flip with ONE fused fetch (ops/fetch.py)
    # instead of 4 gathers into the full triangle tables
    light_tri_packed: jnp.ndarray  # [L*T, 10] v0|e1|e2|flip
    # sphere area lights: world center/radius precomputed at build so
    # cone sampling never gathers 4x4 quadric matrices per lane
    light_sph_center: jnp.ndarray  # [L,3]
    light_sph_radius: jnp.ndarray  # [L]
    # light-selection distributions (lights/distrib.py)
    light_power_cdf: jnp.ndarray   # [L+1]
    light_power_pmf: jnp.ndarray   # [L]
    light_spatial_cdf: jnp.ndarray  # [G^3, L+1]
    light_spatial_pmf: jnp.ndarray  # [G^3, L]
    # infinite light env map (equal-area lat-long) — [He,We,31]; 1x1 black if none
    env_map: jnp.ndarray
    env_cond_cdf: jnp.ndarray    # [He, We+1]
    env_marg_cdf: jnp.ndarray    # [He+1]
    env_cond_int: jnp.ndarray    # [He]
    env_to_world: jnp.ndarray    # [4,4]
    env_to_light: jnp.ndarray    # [4,4]

    # --- texture table (textures/textures.py) ---
    tex_images: jnp.ndarray      # [T,2*RES,RES,3] mip canvases
    tex_type: jnp.ndarray        # [T]
    tex_params: jnp.ndarray      # [T,8]
    tex_c1: jnp.ndarray          # [T,3]
    tex_c2: jnp.ndarray          # [T,3]

    # --- dense MXU intersector tables (ops/pallas_intersect.py) ---
    dense_w: jnp.ndarray       # [C, 48, 4*CHUNK] bf16 chunk-major
    dense_cb: jnp.ndarray      # [C, 8] chunk AABBs (centered coords)
    dense_center: jnp.ndarray  # [3]

    # scalars
    world_lo: jnp.ndarray      # [3]
    world_hi: jnp.ndarray      # [3]
    world_radius: jnp.ndarray  # []
    n_lights: int = struct.field(pytree_node=False, default=0)
    n_prims: int = struct.field(pytree_node=False, default=0)
    n_nodes: int = struct.field(pytree_node=False, default=0)
    max_leaf: int = struct.field(pytree_node=False, default=4)
    has_infinite: bool = struct.field(pytree_node=False, default=False)
    inf_light_idx: int = struct.field(pytree_node=False, default=0)
    # static specialization flags (compile-time branch pruning)
    n_quadrics: int = struct.field(pytree_node=False, default=0)
    # static material-family flags: lets the BSDF dispatch skip whole
    # lobe families at trace time when a scene never uses them (the
    # wavefront evaluates every masked lobe otherwise — real VPU cost)
    has_disney: bool = struct.field(pytree_node=False, default=False)
    has_mix: bool = struct.field(pytree_node=False, default=False)
    has_hair: bool = struct.field(pytree_node=False, default=False)
    has_animated_quads: bool = struct.field(pytree_node=False, default=False)
    has_beckmann: bool = struct.field(pytree_node=False, default=False)
    # two-keyframe quadric motion blur (transform.py animated_pair):
    # decomposed object-to-world endpoints; identity pairs for static
    quad_anim_t: jnp.ndarray = None   # [Q,2,3]
    quad_anim_q: jnp.ndarray = None   # [Q,2,4]
    quad_anim_s: jnp.ndarray = None   # [Q,2,3,3]
    has_fourier: bool = struct.field(pytree_node=False, default=False)
    has_sss: bool = struct.field(pytree_node=False, default=False)
    has_ptex: bool = struct.field(pytree_node=False, default=False)
    # sorted tuple of MAT_* tags present in the scene (None = unknown,
    # keep every lobe family).  The BSDF dispatch compiles ONLY the
    # families listed here — the wavefront otherwise evaluates every
    # masked lobe on every lane, real VPU cost (e.g. a 31-wide
    # fresnel_conductor for scenes with no metal)
    mat_families: tuple = struct.field(pytree_node=False, default=None)
    # sorted tuple of LIGHT_* tags present (None = unknown, compile all
    # branches).  sample_li otherwise evaluates EVERY light family per
    # lane — including texture-mapped gonio/projection lookups and env
    # CDF inversion — pure VPU+gather cost for scenes without them
    light_kinds: tuple = struct.field(pytree_node=False, default=None)
    has_mesh_lights: bool = struct.field(pytree_node=False, default=True)
    has_sphere_lights: bool = struct.field(pytree_node=False, default=True)
    # static tuple of TEX_* families bound (None = unknown, compile all)
    tex_kinds: tuple = struct.field(pytree_node=False, default=None)
    # any material with a bump map (skips 3 texture evals/bounce if not)
    has_bump: bool = struct.field(pytree_node=False, default=True)
    has_prim_media: bool = struct.field(pytree_node=False, default=False)
    has_grid_media: bool = struct.field(pytree_node=False, default=False)
    camera_medium: int = struct.field(pytree_node=False, default=-1)
    clip_quadrics: bool = struct.field(pytree_node=False, default=False)
    use_dense: bool = struct.field(pytree_node=False, default=False)
    dense_npad: int = struct.field(pytree_node=False, default=0)
    # per-scene dense-kernel chunking (0 = module defaults): large
    # scenes coarsen the chunk so the SMEM chunk list fits (pallas
    # pick_chunking)
    dense_chunk: int = struct.field(pytree_node=False, default=0)
    dense_pick: int = struct.field(pytree_node=False, default=0)
    # animated meshes: dense tables carry N_COEF time-coefficient
    # planes and the kernel Horner-combines at each ray's time
    dense_motion: bool = struct.field(pytree_node=False, default=False)
    # SAH kd-tree (Accelerator "kdtree", accel/kdtree.py): packed node
    # rows [split_bits, flags, above|off, nprims] + duplicated prim list
    # mesh motion blur: [P,12] = d0|de1|de2|pad so the leaf test forms
    # v0+t*d0, e1+t*de1, e2+t*de2 per ray (reference TransformedPrimitive
    # AnimatedTransform, primitive.cpp:73-89)
    tri_motion: Optional[jnp.ndarray] = None
    has_animated_mesh: bool = struct.field(pytree_node=False, default=False)
    kd_packed: Optional[jnp.ndarray] = None    # [N,4] f32 (ints bitcast)
    kd_prim_idx: Optional[jnp.ndarray] = None  # [M] int32
    kd_bounds: Optional[jnp.ndarray] = None    # [2,3]
    use_kd: bool = struct.field(pytree_node=False, default=False)
    kd_max_leaf: int = struct.field(pytree_node=False, default=0)


# packed material-table column layout (SceneData.mat_packed).  Integer
# ids ride as exact small floats (|v| < 2^24) and are round()ed back.
MPK_SPECTRA = ("kd", "ks", "kr", "kt", "eta_spec", "k_spec", "opacity")
_NS = spec.N_SPECTRAL_SAMPLES
MPK_ROUGH_U = 7 * _NS         # 217
MPK_ROUGH_V = MPK_ROUGH_U + 1
MPK_ETA = MPK_ROUGH_U + 2
MPK_SIGMA = MPK_ROUGH_U + 3
MPK_REMAP = MPK_ROUGH_U + 4
MPK_TYPE = MPK_ROUGH_U + 5
MPK_KD_TEX = MPK_ROUGH_U + 6
MPK_KS_TEX = MPK_ROUGH_U + 7
MPK_BUMP_TEX = MPK_ROUGH_U + 8
MPK_DISNEY = MPK_ROUGH_U + 9          # 8 wide
MPK_FOURIER = MPK_DISNEY + 8
MPK_BSSRDF = MPK_DISNEY + 9
MPK_SSS_SIGT = MPK_DISNEY + 10        # NS wide
MPK_SSS_RHO = MPK_SSS_SIGT + _NS      # NS wide
MPK_BECKMANN = MPK_SSS_RHO + _NS      # microfacet distribution selector
MPK_COLS = MPK_BECKMANN + 1


def _pack_materials(mats):
    """Pack every per-material column into one [M, MPK_COLS] f32 row."""
    rows = []
    for m in mats:
        r = m.resolved()
        rows.append(np.concatenate([
            r["kd"], r["ks"], r["kr"], r["kt"], r["eta_spec"],
            r["k_spec"], r["opacity"],
            np.asarray([m.rough_u, m.rough_v, m.eta, m.sigma,
                        float(bool(m.remap_roughness)), float(m.type),
                        float(m.kd_tex), float(m.ks_tex),
                        float(m.bump_tex)], np.float32),
            np.asarray(m.disney, np.float32),
            np.asarray([float(m.fourier_id), float(m.bssrdf_id)],
                       np.float32),
            (np.ones(spec.N_SPECTRAL_SAMPLES, np.float32)
             if m.sss_sigma_t is None
             else np.asarray(m.sss_sigma_t, np.float32)),
            (np.zeros(spec.N_SPECTRAL_SAMPLES, np.float32)
             if m.sss_rho is None
             else np.asarray(m.sss_rho, np.float32)),
            np.asarray([float(m.distribution == "beckmann")], np.float32),
        ]).astype(np.float32))
    t = np.stack(rows)
    hi = t.astype(jnp.bfloat16).astype(np.float32)
    return np.concatenate([hi, t - hi], 0)        # [2M, C]


# material type tags (reference dispatch: api.cpp:552-625)
MAT_NONE = -1          # "" interface material: pass-through boundary
MAT_MATTE = 0
MAT_PLASTIC = 1
MAT_MIRROR = 2
MAT_GLASS = 3
MAT_METAL = 4
MAT_UBER = 5
MAT_SUBSTRATE = 6
MAT_TRANSLUCENT = 7
MAT_RETRO = 8          # fork's retroreflective (materials/retroreflective.cpp)
MAT_DISNEY = 9
MAT_HAIR = 10
MAT_FOURIER = 11
MAT_MIX = 12
MAT_ROUGHGLASS = 13    # glass with nonzero roughness
MAT_SUBSURFACE = 14
MAT_KDSUBSURFACE = 15
# internal lane tag (never in mat_type): the Sw Fresnel-transmission exit
# lobe the path integrator installs at a probe ray's exit point pi
# (reference SeparableBSSRDFAdapter, bssrdf.h:221-244)
MAT_SSW = 16


@dataclass
class MaterialSpec:
    """Host-side material description fed to the builder."""
    type: int = MAT_MATTE
    kd: np.ndarray = None          # [31]
    ks: np.ndarray = None
    kr: np.ndarray = None
    kt: np.ndarray = None
    rough_u: float = 0.0
    rough_v: float = 0.0
    eta: float = 1.5
    eta_spec: np.ndarray = None
    k_spec: np.ndarray = None
    sigma: float = 0.0
    opacity: np.ndarray = None
    remap_roughness: bool = True
    kd_tex: int = -1
    ks_tex: int = -1
    bump_tex: int = -1
    mix_a: int = -1
    mix_b: int = -1
    mix_amt: float = 0.5
    disney: tuple = (0.0,) * 8
    fourier_id: int = -1
    # subsurface: diffusion-profile table idx + per-channel medium
    bssrdf_id: int = -1
    sss_sigma_t: np.ndarray = None   # [31]
    sss_rho: np.ndarray = None       # [31]
    # microfacet NDF: "ggx" (TrowbridgeReitz) or "beckmann"
    # (microfacet.h:80); scene-file extension param "string distribution"
    distribution: str = "ggx"
    name: str = ""

    def resolved(self):
        z = np.zeros(spec.N_SPECTRAL_SAMPLES, np.float32)
        o = np.ones(spec.N_SPECTRAL_SAMPLES, np.float32)
        return dict(
            kd=z if self.kd is None else np.asarray(self.kd, np.float32),
            ks=z if self.ks is None else np.asarray(self.ks, np.float32),
            kr=z if self.kr is None else np.asarray(self.kr, np.float32),
            kt=z if self.kt is None else np.asarray(self.kt, np.float32),
            eta_spec=o if self.eta_spec is None else np.asarray(self.eta_spec, np.float32),
            k_spec=z if self.k_spec is None else np.asarray(self.k_spec, np.float32),
            opacity=o if self.opacity is None else np.asarray(self.opacity, np.float32),
        )


class SceneBuilder:
    """Host-side scene assembly -> SceneData device pytree.

    The parser's WorldEnd drives this; tests drive it programmatically
    (model: reference src/tests/analytic_scenes.cpp builds scenes in memory).
    """

    def __init__(self):
        # chunked SoA storage: one entry per mesh/quadric call, concatenated
        # at build() — keeps scene assembly vectorized for large meshes
        self._chunks = []     # dicts of per-prim arrays
        self.has_animated_mesh = False
        self._n_prims = 0
        self.quads = []       # list of (o2w 4x4, w2o 4x4, params[4])
        self.materials: list[MaterialSpec] = []
        self.lights = []      # list of dicts
        self._mesh_light_tris = {}  # light idx -> list of prim indices
        self.instance_names = {}
        self.material_names = {}
        self.fourier_grids = []   # baked [NM,NM,NP,3] measured BSDFs
        self.bssrdf_tables = []   # [(key, table)] beam-diffusion profiles
        # per-primitive media (MediumInterface): homogeneous table +
        # the (inside, outside) register applied to subsequent shapes
        self.media_table = []     # list of (sigma_a[31], sigma_s[31], g)
        self.current_medium = (-1, -1)
        self.camera_medium = -1
        from pbrt_tpu.textures.textures import TextureTable
        self.textures = TextureTable()

    def add_medium_record(self, sigma_a, sigma_s, g, density=None,
                          world_to_medium=None):
        """Register a medium for per-primitive interfaces; returns its
        index.  density [nz,ny,nx] + world_to_medium [4,4] make it a
        grid medium (GridDensityMedium, grid.cpp) — bound per-prim just
        like homogeneous (VERDICT r4 item 4)."""
        self.media_table.append((
            np.asarray(sigma_a, np.float32),
            np.asarray(sigma_s, np.float32), float(g),
            None if density is None else np.asarray(density, np.float32),
            np.eye(4, dtype=np.float32) if world_to_medium is None
            else np.asarray(world_to_medium, np.float32)))
        return len(self.media_table) - 1

    def add_fourier_grid(self, grid):
        """Register a baked FourierBSDF lattice; returns its index."""
        self.fourier_grids.append(np.asarray(grid, np.float32))
        return len(self.fourier_grids) - 1

    def _has_ptex(self):
        from pbrt_tpu.textures.textures import TEX_PTEX
        return any(t == TEX_PTEX for t in self.textures.types)

    def add_bssrdf_table(self, table):
        """Register a beam-diffusion profile table (materials/bssrdf.py
        compute_beam_diffusion_bssrdf); returns its index.  Tables are
        deduped by (g, eta) — the rho/radius grids are identical across
        tables by construction."""
        key = (round(float(table["g"]), 6), round(float(table["eta"]), 6))
        for i, (k, _) in enumerate(self.bssrdf_tables):
            if k == key:
                return i
        self.bssrdf_tables.append((key, table))
        return len(self.bssrdf_tables) - 1

    @property
    def n_prims(self):
        return self._n_prims

    def _add_chunk(self, F, tri_v, tri_ns, tri_uv, ptype, quad_ref,
                   material_id, light_id, instance_id, flip, tri_dv=None):
        self._chunks.append(dict(
            tri_v=tri_v, tri_ns=tri_ns, tri_uv=tri_uv,
            tri_dv=(np.zeros((F, 3, 3)) if tri_dv is None else tri_dv),
            prim_type=np.full(F, ptype, np.int32)
            if np.isscalar(ptype) else ptype,
            quad_refs=np.full(F, quad_ref, np.int32),
            prim_material=np.full(F, material_id, np.int32),
            prim_light=np.full(F, light_id, np.int32),
            prim_instance=np.full(F, instance_id, np.int32),
            prim_flip=np.full(F, flip, bool),
            # per-mesh face index (ptex faceIndex; quads/instances keep
            # the triangle order within their Shape directive)
            prim_face=np.arange(F, dtype=np.int32),
            prim_medium_in=np.full(F, self.current_medium[0], np.int32),
            prim_medium_out=np.full(F, self.current_medium[1],
                                    np.int32)))
        first = self._n_prims
        self._n_prims += F
        return first

    # -- materials ---------------------------------------------------------
    def add_material(self, mspec: MaterialSpec) -> int:
        self.materials.append(mspec)
        mid = len(self.materials) - 1
        if mspec.name:
            self.material_names[mid] = mspec.name
        return mid

    # -- shapes ------------------------------------------------------------
    def add_triangle_mesh(self, vertices, indices, material_id,
                          normals=None, uvs=None, light_id=-1,
                          instance_id=0, flip_normal=False,
                          object_to_world: Optional[Transform] = None,
                          object_to_world1: Optional[Transform] = None):
        """vertices [V,3], indices [F,3].  Transforms verts to world.

        object_to_world1: second CTM keyframe — mesh MOTION BLUR
        (reference AnimatedTransform on TransformedPrimitive,
        primitive.cpp:73-89): vertices move linearly between the two
        keyframes' world positions over the TransformTimes window."""
        vertices = np.asarray(vertices, np.float64).reshape(-1, 3)
        indices = np.asarray(indices, np.int64).reshape(-1, 3)
        if object_to_world is not None:
            w_verts = object_to_world.apply_point(vertices)
            if normals is not None:
                # keep vertex normals UNNORMALIZED like the reference
                # (TriangleMesh stores the transformed N as-is;
                # triangle.cpp:352 interpolates the raw vectors, so
                # per-vertex magnitudes weight the interpolation —
                # loopsubdiv limit normals vary ~2x per triangle and
                # normalizing here skewed interpolated normals by
                # multiple degrees in bumpy regions)
                w_norms = object_to_world.apply_normal(
                    np.asarray(normals, np.float64).reshape(-1, 3))
            else:
                w_norms = None
            if object_to_world.swaps_handedness():
                flip_normal = not flip_normal
        else:
            w_verts = vertices
            w_norms = (np.asarray(normals, np.float64).reshape(-1, 3)
                       if normals is not None else None)
        uvs = (np.asarray(uvs, np.float64).reshape(-1, 2)
               if uvs is not None else None)
        F = len(indices)
        tri_v = w_verts[indices]                               # [F,3,3]
        if object_to_world1 is not None:
            w_verts1 = object_to_world1.apply_point(vertices)
            tri_dv = (w_verts1 - w_verts)[indices]             # [F,3,3]
            self.has_animated_mesh = True
        else:
            tri_dv = np.zeros((F, 3, 3))
        tri_ns = (w_norms[indices] if w_norms is not None
                  else np.zeros((F, 3, 3)))
        tri_uv = (uvs[indices] if uvs is not None
                  else np.broadcast_to(
                      np.array([[0., 0.], [1., 0.], [1., 1.]]),
                      (F, 3, 2)).copy())
        first = self._add_chunk(F, tri_v, tri_ns, tri_uv, PRIM_TRIANGLE,
                                -1, material_id, light_id, instance_id,
                                flip_normal, tri_dv=tri_dv)
        if light_id >= 0:
            self._mesh_light_tris.setdefault(light_id, []).extend(
                range(first, first + F))
        return first, F

    def add_quadric(self, qtype, object_to_world: Transform, params,
                    material_id, light_id=-1, instance_id=0,
                    flip_normal=False, object_to_world1=None):
        """params: (radius, zmin, zmax, phimax_radians) — type-specific.
        object_to_world1: optional second keyframe transform (two-sample
        CTM motion blur, reference api.cpp:137-166 TransformSet x2)."""
        if object_to_world.swaps_handedness():
            flip_normal = not flip_normal
        qi = len(self.quads)
        self.quads.append((object_to_world.m.astype(np.float32),
                           object_to_world.m_inv.astype(np.float32),
                           np.asarray(params, np.float32), qtype,
                           None if object_to_world1 is None
                           else object_to_world1.m.astype(np.float32)))
        first = self._add_chunk(1, np.zeros((1, 3, 3)), np.zeros((1, 3, 3)),
                                np.zeros((1, 3, 2)), qtype, qi, material_id,
                                light_id, instance_id, flip_normal)
        return first, qi

    def add_sphere(self, object_to_world, radius, material_id, light_id=-1,
                   zmin=None, zmax=None, phimax=2 * np.pi, **kw):
        zmin = -radius if zmin is None else zmin
        zmax = radius if zmax is None else zmax
        return self.add_quadric(PRIM_SPHERE, object_to_world,
                                (radius, zmin, zmax, phimax),
                                material_id, light_id, **kw)

    # -- lights ------------------------------------------------------------
    def add_light(self, **kw):
        defaults = dict(type=LIGHT_POINT,
                        L=np.zeros(spec.N_SPECTRAL_SAMPLES, np.float32),
                        pos=np.zeros(3, np.float32),
                        dir=np.array([0, 0, 1], np.float32),
                        params=np.zeros(4, np.float32),
                        quad=-1, two_sided=False)
        defaults.update(kw)
        self.lights.append(defaults)
        return len(self.lights) - 1

    def add_area_light(self, L, two_sided=False):
        """Returns light id; attach to shapes via light_id kw."""
        return self.add_light(type=LIGHT_AREA, L=np.asarray(L, np.float32),
                              two_sided=two_sided)

    def add_point_light(self, pos, I):
        return self.add_light(type=LIGHT_POINT, pos=np.asarray(pos, np.float32),
                              L=np.asarray(I, np.float32))

    def add_distant_light(self, direction, L):
        d = np.asarray(direction, np.float64)
        d = d / np.linalg.norm(d)
        return self.add_light(type=LIGHT_DISTANT, dir=d.astype(np.float32),
                              L=np.asarray(L, np.float32))

    def add_infinite_light(self, L, env_map=None, light_to_world=None):
        return self.add_light(type=LIGHT_INFINITE,
                              L=np.asarray(L, np.float32),
                              env_map=env_map,
                              light_to_world=light_to_world)

    def add_spot_light(self, pos, direction, I, cos_total, cos_falloff):
        d = np.asarray(direction, np.float64)
        d = d / np.linalg.norm(d)
        return self.add_light(type=LIGHT_SPOT, pos=np.asarray(pos, np.float32),
                              dir=d.astype(np.float32),
                              L=np.asarray(I, np.float32),
                              params=np.array([cos_total, cos_falloff, 0, 0],
                                              np.float32))

    # -- compile -----------------------------------------------------------
    def _concat(self):
        """Concatenate chunks into per-prim SoA arrays (vectorized)."""
        keys = ("tri_v", "tri_ns", "tri_uv", "tri_dv", "prim_type",
                "quad_refs",
                "prim_material", "prim_light", "prim_instance", "prim_flip",
                "prim_face", "prim_medium_in", "prim_medium_out")
        if not self._chunks:
            return {k: np.zeros((0, 3, 3) if k in ("tri_v", "tri_ns",
                                                   "tri_dv")
                                else (0, 3, 2) if k == "tri_uv" else (0,),
                                np.float64 if k.startswith("tri")
                                else np.int32 if k != "prim_flip" else bool)
                    for k in keys}
        return {k: np.concatenate([c[k] for c in self._chunks], 0)
                for k in keys}

    def _prim_bounds(self, soa):
        P = self._n_prims
        # animated meshes: bound the FULL shutter (union of both
        # keyframes — linear motion stays inside, transform.cpp:255+)
        v1 = soa["tri_v"] + soa["tri_dv"]
        lo = np.minimum(soa["tri_v"].min(1),
                        v1.min(1)).astype(np.float64)
        hi = np.maximum(soa["tri_v"].max(1),
                        v1.max(1)).astype(np.float64)
        # quadric bounds: per-quadric (few) transformed object boxes
        is_quad = soa["prim_type"] != PRIM_TRIANGLE
        for i in np.nonzero(is_quad)[0]:
            o2w, _, params, _qt = self.quads[soa["quad_refs"][i]][:4]
            r = abs(float(params[0]))
            zmin, zmax = float(params[1]), float(params[2])
            if soa["prim_type"][i] == PRIM_DISK:
                ob_lo = np.array([-r, -r, zmin - 1e-4])
                ob_hi = np.array([r, r, zmin + 1e-4])
            else:
                ob_lo = np.array([-r, -r, min(zmin, zmax)])
                ob_hi = np.array([r, r, max(zmin, zmax)])
            corners = np.array([[x, y, z]
                                for x in (ob_lo[0], ob_hi[0])
                                for y in (ob_lo[1], ob_hi[1])
                                for z in (ob_lo[2], ob_hi[2])])
            t = Transform(o2w.astype(np.float64))
            wc = t.apply_point(corners)
            lo[i], hi[i] = wc.min(0), wc.max(0)
        return lo, hi

    def build(self, max_leaf_size=4, split_method="sah",
              accel="bvh") -> SceneData:
        P = self._n_prims
        soa = self._concat()
        lo, hi = (self._prim_bounds(soa) if P else
                  (np.zeros((0, 3)), np.zeros((0, 3))))
        bvh = build_bvh(lo, hi, max_leaf_size, split_method)
        order = bvh.prim_order if P else np.zeros(0, np.int32)
        kd = None
        if accel == "kdtree" and P:
            # SAH kd-tree over the POST-REORDER prim bounds so its
            # duplicated prim list indexes the same arrays as the BVH
            from pbrt_tpu.accel.kdtree import build_kdtree
            kd = build_kdtree(lo[order], hi[order])

        def reorder(key, dtype=np.float32):
            arr = soa[key]
            if P == 0:
                shape = arr.shape[1:]
                return np.zeros((1,) + shape, dtype)
            return arr[order].astype(dtype)

        tri = reorder("tri_v")
        tri_v0 = tri[:, 0]
        tri_e1 = tri[:, 1] - tri[:, 0]
        tri_e2 = tri[:, 2] - tri[:, 0]
        prim_light_arr = reorder("prim_light", np.int32)

        # quadrics
        Q = max(len(self.quads), 1)
        q_o2w = np.tile(np.eye(4, dtype=np.float32), (Q, 1, 1))
        q_w2o = np.tile(np.eye(4, dtype=np.float32), (Q, 1, 1))
        q_par = np.zeros((Q, 4), np.float32)
        q_type = np.zeros(Q, np.int32)
        q_at = np.zeros((Q, 2, 3), np.float32)
        q_aq = np.tile(np.asarray([1, 0, 0, 0], np.float32), (Q, 2, 1))
        q_as = np.tile(np.eye(3, dtype=np.float32), (Q, 2, 1, 1))
        has_animated_quads = False
        from pbrt_tpu.core.transform import animated_pair
        for i, entry in enumerate(self.quads):
            m, mi, par, qt = entry[:4]
            m1 = entry[4] if len(entry) > 4 else None
            q_o2w[i], q_w2o[i], q_par[i], q_type[i] = m, mi, par, qt
            if m1 is not None and not np.allclose(m1, m):
                at, aq, asq = animated_pair(m, m1)
                q_at[i], q_aq[i], q_as[i] = at, aq, asq
                has_animated_quads = True
            else:
                at, aq, asq = animated_pair(m, m)
                q_at[i], q_aq[i], q_as[i] = at, aq, asq
        # prim index (post-BVH order) of each quadric
        q_prim = np.zeros(Q, np.int32)
        qref_ordered = reorder("quad_refs", np.int32)
        qmask = np.nonzero(qref_ordered >= 0)[0]
        q_prim[qref_ordered[qmask]] = qmask

        # materials
        M = max(len(self.materials), 1)
        mats = self.materials or [MaterialSpec()]
        mfields = [m.resolved() for m in mats]

        def mcol(key):
            return np.stack([f[key] for f in mfields]).astype(np.float32)

        # lights
        Lc = max(len(self.lights), 1)
        lights = self.lights or [dict(type=LIGHT_POINT,
                                      L=np.zeros(31, np.float32),
                                      pos=np.zeros(3, np.float32),
                                      dir=np.array([0, 0, 1], np.float32),
                                      params=np.zeros(4, np.float32),
                                      quad=-1, two_sided=False)]

        # map old->new prim index for mesh light triangle lists
        inv_order = np.zeros(max(P, 1), np.int64)
        if P:
            inv_order[order] = np.arange(P)
        max_lt = max([len(v) for v in self._mesh_light_tris.values()] + [1])
        lt_idx = np.full((Lc, max_lt), -1, np.int32)
        lt_cdf = np.zeros((Lc, max_lt + 1), np.float32)
        l_area = np.zeros(Lc, np.float32)
        l_quad = np.full(Lc, -1, np.int32)
        for li, l in enumerate(lights):
            if l["type"] != LIGHT_AREA:
                continue
            tris = self._mesh_light_tris.get(li, [])
            if tris:
                t_old = np.asarray(tris)
                new_ids = inv_order[t_old]
                v = soa["tri_v"][t_old]                        # [T,3,3]
                areas = 0.5 * np.linalg.norm(
                    np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=-1)
                total = areas.sum()
                lt_idx[li, :len(tris)] = new_ids
                lt_cdf[li, 1:len(tris) + 1] = np.cumsum(areas) / max(total, 1e-20)
                lt_cdf[li, len(tris) + 1:] = 1.0
                l_area[li] = total
            else:
                # sphere (or other quadric) area light: find its prim
                cand = np.nonzero((soa["prim_light"] == li)
                                  & (soa["prim_type"] == PRIM_SPHERE))[0]
                if len(cand):
                    qi = int(soa["quad_refs"][cand[0]])
                    l_quad[li] = qi
                    r = float(self.quads[qi][2][0])
                    # account for uniform scale in o2w
                    s = np.linalg.norm(self.quads[qi][0][:3, 0])
                    l_area[li] = 4 * np.pi * (r * s) ** 2

        # flattened light-tri geometry rows + sphere-light world data
        # (gather-free NEE fetch; see SceneData field comments)
        flat_lt = lt_idx.reshape(-1)
        lt_safe = np.clip(flat_lt, 0, max(P - 1, 0))
        lt_valid = (flat_lt >= 0).astype(np.float32)[:, None]
        prim_flip_ord = reorder("prim_flip", bool)
        ltp = np.zeros((Lc * max_lt, 10), np.float32)
        if P:
            ltp[:, 0:3] = tri_v0[lt_safe] * lt_valid
            ltp[:, 3:6] = tri_e1[lt_safe] * lt_valid
            ltp[:, 6:9] = tri_e2[lt_safe] * lt_valid
            ltp[:, 9] = (prim_flip_ord[lt_safe].astype(np.float32)
                         * lt_valid[:, 0])
        l_sphc = np.zeros((Lc, 3), np.float32)
        l_sphr = np.zeros(Lc, np.float32)
        for li in range(Lc):
            qi = int(l_quad[li])
            if qi >= 0:
                o2w_q = np.asarray(self.quads[qi][0], np.float32)
                s = float(np.linalg.norm(o2w_q[:3, 0]))
                l_sphc[li] = o2w_q[:3, 3]
                l_sphr[li] = float(self.quads[qi][2][0]) * s
        light_kinds = tuple(sorted({int(l["type"]) for l in self.lights}))
        has_mesh_lights = any(
            l["type"] == LIGHT_AREA and l_quad[i] < 0
            for i, l in enumerate(self.lights))
        has_sphere_lights = bool((l_quad[:len(self.lights)] >= 0).any())

        # infinite light env data (v1: constant -> 1x1 map)
        has_inf = any(l["type"] == LIGHT_INFINITE for l in lights)
        env = np.zeros((1, 1, spec.N_SPECTRAL_SAMPLES), np.float32)
        env_to_world = np.eye(4, dtype=np.float32)
        for l in lights:
            if l["type"] == LIGHT_INFINITE:
                if l.get("env_map") is not None:
                    env = np.asarray(l["env_map"], np.float32)
                else:
                    env = l["L"].reshape(1, 1, -1).astype(np.float32)
                if l.get("light_to_world") is not None:
                    env_to_world = l["light_to_world"].m.astype(np.float32)
        # env importance distribution (luminance-weighted, sin-theta factor)
        He, We = env.shape[:2]
        lum = env @ spec.CIE_Y.astype(np.float32)
        theta = (np.arange(He) + 0.5) / He * np.pi
        f2d = lum * np.sin(theta)[:, None] + 1e-12
        cond_cdf = np.zeros((He, We + 1), np.float32)
        cond_int = f2d.mean(1)
        cond_cdf[:, 1:] = np.cumsum(f2d, 1) / np.maximum(
            f2d.sum(1, keepdims=True), 1e-20)
        marg = np.zeros(He + 1, np.float32)
        marg[1:] = np.cumsum(cond_int) / max(cond_int.sum(), 1e-20)

        # fourier importance-sampling marginals for the Catmull-Rom
        # CDF-inversion sampler (materials/fourier.py bake_cr_tables;
        # reference SampleCatmullRom2D, interpolation.cpp:172-300)
        if self.fourier_grids:
            from pbrt_tpu.materials.fourier import bake_cr_tables
            _crs = [bake_cr_tables(g) for g in self.fourier_grids]
            f_a0 = np.stack([c[0] for c in _crs])
            f_lum = np.stack([c[1] for c in _crs])
        else:
            f_a0 = np.zeros((1, 2, 2), np.float32)
            f_lum = np.zeros((1, 2, 2, 2), np.float32)

        tex_imgs, tex_t, tex_p, tex_a, tex_b = self.textures.arrays()
        world_lo = lo.min(0) if P else np.zeros(3)
        world_hi = hi.max(0) if P else np.ones(3)
        world_radius = 0.5 * float(np.linalg.norm(world_hi - world_lo)) + 1e-3
        from pbrt_tpu.lights.distrib import build_distributions
        pw_cdf, pw_pmf, sp_cdf, sp_pmf = build_distributions(
            self, world_lo, world_hi, l_area, world_radius)

        f32 = jnp.float32
        # one-gather triangle layout: v0,e1,e2 + padding to 12 floats
        Pp = max(P, 1)
        tri_packed = np.zeros((Pp, 12), np.float32)
        tri_packed[:, 0:3] = tri_v0
        tri_packed[:, 3:6] = tri_e1
        tri_packed[:, 6:9] = tri_e2
        # make_hit one-gather tables
        _tns = reorder("tri_ns")
        _tuv = reorder("tri_uv")
        shade_f32 = np.zeros((Pp, 24), np.float32)
        shade_f32[:, 0:3] = tri_e1
        shade_f32[:, 3:6] = tri_e2
        shade_f32[:, 6:15] = _tns.reshape(Pp, 9)
        shade_f32[:, 15:21] = _tuv.reshape(Pp, 6)
        shade_f32[:, 21:24] = tri_v0   # lets make_hit re-derive exact t/u/v
        shade_i32 = np.zeros((Pp, 8), np.int32)
        shade_i32[:, 0] = reorder("prim_type", np.int32)
        shade_i32[:, 1] = reorder("quad_refs", np.int32)
        shade_i32[:, 2] = reorder("prim_material", np.int32)
        shade_i32[:, 3] = prim_light_arr
        shade_i32[:, 4] = reorder("prim_instance", np.int32)
        shade_i32[:, 5] = reorder("prim_flip", bool).astype(np.int32)
        shade_i32[:, 6] = reorder("prim_face", np.int32)
        shade_all = np.concatenate([shade_f32,
                                    shade_i32.view(np.float32)], 1)
        n_quadrics = len(self.quads)
        # only full spheres can skip the z/phi clip tests
        def _needs_clip(entry):
            p, t = entry[2], entry[3]
            if t != PRIM_SPHERE:
                return True
            return (float(p[3]) < 2 * np.pi - 1e-5
                    or float(p[1]) > -float(p[0]) + 1e-6
                    or float(p[2]) < float(p[0]) - 1e-6)
        clip_q = any(_needs_clip(q) for q in self.quads)
        # dense MXU intersector tables (triangles only; zero rows for
        # quadric placeholder prims never hit)
        from pbrt_tpu.ops.pallas_intersect import (
            build_dense_tables, build_dense_tables_motion, pick_chunking)
        # per-prim vertex motion [P,12]: d0 | de1 | de2 | pad, so
        # v0(t) = v0 + t*d0, e1(t) = e1 + t*de1, e2(t) = e2 + t*de2
        tri_dv = reorder("tri_dv")
        tri_motion = np.zeros((Pp, 12), np.float32)
        tri_motion[:, 0:3] = tri_dv[:, 0]
        tri_motion[:, 3:6] = tri_dv[:, 1] - tri_dv[:, 0]
        tri_motion[:, 6:9] = tri_dv[:, 2] - tri_dv[:, 0]
        # animated meshes keep the MXU path via time-polynomial tables
        # (4x the table bytes — see build_dense_tables_motion), so the
        # triangle cap is lower; beyond it the BVH fallback interpolates
        # vertices per ray in its leaf test
        dense_motion = bool(self.has_animated_mesh)
        use_dense = 0 < P <= (150_000 if dense_motion else 300_000)
        d_chunk, d_pick = pick_chunking(Pp)
        if dense_motion:
            # motion groups are N_COEF x wider per chunk; shrink pick so
            # the dot width / VMEM scratch stays in the static envelope
            d_pick = max(1, d_pick // 4)
        if not use_dense:
            # BVH-only scenes (e.g. animated meshes over the dense cap)
            # never read dense_w — store a minimal 1-chunk placeholder
            # instead of a full (4x for motion) table (ADVICE r4 low)
            dtab = build_dense_tables(np.zeros((1, 3), np.float32),
                                      np.zeros((1, 3), np.float32),
                                      np.zeros((1, 3), np.float32),
                                      chunk=d_chunk)
            dense_motion = False
        elif dense_motion:
            dtab = build_dense_tables_motion(
                tri_v0[:Pp], tri_e1[:Pp], tri_e2[:Pp], tri_motion[:Pp],
                chunk=d_chunk)
        else:
            dtab = build_dense_tables(tri_v0[:Pp], tri_e1[:Pp],
                                      tri_e2[:Pp], chunk=d_chunk)
        # per-medium grid tables, padded to common extents (homogeneous
        # rows get a 1x1x1 ones grid; never sampled because med_dims has
        # no grid flag -- callers gate on inv_maxd/is-grid masks)
        K_med = max(len(self.media_table), 1)
        dens_list = [(m[3] if len(m) > 3 and m[3] is not None
                      else np.ones((1, 1, 1), np.float32))
                     for m in self.media_table] or [np.ones((1, 1, 1),
                                                            np.float32)]
        DZ = max(d.shape[0] for d in dens_list)
        DY = max(d.shape[1] for d in dens_list)
        DX = max(d.shape[2] for d in dens_list)
        med_density_pad = np.zeros((K_med, DZ, DY, DX), np.float32)
        med_dims_arr = np.ones((K_med, 3), np.int32)
        med_w2m_arr = np.tile(np.eye(4, dtype=np.float32),
                              (K_med, 1, 1))
        med_inv_maxd_arr = np.ones(K_med, np.float32)
        med_is_grid_arr = np.zeros(K_med, bool)
        for mi, m in enumerate(self.media_table):
            med_is_grid_arr[mi] = len(m) > 3 and m[3] is not None
        for mi, d in enumerate(dens_list):
            med_density_pad[mi, :d.shape[0], :d.shape[1], :d.shape[2]] = d
            med_dims_arr[mi] = d.shape
            med_inv_maxd_arr[mi] = 1.0 / max(float(d.max()), 1e-9)
            if mi < len(self.media_table) and len(self.media_table[mi]) > 4:
                med_w2m_arr[mi] = self.media_table[mi][4]
        return SceneData(
            bvh_packed=jnp.asarray(bvh.packed),
            bvh_hit=jnp.asarray(bvh.hit_links),
            bvh_miss=jnp.asarray(bvh.miss_links),
            prim_type=jnp.asarray(reorder("prim_type", np.int32)),
            tri_packed=jnp.asarray(tri_packed),
            shade_all=jnp.asarray(shade_all),
            tri_v0=jnp.asarray(tri_v0, f32), tri_e1=jnp.asarray(tri_e1, f32),
            tri_e2=jnp.asarray(tri_e2, f32),
            tri_motion=jnp.asarray(tri_motion),
            has_animated_mesh=bool(self.has_animated_mesh),
            tri_ns=jnp.asarray(reorder("tri_ns")),
            tri_uv=jnp.asarray(reorder("tri_uv")),
            quad_idx=jnp.asarray(reorder("quad_refs", np.int32)),
            prim_material=jnp.asarray(reorder("prim_material", np.int32)),
            prim_light=jnp.asarray(prim_light_arr),
            prim_instance=jnp.asarray(reorder("prim_instance", np.int32)),
            prim_flip_normal=jnp.asarray(reorder("prim_flip", bool)),
            quad_o2w=jnp.asarray(q_o2w), quad_w2o=jnp.asarray(q_w2o),
            quad_params=jnp.asarray(q_par),
            quad_type=jnp.asarray(q_type), quad_prim=jnp.asarray(q_prim),
            quad_anim_t=jnp.asarray(q_at), quad_anim_q=jnp.asarray(q_aq),
            quad_anim_s=jnp.asarray(q_as),
            has_animated_quads=has_animated_quads,
            mat_type=jnp.asarray([m.type for m in mats], jnp.int32),
            mat_kd=jnp.asarray(mcol("kd")), mat_ks=jnp.asarray(mcol("ks")),
            mat_kr=jnp.asarray(mcol("kr")), mat_kt=jnp.asarray(mcol("kt")),
            mat_rough_u=jnp.asarray([m.rough_u for m in mats], f32),
            mat_rough_v=jnp.asarray([m.rough_v for m in mats], f32),
            mat_eta=jnp.asarray([m.eta for m in mats], f32),
            mat_eta_spec=jnp.asarray(mcol("eta_spec")),
            mat_k_spec=jnp.asarray(mcol("k_spec")),
            mat_sigma=jnp.asarray([m.sigma for m in mats], f32),
            mat_opacity=jnp.asarray(mcol("opacity")),
            mat_remap_rough=jnp.asarray([m.remap_roughness for m in mats], bool),
            mat_kd_tex=jnp.asarray([m.kd_tex for m in mats], jnp.int32),
            mat_ks_tex=jnp.asarray([m.ks_tex for m in mats], jnp.int32),
            mat_bump_tex=jnp.asarray([m.bump_tex for m in mats],
                                     jnp.int32),
            mat_mix_a=jnp.asarray([m.mix_a for m in mats], jnp.int32),
            mat_mix_b=jnp.asarray([m.mix_b for m in mats], jnp.int32),
            mat_mix_amt=jnp.asarray([m.mix_amt for m in mats], f32),
            mat_disney=jnp.asarray([m.disney for m in mats],
                                   f32).reshape(len(mats), 8),
            fourier_grid=jnp.asarray(
                np.stack(self.fourier_grids) if self.fourier_grids
                else np.zeros((1, 2, 2, 2, 3), np.float32)),
            mat_fourier_id=jnp.asarray([m.fourier_id for m in mats],
                                       jnp.int32),
            fourier_a0=jnp.asarray(f_a0),
            fourier_lum=jnp.asarray(f_lum),
            bssrdf_profile=jnp.asarray(
                np.stack([t["profile"] for _, t in self.bssrdf_tables])
                if self.bssrdf_tables else np.zeros((1, 2, 2), np.float32)),
            bssrdf_cdf=jnp.asarray(
                np.stack([t["cdf"] for _, t in self.bssrdf_tables])
                if self.bssrdf_tables else np.zeros((1, 2, 2), np.float32)),
            bssrdf_rho=jnp.asarray(
                self.bssrdf_tables[0][1]["rho"] if self.bssrdf_tables
                else np.array([0.0, 1.0]), f32),
            bssrdf_radius=jnp.asarray(
                self.bssrdf_tables[0][1]["radius"] if self.bssrdf_tables
                else np.array([0.0, 1.0]), f32),
            mat_bssrdf_id=jnp.asarray([m.bssrdf_id for m in mats],
                                      jnp.int32),
            mat_sss_sigma_t=jnp.asarray(np.stack(
                [np.ones(spec.N_SPECTRAL_SAMPLES, np.float32)
                 if m.sss_sigma_t is None
                 else np.asarray(m.sss_sigma_t, np.float32)
                 for m in mats])),
            mat_sss_rho=jnp.asarray(np.stack(
                [np.zeros(spec.N_SPECTRAL_SAMPLES, np.float32)
                 if m.sss_rho is None
                 else np.asarray(m.sss_rho, np.float32) for m in mats])),
            mat_packed=jnp.asarray(_pack_materials(mats)),
            has_sss=bool(self.bssrdf_tables),
            prim_medium_in=jnp.asarray(
                reorder("prim_medium_in", np.int32)),
            prim_medium_out=jnp.asarray(
                reorder("prim_medium_out", np.int32)),
            med_sigma_a=jnp.asarray(
                np.stack([m[0] for m in self.media_table])
                if self.media_table else np.zeros((1, 31), np.float32)),
            med_sigma_s=jnp.asarray(
                np.stack([m[1] for m in self.media_table])
                if self.media_table else np.zeros((1, 31), np.float32)),
            med_g=jnp.asarray(
                np.asarray([m[2] for m in self.media_table], np.float32)
                if self.media_table else np.zeros(1, np.float32)),
            med_density=jnp.asarray(med_density_pad),
            med_dims=jnp.asarray(med_dims_arr),
            med_w2m=jnp.asarray(med_w2m_arr),
            med_inv_maxd=jnp.asarray(med_inv_maxd_arr),
            med_is_grid=jnp.asarray(med_is_grid_arr),
            has_prim_media=bool(self.media_table),
            has_grid_media=any(m[3] is not None
                               for m in self.media_table),
            has_ptex=self._has_ptex(),
            camera_medium=int(self.camera_medium),
            has_disney=any(m.type == MAT_DISNEY for m in mats),
            has_mix=any(m.type == MAT_MIX for m in mats),
            has_hair=any(m.type == MAT_HAIR for m in mats),
            has_beckmann=any(getattr(m, "distribution", "ggx") == "beckmann"
                             for m in mats),
            # subsurface lanes mutate to MIRROR (smooth interface
            # reflection), ROUGHGLASS (uroughness>0 interface,
            # subsurface.cpp:68-87) and SSW at runtime — include those
            # families so their lobes compile
            mat_families=tuple(sorted(
                {m.type for m in mats}
                | ({MAT_MIRROR, MAT_ROUGHGLASS, MAT_SSW}
                   if any(m.type in (MAT_SUBSURFACE, MAT_KDSUBSURFACE)
                          for m in mats) else set()))),
            has_fourier=bool(self.fourier_grids),
            light_type=jnp.asarray([l["type"] for l in lights], jnp.int32),
            light_L=jnp.asarray(np.stack([l["L"] for l in lights]), f32),
            light_pos=jnp.asarray(np.stack([l["pos"] for l in lights]), f32),
            light_dir=jnp.asarray(np.stack([l["dir"] for l in lights]), f32),
            light_params=jnp.asarray(np.stack([l["params"] for l in lights]), f32),
            light_quad=jnp.asarray(l_quad),
            light_two_sided=jnp.asarray([bool(l["two_sided"]) for l in lights]),
            light_tri_idx=jnp.asarray(lt_idx),
            light_tri_cdf=jnp.asarray(lt_cdf),
            light_area=jnp.asarray(l_area),
            light_tri_packed=jnp.asarray(ltp),
            light_sph_center=jnp.asarray(l_sphc),
            light_sph_radius=jnp.asarray(l_sphr),
            light_kinds=light_kinds,
            has_mesh_lights=has_mesh_lights,
            has_sphere_lights=has_sphere_lights,
            light_power_cdf=jnp.asarray(pw_cdf),
            light_power_pmf=jnp.asarray(pw_pmf),
            light_spatial_cdf=jnp.asarray(sp_cdf),
            light_spatial_pmf=jnp.asarray(sp_pmf),
            env_map=jnp.asarray(env),
            env_cond_cdf=jnp.asarray(cond_cdf),
            env_marg_cdf=jnp.asarray(marg),
            env_cond_int=jnp.asarray(cond_int.astype(np.float32)),
            env_to_world=jnp.asarray(env_to_world),
            env_to_light=jnp.asarray(np.linalg.inv(env_to_world.astype(np.float64)).astype(np.float32)),
            tex_images=jnp.asarray(tex_imgs), tex_type=jnp.asarray(tex_t),
            tex_params=jnp.asarray(tex_p), tex_c1=jnp.asarray(tex_a),
            tex_c2=jnp.asarray(tex_b),
            tex_kinds=tuple(sorted({int(t) for t in tex_t[1:]})),
            has_bump=any(m.bump_tex >= 0 for m in mats),
            dense_w=jnp.asarray(dtab["W"]),
            dense_cb=jnp.asarray(dtab["chunk_bounds"]),
            dense_center=jnp.asarray(dtab["center"]),
            world_lo=jnp.asarray(world_lo, f32),
            world_hi=jnp.asarray(world_hi, f32),
            world_radius=jnp.asarray(world_radius, f32),
            n_lights=len(self.lights),
            n_prims=P, n_nodes=bvh.n_nodes,
            max_leaf=max_leaf_size,
            has_infinite=has_inf,
            inf_light_idx=next(
                (i for i, l in enumerate(lights)
                 if l["type"] == LIGHT_INFINITE), 0),
            n_quadrics=n_quadrics,
            clip_quadrics=bool(clip_q),
            use_dense=use_dense,
            dense_npad=dtab["n_pad"],
            dense_chunk=d_chunk,
            dense_pick=d_pick,
            dense_motion=dense_motion,
            kd_packed=(None if kd is None else jnp.asarray(
                np.concatenate([
                    kd["nodes_f"][:, None],
                    kd["nodes_i"].astype(np.int32).view(np.float32)], 1))),
            kd_prim_idx=(None if kd is None
                         else jnp.asarray(kd["prim_idx"])),
            kd_bounds=(None if kd is None else jnp.asarray(kd["bounds"])),
            use_kd=kd is not None,
            kd_max_leaf=(0 if kd is None else kd["max_leaf"]),
        )
