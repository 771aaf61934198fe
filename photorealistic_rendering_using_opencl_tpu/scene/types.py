"""Scene type system: material/geometry bitmasks and SoA device arrays.

Reproduces the semantics of the reference's type headers
(``include/Types/material.h:9-120``, ``include/Scene/geometry.h:10-28``,
``include/Types/media.h:5-11``) with a TPU-first layout: instead of an
array-of-structs ``Mesh`` with a 16-float ``joker`` slot, every per-object
attribute is its own SoA array (static shape, padded), so the whole scene
is a pytree that `jax.jit` can specialize on.  The jit specialization on
``SceneConfig`` (a hashable static dataclass) replaces the reference's
textual kernel preprocessor (``include/CL/cl_kernel.h:13-446``).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Material type bitmask (include/Types/material.h:9-31; JSON "type": n -> 1<<n)
# ---------------------------------------------------------------------------
LIGHT = 1 << 0
DIFF = 1 << 1
COND = 1 << 2
DIEL = 1 << 3
COAT = 1 << 4
VOL = 1 << 5
TRANS = 1 << 6
SPECSUB = 1 << 7
ABS_REFR = 1 << 8
ABS_REFR2 = 1 << 9
ROUGH_COND = 1 << 10
ROUGH_DIEL = 1 << 11
BURLEY = 1 << 12  # promoted from the reference's dead bxdf/old/burley_diffuse.cl

# ---------------------------------------------------------------------------
# Lobe bitmask (include/Types/material.h:35-53)
# ---------------------------------------------------------------------------
NULL_LOBE = 0
GLOSSY_REFLECTION_LOBE = 1 << 0
GLOSSY_TRANSMISSION_LOBE = 1 << 1
DIFFUSE_REFLECTION_LOBE = 1 << 2
DIFFUSE_TRANSMISSION_LOBE = 1 << 3
SPECULAR_REFLECTION_LOBE = 1 << 4
SPECULAR_TRANSMISSION_LOBE = 1 << 5
ANISOTROPIC_LOBE = 1 << 6
FORWARD_LOBE = 1 << 7

GLOSSY_LOBE = GLOSSY_REFLECTION_LOBE | GLOSSY_TRANSMISSION_LOBE
DIFFUSE_LOBE = DIFFUSE_REFLECTION_LOBE | DIFFUSE_TRANSMISSION_LOBE
SPECULAR_LOBE = SPECULAR_REFLECTION_LOBE | SPECULAR_TRANSMISSION_LOBE
TRANSMISSIVE_LOBE = (
    GLOSSY_TRANSMISSION_LOBE | DIFFUSE_TRANSMISSION_LOBE | SPECULAR_TRANSMISSION_LOBE
)
REFLECTIVE_LOBE = (
    GLOSSY_REFLECTION_LOBE | DIFFUSE_REFLECTION_LOBE | SPECULAR_REFLECTION_LOBE
)
ALL_LOBES = TRANSMISSIVE_LOBE | REFLECTIVE_LOBE | ANISOTROPIC_LOBE

# ---------------------------------------------------------------------------
# Microfacet distributions (include/Types/material.h:66-69)
# ---------------------------------------------------------------------------
BECKMANN = 1 << 0
PHONG = 1 << 1
GGX = 1 << 2

# ---------------------------------------------------------------------------
# Geometry type bitmask (include/Scene/geometry.h:10-19)
# ---------------------------------------------------------------------------
SPHERE = 1 << 0
BOX = 1 << 1
SDF = 1 << 2
QUAD = 1 << 3
TRIANGLE_MESH = 1 << 6  # our own tag for the BVH'd OBJ mesh "object"

SDF_SPHERE = 1 << 4
SDF_BOX = 1 << 5
SDF_ROUND_BOX = 1 << 6
SDF_PLANE = 1 << 7
# the reference ships sdCylinder/sdTorus distance functions (sdf.cl:21-35)
# but no type bits to dispatch them (geometry.h stops at 1<<7: dead code);
# here they are live JSON types 8/9
SDF_CYLINDER = 1 << 8
SDF_TORUS = 1 << 9

# ---------------------------------------------------------------------------
# Spectral constants (include/Types/material.h:79-91), sRGB-ish 3-sample SPDs
# ---------------------------------------------------------------------------
BK7_ETA = (1.5121, 1.5180, 1.5337)
CU_ETA = (0.29019, 0.61122, 1.2290)
CU_K = (3.5080, 2.7107, 2.1706)
AU_ETA = (0.17229, 0.36901, 1.5478)
AU_K = (4.2223, 2.4628, 1.8063)
PT_ETA = (2.6656, 2.1114, 1.6782)
PT_K = (4.7023, 3.7726, 2.7284)


@dataclasses.dataclass(frozen=True)
class SceneConfig:
    """Static (hashable) scene facts that `jax.jit` specializes on.

    The TPU analogue of the reference's scene-specializing kernel
    preprocessor (``include/CL/cl_kernel.h:115-439``): geometry/material
    presence flags gate dead code out of the compiled trace, and the bounce
    budgets become scan lengths / termination constants.
    """

    # object counts in canonical order sphere|sdf|box|quad (scene.h:22)
    n_spheres: int = 0
    n_sdfs: int = 0
    n_boxes: int = 0
    n_quads: int = 0
    n_triangles: int = 0  # OBJ mesh triangle count (0 = no mesh)
    n_bvh_nodes: int = 0
    n_lights: int = 0

    # bounce budgets (scene.h:25-30)
    max_bounces: int = 12
    max_diff_bounces: int = 4
    max_spec_bounces: int = 4
    max_trans_bounces: int = 12
    max_scattering_events: int = 12

    # raymarching (scene.h:46-48)
    marching_steps: int = 128
    shadow_marching_steps: int = 64

    # global medium (scene.h:42-44); sigma values live in SceneData so they
    # stay differentiable -- only presence/absorption-only are static.
    has_global_medium: bool = False
    medium_absorption_only: bool = False
    medium_type: str = "homogeneous"  # homogeneous | exponential
    phase_function: str = "isotropic"  # isotropic | hg | rayleigh

    # material presence mask (scene.h ACTIVE_MATS) -- used to skip whole
    # BSDF families at trace time.
    active_mats: int = 0

    # feature toggles (kernels/integrators/base.cl:4-6, main.cpp ALPHA_TESTING)
    enable_light_sampling: bool = True
    enable_volume_light_sampling: bool = True
    low_order_scattering: bool = True
    alpha_testing: bool = False
    pick_random_light: bool = False  # base.cl:9 PICK_RANDOM_LIGHT

    has_env_map: bool = False
    # env-map NEE with luminance-CDF importance sampling (new vs the
    # reference, SURVEY §7 stage 8); only meaningful when has_env_map
    enable_env_sampling: bool = True

    # mesh intersection backend: "brute" = MXU matmul testing with a
    # VMEM-resident (or HBM-streamed) coefficient table
    # (ops/mesh_brute.py), "bvh" = skip-link BVH walk (ops/intersect.py).
    mesh_accel: str = "brute"

    # sort rays by (direction octant, quantized origin cell) before the
    # brute kernel dispatch and unsort the results: block-coherent rays
    # shrink each block's relevant-tile union (random interior rays on
    # the teapot: 12.1 -> 5.3 of 13 tiles/block measured).  Exactly
    # result-invariant (relevance is conservative per lane, so a pure
    # permutation of lanes cannot change any lane's winner).  The
    # argsort+permute overhead is ~8 ms per 2N dispatch -- a wash for
    # VMEM-resident meshes, a win for HBM-streamed ones (160+ tiles),
    # so the loader enables it exactly when the mesh streams.
    mesh_sort_rays: bool = False

    # OPT-IN second brute dispatch for lanes whose kernel winner failed
    # the exact f32 re-test (_validate_winner): re-searches with the
    # false winner excluded instead of falling back past the mesh.
    # Measured (round 5): shaves the TPU-vs-CPU radiance bias 0.851% ->
    # 0.712% but costs +43% fwd+bwd (the extra relevance pass + dispatch
    # run every iteration), so it stays off by default -- most of the
    # residual is grazing false MISSES no second search can recover
    # (tools/tpu_radiance_parity.py decomposition; PERF.md round-5).
    # Only meaningful on the TPU kernel path.
    mesh_second_pass: bool = False

    # opt-in gradients w.r.t. the mesh VERTEX/NORMAL TABLES.  The
    # transpose of the per-bounce [N,9] table gathers (tri_reattach,
    # bvh_smooth_normal) is a scatter-add into the [T,9] tables every
    # bounce -- measured 2.9x the whole fwd+bwd step at 512^2 x 4 spp
    # (tools/bwd_anatomy.py, PERF.md round-4).  Off by default: ray
    # origin/direction gradients (camera, upstream-bounce materials) and
    # every other parameter still flow; only d(image)/d(vertex) is cut,
    # which the BASELINE grad surface (material/camera/envmap) never
    # demanded.  Flip on for vertex-position optimization.
    mesh_vertex_grads: bool = False

    @property
    def env_nee(self) -> bool:
        return self.has_env_map and self.enable_env_sampling

    @property
    def n_objects(self) -> int:
        return self.n_spheres + self.n_sdfs + self.n_boxes + self.n_quads

    @property
    def has_mesh(self) -> bool:
        return self.n_triangles > 0

    def has_mat(self, mask: int) -> bool:
        return bool(self.active_mats & mask)


def _f32(x) -> jnp.ndarray:
    return jnp.asarray(x, jnp.float32)


@dataclasses.dataclass
class SceneData:
    """Differentiable per-object SoA arrays (the jit-traced scene pytree).

    Objects are stored in the reference's canonical order
    [spheres | sdfs | boxes | quads] (include/Scene/scene.h:262-469) so the
    analytic-intersect loops can slice contiguous ranges.  The OBJ mesh has
    its own arrays plus a single material slot (``obj_*``), mirroring the
    reference's separate ``mBufMaterial`` (src/main.cpp:404-405).
    """

    # per-object material (N = n_objects)
    color: jnp.ndarray  # [N,3]  albedo / emission for LIGHT (material.h union)
    eta: jnp.ndarray  # [N,3]
    k: jnp.ndarray  # [N,3]
    roughness: jnp.ndarray  # [N]
    mat_type: jnp.ndarray  # [N] int32 bitmask
    lobes: jnp.ndarray  # [N] int32
    dist: jnp.ndarray  # [N] int32 microfacet distribution

    # per-object geometry
    position: jnp.ndarray  # [N,3]
    params: jnp.ndarray  # [N,4]  sphere: radius in [0]; sdf params; box half-extents
    geom_type: jnp.ndarray  # [N] int32 (includes SDF subtype bits)
    # quads keep typed fields instead of the reference's joker packing
    # (include/Scene/scene.h:443-457)
    quad_base: jnp.ndarray  # [N,3]
    quad_edge0: jnp.ndarray  # [N,3]
    quad_edge1: jnp.ndarray  # [N,3]
    quad_normal: jnp.ndarray  # [N,3]
    quad_area: jnp.ndarray  # [N]

    # light table (scene.h getLights)
    light_indices: jnp.ndarray  # [n_lights] int32

    # triangle mesh + BVH, packed device layout (scene/bvh_build.py
    # pack_for_device): one-gather node rows + one-gather leaf rows
    tri_verts: jnp.ndarray  # [L*LEAF_SIZE,3,3] leaf-major, slot-padded
    tri_normals: jnp.ndarray  # [L*LEAF_SIZE,3,3] vertex normals, same order
    bvh_nodes: jnp.ndarray  # [M,8] bmin|bmax|bitcast(miss)|bitcast(meta)
    bvh_links: jnp.ndarray  # [8*M,2] per-octant (hit, miss) threading
    leaf_verts: jnp.ndarray  # [L, LEAF_SIZE*9] leaf triangle rows
    # MXU brute-force tables (ops/mesh_brute.py), BVH-order compact layout
    bf_feat: jnp.ndarray  # [16, 4*Tpad] Moller-Trumbore coefficient table
    bf_clusters: jnp.ndarray  # [NT,8] per-tile AABBs for tile skipping
    bf_tri_verts: jnp.ndarray  # [Tpad,3,3] triangles in bf index order
    bf_tri_normals: jnp.ndarray  # [Tpad,3,3] vertex normals, same order
    obj_color: jnp.ndarray  # [3] OBJ mesh material
    obj_eta: jnp.ndarray  # [3]
    obj_k: jnp.ndarray  # [3]
    obj_roughness: jnp.ndarray  # []
    obj_mat_type: jnp.ndarray  # [] int32
    obj_lobes: jnp.ndarray  # [] int32
    obj_dist: jnp.ndarray  # [] int32

    # global medium sigmas (include/Types/media.h) -- differentiable
    medium_sigma_a: jnp.ndarray  # [3]
    medium_sigma_s: jnp.ndarray  # [3]
    medium_sigma_t: jnp.ndarray  # [3]
    phase_g: jnp.ndarray  # [] Henyey-Greenstein anisotropy (ref fixes 0.6)

    # environment map, equirect RGB (1x1 black when absent)
    env_map: jnp.ndarray  # [H,W,3]
    # luminance-CDF tables for env importance sampling (ops/envmap.py)
    env_cond_cdf: jnp.ndarray  # [H,W]
    env_marg_cdf: jnp.ndarray  # [H]
    env_weights: jnp.ndarray  # [H,W]
    env_total: jnp.ndarray  # []

    @property
    def env_dist(self) -> dict:
        return dict(cond_cdf=self.env_cond_cdf, marg_cdf=self.env_marg_cdf,
                    weights=self.env_weights, total=self.env_total)


def tree_flatten_scene(s: SceneData):
    d = dataclasses.asdict(s)
    keys = sorted(d.keys())
    return [d[k] for k in keys], keys


def tree_unflatten_scene(keys, leaves) -> SceneData:
    return SceneData(**dict(zip(keys, leaves)))


import jax.tree_util as _tu

_tu.register_pytree_node(SceneData, tree_flatten_scene, tree_unflatten_scene)


def empty_scene_data(n_objects: int = 0, n_tris: int = 0, n_nodes: int = 0,
                     n_lights: int = 0) -> SceneData:
    """Allocate zeroed SoA arrays (used by the loader and by tests)."""
    n = max(n_objects, 1)
    t = max(n_tris, 1)
    m = max(n_nodes, 1)
    nl = max(n_lights, 1)
    z3 = jnp.zeros((n, 3), jnp.float32)
    zn = jnp.zeros((n,), jnp.float32)
    zi = jnp.zeros((n,), jnp.int32)
    return SceneData(
        color=jnp.ones((n, 3), jnp.float32),
        eta=jnp.broadcast_to(_f32(AU_ETA), (n, 3)),
        k=jnp.broadcast_to(_f32(AU_K), (n, 3)),
        roughness=zn,
        mat_type=jnp.full((n,), DIFF, jnp.int32),
        lobes=jnp.full((n,), DIFFUSE_REFLECTION_LOBE, jnp.int32),
        dist=jnp.full((n,), BECKMANN, jnp.int32),
        position=z3,
        params=jnp.zeros((n, 4), jnp.float32),
        geom_type=zi,
        quad_base=z3,
        quad_edge0=z3,
        quad_edge1=z3,
        quad_normal=z3,
        quad_area=zn,
        light_indices=jnp.zeros((nl,), jnp.int32),
        tri_verts=jnp.zeros((t, 3, 3), jnp.float32),
        tri_normals=jnp.zeros((t, 3, 3), jnp.float32),
        bvh_nodes=jnp.zeros((m, 8), jnp.float32),
        bvh_links=jnp.zeros((8 * m, 2), jnp.int32),
        leaf_verts=jnp.zeros((1, 36), jnp.float32),
        bf_feat=jnp.zeros((16, 4), jnp.float32),
        # inverted bounds: no tile is ever relevant in an empty scene
        bf_clusters=jnp.tile(
            jnp.asarray([[3e38, 3e38, 3e38, -3e38, -3e38, -3e38, 0, 0]],
                        jnp.float32), (1, 1)),
        bf_tri_verts=jnp.zeros((1, 3, 3), jnp.float32),
        bf_tri_normals=jnp.zeros((1, 3, 3), jnp.float32),
        obj_color=jnp.ones((3,), jnp.float32),
        obj_eta=_f32(AU_ETA),
        obj_k=_f32(AU_K),
        obj_roughness=jnp.zeros((), jnp.float32),
        obj_mat_type=jnp.array(DIFF, jnp.int32),
        obj_lobes=jnp.array(DIFFUSE_REFLECTION_LOBE, jnp.int32),
        obj_dist=jnp.array(BECKMANN, jnp.int32),
        medium_sigma_a=jnp.zeros((3,), jnp.float32),
        medium_sigma_s=jnp.zeros((3,), jnp.float32),
        medium_sigma_t=jnp.zeros((3,), jnp.float32),
        phase_g=jnp.array(0.6, jnp.float32),
        env_map=jnp.zeros((1, 1, 3), jnp.float32),
        env_cond_cdf=jnp.ones((1, 1), jnp.float32),
        env_marg_cdf=jnp.ones((1,), jnp.float32),
        env_weights=jnp.ones((1, 1), jnp.float32),
        env_total=jnp.ones((), jnp.float32),
    )


def default_lobes_for_type(t: int) -> int:
    """Material type -> lobe mapping (include/Scene/scene.h:96-121)."""
    if t & LIGHT:
        return NULL_LOBE
    if t & (DIFF | BURLEY):
        return DIFFUSE_REFLECTION_LOBE
    if t & COND:
        return SPECULAR_REFLECTION_LOBE
    if t & (ROUGH_COND | COAT):
        return GLOSSY_REFLECTION_LOBE
    if t & DIEL:
        return SPECULAR_REFLECTION_LOBE | SPECULAR_TRANSMISSION_LOBE
    if t & ROUGH_DIEL:
        return GLOSSY_REFLECTION_LOBE | GLOSSY_TRANSMISSION_LOBE
    return DIFFUSE_REFLECTION_LOBE
