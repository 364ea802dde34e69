"""Scene representation.

The reference keeps the scene in GPU buffers behind a ParameterBlock
(reference Source/Falcor/Scene/Scene.h:109); the TPU-native equivalent is a
flat structure-of-arrays pytree: triangle soup + material/light tables that
every kernel indexes with gathers. BLAS/TLAS (Scene.cpp:3091) becomes the
flattened triangle arrays consumed by ops/rt.py.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.math import normalize
from ..utils.structs import pytree_dataclass, replace
from .camera import Camera

# material alpha modes (ref Scene/Material/MaterialData AlphaMode)
ALPHA_MODE_OPAQUE = 0
ALPHA_MODE_MASK = 1

# light types (ref Scene/Lights LightType)
LIGHT_POINT = 0
LIGHT_DIRECTIONAL = 1


@pytree_dataclass(static=("name",))
class Scene:
    name: str
    # geometry: triangle soup [T,3,x]
    positions: jnp.ndarray      # [T,3,3] world-space vertex positions
    normals: jnp.ndarray        # [T,3,3] vertex normals (shading)
    texcoords: jnp.ndarray      # [T,3,2]
    material_id: jnp.ndarray    # [T] int32
    # per-triangle 4x4 alpha coverage bitmap over barycentric (u,v), bit
    # index = floor(u*4) + 4*floor(v*4); 0xFFFF = fully opaque. The
    # TPU-native stand-in for textured hashed-alpha testing inside traversal
    # (reference StochasticDepthMapRT.rt.slang:31-37, Common.slang:689-692):
    # baked once at scene build, tested per hit in the ray kernels.
    tri_alpha_mask: jnp.ndarray  # [T] int32
    # geometry animation (reference Scene/Animation/AnimationController.h:43):
    # node_id maps triangles to animated nodes (0 = static); prev_positions
    # holds last frame's animated vertices for true object motion vectors
    # (None for static scenes — an empty pytree leaf)
    node_id: jnp.ndarray         # [T] int32
    prev_positions: jnp.ndarray | None
    # materials SoA [M,...]
    mat_base_color: jnp.ndarray    # [M,3]
    mat_roughness: jnp.ndarray     # [M]
    mat_emissive: jnp.ndarray      # [M,3]
    mat_double_sided: jnp.ndarray  # [M] bool
    mat_alpha_mode: jnp.ndarray    # [M] int32
    mat_opacity: jnp.ndarray       # [M] constant opacity for alpha-mask materials
    # analytic lights [L,...]
    light_type: jnp.ndarray        # [L] int32
    light_pos: jnp.ndarray         # [L,3]
    light_dir: jnp.ndarray         # [L,3] (directional)
    light_intensity: jnp.ndarray   # [L,3]
    # constant environment radiance (env-map texture support comes via EnvMapPass)
    env_radiance: jnp.ndarray      # [3]
    camera: Camera

    @property
    def num_triangles(self) -> int:
        return self.positions.shape[0]

    @property
    def num_lights(self) -> int:
        return self.light_type.shape[0]

    def face_normals(self):
        """Geometric normals [T,3] (ref VertexData.faceNormalW)."""
        e1 = self.positions[:, 1] - self.positions[:, 0]
        e2 = self.positions[:, 2] - self.positions[:, 0]
        return normalize(jnp.cross(e1, e2))

    def with_camera(self, camera: Camera) -> "Scene":
        return replace(self, camera=camera)


def make_scene(name, positions, normals=None, texcoords=None, material_id=None,
               materials=None, lights=None, env_radiance=(0.0, 0.0, 0.0),
               camera: Camera | None = None, morton_sort: bool = True,
               tri_alpha_mask=None, node_id=None) -> Scene:
    """Assemble a Scene from host data (the SceneBuilder equivalent,
    reference Source/Falcor/Scene/SceneBuilder.h:54).

    morton_sort orders triangles along a Morton curve of their centroids —
    the BLAS-build analogue (Scene.cpp:3091): ray-trace chunks become
    spatially tight (enabling chunk-AABB culling) and raster binning gets
    more coherent."""
    positions = np.asarray(positions, np.float32)
    if morton_sort and positions.shape[0] > 1:
        from ..native import scenekit
        cent = positions.mean(axis=1)
        codes = scenekit.morton_codes(cent, cent.min(0), cent.max(0))
        order = np.argsort(codes, kind="stable")
        positions = positions[order]
        if normals is not None:
            normals = np.asarray(normals, np.float32)[order]
        if texcoords is not None:
            texcoords = np.asarray(texcoords, np.float32)[order]
        if material_id is not None:
            material_id = np.asarray(material_id, np.int32)[order]
        if tri_alpha_mask is not None:
            tri_alpha_mask = np.asarray(tri_alpha_mask, np.int32)[order]
        if node_id is not None:
            node_id = np.asarray(node_id, np.int32)[order]
    positions = jnp.asarray(positions, jnp.float32)
    t = positions.shape[0]
    if normals is None:
        e1 = positions[:, 1] - positions[:, 0]
        e2 = positions[:, 2] - positions[:, 0]
        fn = normalize(jnp.cross(e1, e2))
        normals = jnp.broadcast_to(fn[:, None, :], (t, 3, 3))
    else:
        normals = jnp.asarray(normals, jnp.float32)
    if texcoords is None:
        texcoords = jnp.zeros((t, 3, 2), jnp.float32)
    else:
        texcoords = jnp.asarray(texcoords, jnp.float32)
    if material_id is None:
        material_id = jnp.zeros((t,), jnp.int32)
    else:
        material_id = jnp.asarray(material_id, jnp.int32)

    materials = materials or [dict(base_color=(0.8, 0.8, 0.8))]
    m = len(materials)
    base = np.zeros((m, 3), np.float32)
    rough = np.full((m,), 0.7, np.float32)
    emis = np.zeros((m, 3), np.float32)
    dbl = np.zeros((m,), bool)
    amode = np.zeros((m,), np.int32)
    opac = np.ones((m,), np.float32)
    for i, md in enumerate(materials):
        base[i] = md.get("base_color", (0.8, 0.8, 0.8))
        rough[i] = md.get("roughness", 0.7)
        emis[i] = md.get("emissive", (0.0, 0.0, 0.0))
        dbl[i] = md.get("double_sided", False)
        amode[i] = md.get("alpha_mode", ALPHA_MODE_OPAQUE)
        opac[i] = md.get("opacity", 1.0)

    lights = lights if lights is not None else []
    nl = max(len(lights), 1)
    ltype = np.zeros((nl,), np.int32)
    lpos = np.zeros((nl, 3), np.float32)
    ldir = np.tile(np.array([0.0, -1.0, 0.0], np.float32), (nl, 1))
    lint = np.zeros((nl, 3), np.float32)
    for i, ld in enumerate(lights):
        ltype[i] = LIGHT_DIRECTIONAL if ld.get("type", "point") == "directional" else LIGHT_POINT
        lpos[i] = ld.get("position", (0.0, 0.0, 0.0))
        ldir[i] = normalize(jnp.asarray(ld.get("direction", (0.0, -1.0, 0.0)), jnp.float32))
        lint[i] = ld.get("intensity", (1.0, 1.0, 1.0))

    if camera is None:
        camera = Camera.create()

    if tri_alpha_mask is None:
        # constant-opacity materials: all-ones when opacity >= 0.5 (opaque
        # or surviving hashed-alpha), all-zeros otherwise
        keep = (amode[np.asarray(material_id)] == ALPHA_MODE_OPAQUE) \
            | (opac[np.asarray(material_id)] >= 0.5)
        tri_alpha_mask = np.where(keep, 0xFFFF, 0).astype(np.int32)
    tri_alpha_mask = jnp.asarray(tri_alpha_mask, jnp.int32)
    node_id = (jnp.zeros((t,), jnp.int32) if node_id is None
               else jnp.asarray(node_id, jnp.int32))

    return Scene(
        name=name,
        positions=positions, normals=normals, texcoords=texcoords,
        material_id=material_id, tri_alpha_mask=tri_alpha_mask,
        node_id=node_id, prev_positions=None,
        mat_base_color=jnp.asarray(base), mat_roughness=jnp.asarray(rough),
        mat_emissive=jnp.asarray(emis), mat_double_sided=jnp.asarray(dbl),
        mat_alpha_mode=jnp.asarray(amode), mat_opacity=jnp.asarray(opac),
        light_type=jnp.asarray(ltype), light_pos=jnp.asarray(lpos),
        light_dir=jnp.asarray(ldir), light_intensity=jnp.asarray(lint),
        env_radiance=jnp.asarray(env_radiance, jnp.float32),
        camera=camera,
    )
