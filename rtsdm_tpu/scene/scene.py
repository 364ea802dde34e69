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
    # linear-blend skinning (reference Scene/Animation/Skinning.slang):
    # up to 4 (joint, weight) influences per vertex; None = unskinned scene
    skin_joints: jnp.ndarray | None   # [T,3,4] int32
    skin_weights: jnp.ndarray | None  # [T,3,4] float32
    # materials SoA [M,...]
    mat_base_color: jnp.ndarray    # [M,3]
    mat_roughness: jnp.ndarray     # [M]
    # StandardMaterial metallic workflow (reference Scene/Material/
    # StandardMaterial.h:68, MaterialData.slang): metals tint specular with
    # base color and kill diffuse; IoR sets the dielectric F0
    mat_metallic: jnp.ndarray      # [M]
    mat_ior: jnp.ndarray           # [M]
    mat_emissive: jnp.ndarray      # [M,3]
    mat_double_sided: jnp.ndarray  # [M] bool
    mat_alpha_mode: jnp.ndarray    # [M] int32
    mat_opacity: jnp.ndarray       # [M] constant opacity for alpha-mask materials
    # analytic lights [L,...]
    light_type: jnp.ndarray        # [L] int32
    light_pos: jnp.ndarray         # [L,3]
    light_dir: jnp.ndarray         # [L,3] (directional)
    light_intensity: jnp.ndarray   # [L,3]
    # constant environment radiance (tint; multiplied with env_map if set)
    env_radiance: jnp.ndarray      # [3]
    # texture system (ref Scene/Material/MaterialSystem.cpp texture handles):
    # fixed-size page stack + per-material page index; None = untextured
    # scene. See scene/textures.py for the TPU-native design.
    tex_pages: jnp.ndarray | None  # [N, PAGE, PAGE, 3] float32
    mat_tex: jnp.ndarray           # [M] int32 page index, -1 = none
    # lat-long environment texture (ref Scene/Lights/EnvMap.cpp); None = const
    env_map: jnp.ndarray | None    # [He, We, 3] float32
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

    def hit_uv(self, tid, p):
        """Interpolated texcoord at world point ``p`` on triangle ``tid``
        (barycentrics recovered by the 2x2 normal equations — the ray
        kernels return (t, tid) only). Shading-pass use only."""
        safe = jnp.maximum(tid, 0)
        tri = self.positions[safe]
        e1 = tri[..., 1, :] - tri[..., 0, :]
        e2 = tri[..., 2, :] - tri[..., 0, :]
        dp = p - tri[..., 0, :]
        d11 = jnp.sum(e1 * e1, -1)
        d12 = jnp.sum(e1 * e2, -1)
        d22 = jnp.sum(e2 * e2, -1)
        r1 = jnp.sum(dp * e1, -1)
        r2 = jnp.sum(dp * e2, -1)
        det = jnp.maximum(d11 * d22 - d12 * d12, 1e-12)
        b1 = (d22 * r1 - d12 * r2) / det
        b2 = (d11 * r2 - d12 * r1) / det
        tc = self.texcoords[safe]
        return (tc[..., 0, :] * (1.0 - b1 - b2)[..., None]
                + tc[..., 1, :] * b1[..., None] + tc[..., 2, :] * b2[..., None])


def make_scene(name, positions, normals=None, texcoords=None, material_id=None,
               materials=None, lights=None, env_radiance=(0.0, 0.0, 0.0),
               camera: Camera | None = None, morton_sort: bool = True,
               tri_alpha_mask=None, node_id=None, env_map=None,
               skin_joints=None, skin_weights=None) -> Scene:
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
        if skin_joints is not None:
            skin_joints = np.asarray(skin_joints, np.int32)[order]
            skin_weights = np.asarray(skin_weights, np.float32)[order]
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
    metal = np.zeros((m,), np.float32)
    ior = np.full((m,), 1.5, np.float32)
    emis = np.zeros((m, 3), np.float32)
    dbl = np.zeros((m,), bool)
    amode = np.zeros((m,), np.int32)
    opac = np.ones((m,), np.float32)
    mtex = np.full((m,), -1, np.int32)
    tex_images = []
    for i, md in enumerate(materials):
        base[i] = md.get("base_color", (0.8, 0.8, 0.8))
        rough[i] = md.get("roughness", 0.7)
        metal[i] = md.get("metallic", 0.0)
        ior[i] = md.get("ior", 1.5)
        emis[i] = md.get("emissive", (0.0, 0.0, 0.0))
        dbl[i] = md.get("double_sided", False)
        amode[i] = md.get("alpha_mode", ALPHA_MODE_OPAQUE)
        opac[i] = md.get("opacity", 1.0)
        if md.get("texture") is not None:
            mtex[i] = len(tex_images)
            tex_images.append(md["texture"])
    from .textures import build_texture_pages
    tex_pages = build_texture_pages(tex_images)

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
    if env_map is not None and tuple(np.asarray(env_radiance)) == (0.0, 0.0, 0.0):
        env_radiance = (1.0, 1.0, 1.0)  # tint defaults to identity w/ a map

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
        skin_joints=(None if skin_joints is None
                     else jnp.asarray(skin_joints, jnp.int32)),
        skin_weights=(None if skin_weights is None
                      else jnp.asarray(skin_weights, jnp.float32)),
        mat_base_color=jnp.asarray(base), mat_roughness=jnp.asarray(rough),
        mat_metallic=jnp.asarray(metal), mat_ior=jnp.asarray(ior),
        mat_emissive=jnp.asarray(emis), mat_double_sided=jnp.asarray(dbl),
        mat_alpha_mode=jnp.asarray(amode), mat_opacity=jnp.asarray(opac),
        light_type=jnp.asarray(ltype), light_pos=jnp.asarray(lpos),
        light_dir=jnp.asarray(ldir), light_intensity=jnp.asarray(lint),
        env_radiance=jnp.asarray(env_radiance, jnp.float32),
        tex_pages=(None if tex_pages is None
                   else jnp.asarray(tex_pages, jnp.float32)),
        mat_tex=jnp.asarray(mtex),
        env_map=(None if env_map is None
                 else jnp.asarray(env_map, jnp.float32)),
        camera=camera,
    )


def add_emissive_virtual_lights(scene: Scene, max_lights: int = 4) -> Scene:
    """Emissive geometry -> analytic virtual point lights for the GRAPH
    shading paths (the reference collects emissive triangles into a light
    collection sampled via the LightBVH,
    /root/reference/Source/Falcor/Rendering/Lights/LightBVH.h:57 +
    LightCollection.cpp; the path tracer here has its own power-sampled
    emissive NEE — this is the raster-shading analogue at point-light
    granularity).

    Host-side at scene build: emissive triangles are grouped per material,
    each group split by median along its longest spatial axis until
    <= max_lights clusters exist; every cluster becomes a point light at its
    power-weighted centroid with intensity = total radiant flux / 4pi.
    RayShadow then shadows them like any analytic light. Enabled through
    the option 'Scene:emissiveVirtualLights' (core/settings.py)."""
    import numpy as np

    emis_m = np.asarray(scene.mat_emissive)
    mid = np.asarray(scene.material_id)
    pos = np.asarray(scene.positions)
    tri_emis = emis_m[mid]                                   # [T,3]
    sel = tri_emis.sum(-1) > 0.0
    if not sel.any() or max_lights <= 0:
        return scene
    e1 = pos[sel, 1] - pos[sel, 0]
    e2 = pos[sel, 2] - pos[sel, 0]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)   # [E]
    cent = pos[sel].mean(1)                                  # [E,3]
    flux = tri_emis[sel] * area[:, None] * np.pi             # [E,3] W-ish
    power = flux.sum(-1)

    clusters = [np.arange(len(area))]
    while len(clusters) < max_lights:
        # split the most powerful cluster along its longest axis
        powers = [power[c].sum() for c in clusters]
        i = int(np.argmax(powers))
        c = clusters[i]
        if len(c) < 2:
            break
        ext = cent[c].max(0) - cent[c].min(0)
        ax = int(np.argmax(ext))
        if ext[ax] < 1e-6:
            break
        med = np.median(cent[c, ax])
        lo = c[cent[c, ax] <= med]
        hi = c[cent[c, ax] > med]
        if len(lo) == 0 or len(hi) == 0:
            break
        clusters[i: i + 1] = [lo, hi]

    import jax.numpy as jnp
    from ..utils.structs import replace
    new_pos, new_int = [], []
    for c in clusters:
        w = power[c]
        if w.sum() <= 0.0:
            continue
        new_pos.append((cent[c] * w[:, None]).sum(0) / w.sum())
        new_int.append(flux[c].sum(0) / (4.0 * np.pi))
    if not new_pos:
        return scene
    n = len(new_pos)
    return replace(
        scene,
        light_type=jnp.concatenate(
            [scene.light_type, jnp.full((n,), LIGHT_POINT, jnp.int32)]),
        light_pos=jnp.concatenate(
            [scene.light_pos, jnp.asarray(np.stack(new_pos), jnp.float32)]),
        light_dir=jnp.concatenate(
            [scene.light_dir,
             jnp.tile(jnp.asarray([0.0, -1.0, 0.0]), (n, 1))]),
        light_intensity=jnp.concatenate(
            [scene.light_intensity,
             jnp.asarray(np.stack(new_int), jnp.float32)]))
