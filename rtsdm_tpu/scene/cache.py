"""SceneCache: binary scene serialization keyed by content hash
(reference Scene/SceneCache.h:54 — fast reload of imported scenes)."""
from __future__ import annotations

import hashlib
import os

import numpy as np

from .camera import Camera
from .scene import Scene, make_scene

CACHE_DIR = os.path.expanduser("~/.cache/rtsdm_scenes")


def _key(path: str) -> str:
    st = os.stat(path)
    h = hashlib.sha1(f"{os.path.abspath(path)}:{st.st_size}:{st.st_mtime_ns}"
                     .encode()).hexdigest()
    return os.path.join(CACHE_DIR, h + ".npz")


def save(scene: Scene, cache_path: str):
    os.makedirs(os.path.dirname(cache_path), exist_ok=True)
    cam = scene.camera
    np.savez_compressed(
        cache_path, name=scene.name,
        positions=np.asarray(scene.positions),
        normals=np.asarray(scene.normals),
        texcoords=np.asarray(scene.texcoords),
        material_id=np.asarray(scene.material_id),
        tri_alpha_mask=np.asarray(scene.tri_alpha_mask),
        node_id=np.asarray(scene.node_id),
        mat_base_color=np.asarray(scene.mat_base_color),
        mat_roughness=np.asarray(scene.mat_roughness),
        mat_metallic=np.asarray(scene.mat_metallic),
        mat_ior=np.asarray(scene.mat_ior),
        mat_emissive=np.asarray(scene.mat_emissive),
        mat_double_sided=np.asarray(scene.mat_double_sided),
        mat_alpha_mode=np.asarray(scene.mat_alpha_mode),
        mat_opacity=np.asarray(scene.mat_opacity),
        light_type=np.asarray(scene.light_type),
        light_pos=np.asarray(scene.light_pos),
        light_dir=np.asarray(scene.light_dir),
        light_intensity=np.asarray(scene.light_intensity),
        env_radiance=np.asarray(scene.env_radiance),
        mat_tex=np.asarray(scene.mat_tex),
        **({} if scene.tex_pages is None
           else dict(tex_pages=np.asarray(scene.tex_pages))),
        **({} if scene.env_map is None
           else dict(env_map=np.asarray(scene.env_map))),
        **({} if scene.skin_joints is None
           else dict(skin_joints=np.asarray(scene.skin_joints),
                     skin_weights=np.asarray(scene.skin_weights))),
        cam_pos=np.asarray(cam.pos_w), cam_target=np.asarray(cam.target),
        cam_up=np.asarray(cam.up), cam_focal=np.asarray(cam.focal_length),
        cam_aspect=np.asarray(cam.aspect), cam_near=np.asarray(cam.near_z),
        cam_far=np.asarray(cam.far_z))


def load(cache_path: str) -> Scene:
    z = np.load(cache_path, allow_pickle=False)
    cam = Camera.create(position=z["cam_pos"], target=z["cam_target"],
                        up=z["cam_up"], focal_length=float(z["cam_focal"]),
                        aspect=float(z["cam_aspect"]),
                        near_z=float(z["cam_near"]), far_z=float(z["cam_far"]))
    materials = [dict(base_color=tuple(z["mat_base_color"][i]),
                      roughness=float(z["mat_roughness"][i]),
                      metallic=(float(z["mat_metallic"][i])
                                if "mat_metallic" in z.files else 0.0),
                      ior=(float(z["mat_ior"][i])
                           if "mat_ior" in z.files else 1.5),
                      emissive=tuple(z["mat_emissive"][i]),
                      double_sided=bool(z["mat_double_sided"][i]),
                      alpha_mode=int(z["mat_alpha_mode"][i]),
                      opacity=float(z["mat_opacity"][i]))
                 for i in range(len(z["mat_base_color"]))]
    lights = [dict(type="directional" if z["light_type"][i] == 1 else "point",
                   position=tuple(z["light_pos"][i]),
                   direction=tuple(z["light_dir"][i]),
                   intensity=tuple(z["light_intensity"][i]))
              for i in range(len(z["light_type"]))]
    scene = make_scene(str(z["name"]), z["positions"], normals=z["normals"],
                       texcoords=z["texcoords"], material_id=z["material_id"],
                       materials=materials, lights=lights,
                       env_radiance=tuple(z["env_radiance"]), camera=cam,
                       tri_alpha_mask=(z["tri_alpha_mask"]
                                       if "tri_alpha_mask" in z.files else None),
                       node_id=(z["node_id"] if "node_id" in z.files else None),
                       env_map=(z["env_map"] if "env_map" in z.files else None),
                       skin_joints=(z["skin_joints"]
                                    if "skin_joints" in z.files else None),
                       skin_weights=(z["skin_weights"]
                                     if "skin_weights" in z.files else None),
                       # positions were morton-sorted at build; keep order so
                       # the per-triangle arrays stay aligned
                       morton_sort=False)
    if "tex_pages" in z.files:  # baked pages round-trip directly
        from ..utils.structs import replace
        import jax.numpy as jnp
        scene = replace(scene, tex_pages=jnp.asarray(z["tex_pages"]),
                        mat_tex=jnp.asarray(z["mat_tex"], jnp.int32))
    return scene


def load_cached(path: str, importer) -> Scene:
    """Import-through-cache (SceneCache usage in SceneBuilder)."""
    key = _key(path)
    if os.path.exists(key):
        return load(key)
    scene = importer(path)
    save(scene, key)
    return scene
