"""Multi-chip screen-tile (row-band) rendering.

The reference is strictly single-GPU (SURVEY §2.5/§5.8); the natural TPU
extension is data-parallel screen bands over a `jax.sharding.Mesh`:

  * every device rasterizes + shades its own row band (the scene is
    replicated — raster viewport origin makes the band a crop, not a resize),
  * the AO sampling radius needs depth OUTSIDE the band, so bands exchange
    halo rows with their neighbors over ICI via `lax.ppermute` — the guard
    band becomes the halo (SURVEY §5.7),
  * a global auto-exposure luminance reduction runs as a `lax.pmean` over the
    band axis (a real cross-chip collective in the hot path).

This module is exercised on a virtual CPU mesh in tests and by
__graft_entry__.dryrun_multichip.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import ao as A
from ..ops.raster import rasterize
from ..utils.math import normalize


def band_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], ("tiles",))


def _reconstruct_normals(cam, uv, z):
    p = cam.uv_to_view_space(uv, z)
    dx = jnp.gradient(p, axis=1)
    dy = jnp.gradient(p, axis=0)
    n = normalize(jnp.cross(dy, dx))
    flip = jnp.sum(n * p, axis=-1, keepdims=True) > 0
    return jnp.where(flip, -n, n)


def _band_vao(cam, cfg, depth_ext, uv_ext, y_top_global):
    """VAO over an extended band: per-sample depth fetches index the local
    extended array (global row - y_top_global)."""
    h_ext, w = depth_ext.shape
    res = jnp.asarray(cfg.resolution, jnp.float32)
    n_v = _reconstruct_normals(cam, uv_ext, depth_ext)
    # global-row dither noise
    gy = (jnp.round(uv_ext[..., 1] * res[1] - 0.5)).astype(jnp.int32) % 4
    gx = (jnp.round(uv_ext[..., 0] * res[0] - 0.5)).astype(jnp.int32) % 4
    from ..utils.sampling import DITHER_4X4
    noise = jnp.asarray(DITHER_4X4)[gy, gx]

    import numpy as np
    basic = A.basic_init(cam, cfg, uv_ext, depth_ext, n_v, noise)
    radii = cfg.radii()
    alphas = (np.arange(cfg.num_directions, dtype=np.float32)
              / cfg.num_directions) * 2.0 * 3.141

    def fetch_depth(uv):
        px = jnp.clip((uv[..., 0] * res[0]).astype(jnp.int32), 0, cfg.resolution[0] - 1)
        py_g = (uv[..., 1] * res[1]).astype(jnp.int32)
        py_l = jnp.clip(py_g - y_top_global, 0, h_ext - 1)
        return depth_ext[py_l, px]

    total = jnp.zeros_like(depth_ext)
    for i in range(cfg.num_directions):
        s = A.sample_init(cam, cfg, basic, float(alphas[i]), float(radii[i]),
                          uv_ext)
        same = A.is_same_pixel(cfg, uv_ext, s["raster_uv"])
        d = fetch_depth(s["raster_uv"])
        sp_v = cam.uv_to_view_space(s["raster_uv"], d)
        vis, _ = A.add_sample(cfg, basic, s, sp_v, None, None, init=True)
        contrib = jnp.where(same, (s["sphere_start"] - s["sphere_end"]) / s["pdf"], vis)
        total = total + jnp.where(s["valid"], contrib, 0.0)
    ao = total * 2.0 / cfg.num_directions
    ao = jnp.where(basic["valid"], ao, 1.0)
    return A.finalize(cfg, ao)


def make_band_renderer(width: int, height: int, n_devices: int,
                       halo: int = 32, radius: float = 0.2,
                       num_directions: int = 8, mesh: Mesh | None = None,
                       max_per_tile: int = 256):
    """Returns (mesh, fn) where fn(scene) -> (ao [H,W], color [H,W,3]),
    sharded P('tiles', None) over row bands."""
    mesh = mesh or band_mesh(n_devices)
    assert height % n_devices == 0, "height must divide the band axis"
    band_h = height // n_devices
    assert halo <= band_h, "halo must fit in a band"
    cfg = A.VAOConfig(radius=radius, num_directions=num_directions,
                      resolution=(width, height), low_resolution=(width, height))

    def band_fn(scene):
        cam = scene.camera
        i = jax.lax.axis_index("tiles")
        y0 = (i * band_h).astype(jnp.float32)

        vis = rasterize(cam.view_proj_no_jitter, scene.positions,
                        width=width, height=band_h,
                        origin=(jnp.float32(0.0), y0),
                        full_dim=(width, height), cull="back",
                        max_per_tile=max_per_tile)
        depth = cam.linearize_depth(vis["depth"])

        # halo exchange: neighbor ppermute of the border rows over ICI;
        # edge devices mirror-replicate their own border
        if n_devices > 1:
            fwd = [(j, j + 1) for j in range(n_devices - 1)]
            bwd = [(j + 1, j) for j in range(n_devices - 1)]
            from_above = jax.lax.ppermute(depth[-halo:], "tiles", fwd)
            from_below = jax.lax.ppermute(depth[:halo], "tiles", bwd)
            from_above = jnp.where(i == 0, depth[:halo][::-1], from_above)
            from_below = jnp.where(i == n_devices - 1, depth[-halo:][::-1],
                                   from_below)
        else:
            from_above = depth[:halo][::-1]
            from_below = depth[-halo:][::-1]
        ext = jnp.concatenate([from_above, depth, from_below], axis=0)

        # global uv rows for the extended band
        ys_g = y0 - halo + jnp.arange(band_h + 2 * halo, dtype=jnp.float32) + 0.5
        xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
        uv = jnp.stack(jnp.meshgrid(xs, ys_g / height, indexing="xy"), -1)

        ao_ext = _band_vao(cam, cfg, ext, uv, (y0 - halo).astype(jnp.int32))
        ao = ao_ext[halo:halo + band_h]

        # simple shading + global auto-exposure (cross-chip pmean collective)
        hit = vis["tri_id"] >= 0
        base = scene.mat_base_color[
            scene.material_id[jnp.maximum(vis["tri_id"], 0)]]
        color = jnp.where(hit[..., None], base, scene.env_radiance) * ao[..., None]
        mean_lum = jax.lax.pmean(jnp.mean(color), "tiles")
        color = color * (0.5 / jnp.maximum(mean_lum, 1e-4))
        return ao, color

    # check_vma off: the raster scan's carry starts device-invariant and
    # becomes tile-varying (per-band pixel coords) — semantically fine
    fn = jax.shard_map(band_fn, mesh=mesh, in_specs=(P(),),
                       out_specs=(P("tiles", None), P("tiles", None, None)),
                       check_vma=False)
    return mesh, fn
