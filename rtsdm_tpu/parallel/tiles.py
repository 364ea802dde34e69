"""Multi-chip screen-tile (row-band) rendering of the flagship pipeline.

The reference is strictly single-GPU (SURVEY §2.5/§5.8); the natural TPU
extension is data-parallel screen bands over a `jax.sharding.Mesh`:

  * every device rasterizes its own row band (the scene is replicated —
    the raster viewport origin makes the band a crop, not a resize),
  * the AO sampling radius needs depth OUTSIDE the band, so bands exchange
    halo rows with their neighbors over ICI via `lax.ppermute` — the SD-map
    guard band becomes the halo (SURVEY §5.7/§5.8),
  * each band runs the REAL SVAO + ray-traced stochastic-depth pipeline
    (phase 1 -> per-band SD ray trace over the band's guard-banded SD grid
    -> phase 2 SD resolve), everything in the gather-free shift formulation
    (passes/svao_shift.py) so the hot path stays TPU-native,
  * a global auto-exposure luminance reduction runs as a `lax.pmean` over
    the band axis (a real cross-chip collective in the hot path).

Band alignment contract (asserted): band height and halo are multiples of
4*divisor so the 4x4 dither classes and the SD texel grid stay aligned with
the full frame; ss_max_radius is capped so the interval dilation of
_intervals_to_sd_grid never reaches past the exchanged halo — band results
then match a single-device run of the same pipeline exactly.

This module is exercised on a virtual CPU mesh in tests and by
__graft_entry__.dryrun_multichip.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import ao as A
from ..ops import rt
from ..ops.raster import rasterize
from ..utils.sampling import AO_KERNEL_VAO, jitter_grid


def band_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], ("tiles",))


# ---------------------------------------------------------------------------
# gather-free helpers
# ---------------------------------------------------------------------------

def _normals_from_depth(cam, cfg, depth_ext, y_origin):
    """View-space normals from a linear-depth band via central differences —
    pure shift/slice ops (ReconstructNormals equivalent, reference
    ReconstructNormals.cpp:86-87)."""
    h, w = depth_ext.shape
    w_full, h_full = cfg.resolution
    sx = 0.5 * cam.frame_width / cam.focal_length
    sy = 0.5 * cam.frame_height / cam.focal_length
    ux = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5) / w_full
    uy = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
          + (y_origin + 0.5)) / h_full
    px = (2.0 * ux - 1.0) * sx * depth_ext
    py = (1.0 - 2.0 * uy) * sy * depth_ext
    pz = -depth_ext
    dxs = [jnp.gradient(p, axis=1) for p in (px, py, pz)]
    dys = [jnp.gradient(p, axis=0) for p in (px, py, pz)]
    nx = dys[1] * dxs[2] - dys[2] * dxs[1]
    ny = dys[2] * dxs[0] - dys[0] * dxs[2]
    nz = dys[0] * dxs[1] - dys[1] * dxs[0]
    inv = 1.0 / jnp.sqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
    nx, ny, nz = nx * inv, ny * inv, nz * inv
    flip = (px * nx + py * ny + pz * nz) > 0.0
    n = jnp.stack([nx, ny, nz], -1)
    return jnp.where(flip[..., None], -n, n)


def _bilinear_px(tex, x_px, y_px):
    """Bilinear sample of [H,W] at absolute float pixel coords. Used once per
    SD texel (low-res grid), not per screen pixel — acceptable gather."""
    h, w = tex.shape
    x = x_px - 0.5
    y = y_px - 0.5
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    a = tex[y0, x0] * (1 - fx) + tex[y0, x1] * fx
    b = tex[y1, x0] * (1 - fx) + tex[y1, x1] * fx
    return a * (1 - fy) + b * fy


def _halo_exchange(band, halo, n_devices, axis="tiles"):
    """Extend a row band with `halo` rows from each neighbor over ICI
    (lax.ppermute); screen edges clamp-replicate the border row — identical
    to the single-device edge-clamped fetch (ops/ao_shift.pad_planes)."""
    i = jax.lax.axis_index(axis)
    if n_devices > 1:
        fwd = [(j, j + 1) for j in range(n_devices - 1)]
        bwd = [(j + 1, j) for j in range(n_devices - 1)]
        from_above = jax.lax.ppermute(band[-halo:], axis, fwd)
        from_below = jax.lax.ppermute(band[:halo], axis, bwd)
    else:
        from_above = band[:halo]
        from_below = band[-halo:]
    clamp_top = jnp.broadcast_to(band[0:1], (halo,) + band.shape[1:])
    clamp_bot = jnp.broadcast_to(band[-1:], (halo,) + band.shape[1:])
    from_above = jnp.where((i == 0), clamp_top, from_above)
    from_below = jnp.where((i == n_devices - 1), clamp_bot, from_below)
    return jnp.concatenate([from_above, band, from_below], axis=0)


# ---------------------------------------------------------------------------
# per-band SD ray trace (StochasticDepthMapRT over the band's SD rows)
# ---------------------------------------------------------------------------

def _sd_trace_band(scene, lin_ext, ray_min, ray_max, *, sd_row0, guard,
                   divisor, full_dim, y_ext0, k, jitter=True,
                   use_pallas=False):
    """Trace the band's SD rows (StochasticDepthMapRT ray gen,
    Common.slangh:65-92, with global SD coordinates):

      lin_ext: band's extended linear depth (first row = global row y_ext0),
      ray_min/ray_max: [rows, sd_w] interval grid for these SD rows,
      sd_row0: global SD-core row of ray_min's first row,
      guard: SD guard texels on the x axis (y guard rows handled by the
        neighbor bands' halos).
    Returns normalized depths [rows, sd_w, k]."""
    cam = scene.camera
    rows, sd_w = ray_max.shape
    w_full, h_full = full_dim
    dim_w, dim_h = w_full // divisor, h_full // divisor

    sx = jnp.arange(sd_w, dtype=jnp.int32) - guard
    sy = jnp.arange(rows, dtype=jnp.int32) + sd_row0
    sxg, syg = jnp.meshgrid(sx, sy, indexing="xy")
    signed = jnp.stack([sxg, syg], -1).astype(jnp.float32)
    # jitter keyed on the global grid index: x index sx+guard starts at 0,
    # y index sy+guard starts at the (traced) band row — tiled table with a
    # dynamic row phase instead of a per-texel 16-entry gather
    jit = jitter_grid(rows, sd_w, jitter, x0=0, y0=sd_row0 + guard)
    origin, dirs = cam.compute_ray_pinhole(signed, (dim_w, dim_h), jitter=jit)

    cos_w = jnp.sum(dirs * (cam.camera_w / jnp.linalg.norm(cam.camera_w)), -1)
    inv_cos = 1.0 / cos_w
    tmax = cam.far_z * inv_cos

    inside = ((signed[..., 0] >= 0) & (signed[..., 0] < dim_w)
              & (signed[..., 1] >= 0) & (signed[..., 1] < dim_h))
    # first-hit depth from the band's extended linear depth (global uv ->
    # band-local pixel coords)
    x_px = (signed[..., 0] + 0.5) / dim_w * w_full
    y_px = (signed[..., 1] + 0.5) / dim_h * h_full - y_ext0
    depth = jnp.where(inside, _bilinear_px(lin_ext, x_px, y_px), 0.0)
    eps = 0.1 * cam.near_z
    tmin = depth * inv_cos + eps

    tmin = jnp.where(ray_min != 0.0, jnp.maximum(ray_min, tmin), tmin)
    tmax = jnp.where(ray_max != 0.0, jnp.minimum(ray_max, tmax), tmax)

    r = rows * sd_w
    if use_pallas:
        from ..ops import rt_pallas as rp
        v0t, e1t, e2t, flags = rp.prep_triangles(scene, True)
        packed = rp.sd_trace_pallas(
            v0t, e1t, e2t, flags, jnp.broadcast_to(origin, (r, 3)),
            dirs.reshape(-1, 3), tmin.reshape(-1), tmax.reshape(-1),
            cos_w.reshape(-1), cam.near_z, cam.far_z, num_samples=k,
            cull_back=True)
        depths = rp.decode_packed(packed, cam.near_z, cam.far_z, True)
    else:
        depths = rt.sd_trace(
            scene, jnp.broadcast_to(origin, (r, 3)), dirs.reshape(-1, 3),
            tmin.reshape(-1), tmax.reshape(-1), num_samples=k,
            normalize=True, cull=rt.CULL_BACK, alpha_test=True)
    return depths.reshape(rows, sd_w, k)


# ---------------------------------------------------------------------------
# the flagship band renderer
# ---------------------------------------------------------------------------

def make_svao_rt_band_renderer(width: int, height: int, n_devices: int,
                               *, divisor: int = 4, sd_guard: int = 8,
                               radius: float = 0.2, num_directions: int = 8,
                               stoch_samples: int = 4,
                               ss_max_radius: float = 4.0,
                               mesh: Mesh | None = None,
                               max_per_tile: int = 256,
                               trace_sd: bool = True,
                               use_pallas: bool = False,
                               shade: bool = True):
    """Returns (mesh, fn): fn(scene) -> (ao [H,W], color [H,W,3]) with the
    full SVAO + Ray-SD pipeline sharded P('tiles', None) over row bands.

    The exchanged pixel halo is sized so band results equal a single-device
    run EXACTLY — every influence chain stays band-local:
      consumer fetch (<= ss_max_radius px)
      + interval dilation reach (2^(L+1) SD texels, L = dilation level cap)
      + the contributing pixel's own depth fetch (<= ss_max_radius)
      + 1px normal-gradient support, rounded up to the alignment unit."""
    mesh = mesh or band_mesh(n_devices)
    assert height % n_devices == 0, "height must divide the band axis"
    band_h = height // n_devices
    align = max(4 * divisor, 16)

    lvl = max(int(math.ceil(math.log2(max(ss_max_radius / divisor, 1.0)))), 0)
    dilate_px = (1 << (lvl + 1)) * divisor
    need = int(math.ceil(2 * ss_max_radius + dilate_px + 2))
    halo = -(-need // align) * align
    assert band_h % align == 0, \
        f"band height {band_h} must be a multiple of {align}"
    assert halo <= band_h, \
        f"halo {halo} must fit in the neighbor band (band_h={band_h})"
    assert width % divisor == 0 and height % divisor == 0

    ext_h = band_h + 2 * halo
    cfg = A.VAOConfig(radius=radius, num_directions=num_directions,
                      kernel=AO_KERNEL_VAO,
                      resolution=(width, height),
                      low_resolution=(width // divisor, height // divisor),
                      sd_guard=sd_guard, ss_max_radius=float(ss_max_radius))
    sd_w = width // divisor + 2 * sd_guard
    ext_sd_h = ext_h // divisor + 2 * sd_guard

    from ..passes.svao import DEPTH_MODE_SINGLE, DEPTH_MODE_STOCHASTIC
    from ..passes.svao_shift import svao_phase1_shift, svao_phase2_shift
    secondary = DEPTH_MODE_STOCHASTIC if trace_sd else DEPTH_MODE_SINGLE

    def band_fn(scene):
        cam = scene.camera
        i = jax.lax.axis_index("tiles")
        y0 = i * band_h

        vis = rasterize(cam.view_proj_no_jitter, scene.positions,
                        width=width, height=band_h,
                        origin=(jnp.float32(0.0), y0.astype(jnp.float32)),
                        full_dim=(width, height), cull="back",
                        max_per_tile=max_per_tile)
        depth = cam.linearize_depth(vis["depth"])

        ext = _halo_exchange(depth, halo, n_devices)          # [ext_h, W]
        # y_origin is device-varying; the shift machinery only needs its
        # residues mod the align unit, which are 0 by the asserts above —
        # pass 0 for trace purposes and add the true offset where global
        # coordinates matter (uv rows, interior mask, SD row ids)
        y_ext0 = y0 - halo

        normal_v = _normals_from_depth(cam, cfg, ext, y_ext0)
        out = svao_phase1_shift(cam, cfg, ext, ext, normal_v, 0,
                                DEPTH_MODE_SINGLE, secondary,
                                y_origin=y_ext0, sd_shape=(ext_sd_h, sd_w))
        ao_raw, stencil = out["ao_raw"], out["stencil"]

        if trace_sd:
            g = sd_guard
            # middle rows = SD rows whose consumers are this band's core
            # pixels; outer g rows belong to the neighbors (padding only)
            sd_mid = _sd_trace_band(
                scene, ext, out["ray_min"][g:-g], out["ray_max"][g:-g],
                sd_row0=y_ext0 // divisor, guard=g, divisor=divisor,
                full_dim=(width, height), y_ext0=y_ext0, k=stoch_samples,
                use_pallas=use_pallas)
            pad = jnp.ones((g, sd_w, stoch_samples))
            sd_map = jnp.concatenate([pad, sd_mid, pad], axis=0)
            delta = svao_phase2_shift(cam, cfg, ext, ext, normal_v, stencil,
                                      sd_map, DEPTH_MODE_SINGLE,
                                      divisor=divisor, y_origin=y_ext0)
            refined = stencil != 0
            ao_ext = jnp.where(refined, A.finalize(cfg, ao_raw + delta),
                               A.finalize(cfg, ao_raw))
        else:
            ao_ext = A.finalize(cfg, ao_raw)
        ao = ao_ext[halo:halo + band_h]

        if not shade:
            return ao, jnp.zeros(ao.shape + (3,))
        # flat shading + global auto-exposure (cross-chip pmean collective)
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


def make_band_renderer(width: int, height: int, n_devices: int,
                       radius: float = 0.2,
                       num_directions: int = 8, mesh: Mesh | None = None,
                       max_per_tile: int = 256):
    """Screen-space-only band renderer (no SD trace) — the lightweight
    variant kept for the pure-VAO demo path. Same sharded core as
    make_svao_rt_band_renderer with the SD stage disabled. The halo is
    derived internally from the AO sampling reach (a caller-supplied halo
    was silently ignored before; the parameter is gone)."""
    return make_svao_rt_band_renderer(
        width, height, n_devices, divisor=4, sd_guard=4,
        radius=radius, num_directions=num_directions, mesh=mesh,
        max_per_tile=max_per_tile, trace_sd=False)
