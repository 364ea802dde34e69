"""SVAO math core, shared by the SVAO pass, the VAO baseline pass and the
multi-chip band pipeline.

This is a re-derivation of the per-pixel algorithm of
reference Source/RenderPasses/SVAO/Common.slang (sphere-slab volumetric AO
with halo falloff, hemisphere clamping via the tangent-space normal, dual
VAO/HBAO kernels) as whole-array jnp ops: the SIMT per-pixel program becomes
[H,W]-shaped arithmetic with a static python loop over the NUM_DIRECTIONS
sample ring.

Key quantities (names follow the reference so the math can be audited
side-by-side):
  sphereStart/sphereEnd — entry/exit of the sampling sphere along the view
    ray through the sample (object coords, bigger = closer to camera)
    (Common.slang:361-376)
  pdf — 2*sphereHeight (VAO) or 0.9*(1-r)^1.5 (HBAO) (Common.slang:362-365)
  visibility — sphere visibility + halo falloff (Common.slang:180-196)
  requireRay — refinement classifier (Common.slang:455-461)
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..utils.sampling import AO_KERNEL_HBAO, AO_KERNEL_VAO, sample_radius_table

FLT_MAX = jnp.float32(3.402823466e38)


@dataclasses.dataclass(frozen=True)
class VAOConfig:
    """Static config = VAOData blob (VAOData.slang:33-45) + the DefineList
    (SVAO.cpp:221-238). Changing any field retraces, like requestRecompile."""
    radius: float = 0.5
    exponent: float = 2.0
    thickness: float = 0.0
    ss_radius_cutoff: float = 6.0
    ss_max_radius: float = 512.0
    num_directions: int = 8
    kernel: int = AO_KERNEL_VAO
    resolution: tuple = (0, 0)        # (W, H) of the primary depth buffer
    low_resolution: tuple = (0, 0)    # SD map res without guard (W, H)
    sd_guard: int = 0
    dual_ao: bool = False

    @property
    def inv_resolution(self):
        return (1.0 / self.resolution[0], 1.0 / self.resolution[1])

    def radii(self):
        return sample_radius_table(self.num_directions, self.kernel)


def const_radius(cfg, radius, sphere_start):
    """CONST_RADIUS macro (Common.slang:37)."""
    return (1.0 + cfg.thickness) * radius - sphere_start


def make_nonzero(v, eps):
    a = jnp.maximum(jnp.abs(v), eps)
    return jnp.where(v >= 0, a, -a)


def calc_halo_visibility(cfg, object_z, sphere_start, sphere_end, pdf, radius):
    """Common.slang:180-184."""
    return (jnp.clip((object_z - (1.0 + cfg.thickness) * radius) / sphere_start, 0.0, 1.0)
            * (sphere_start - sphere_end) / pdf)


def calc_sphere_visibility(object_z, sphere_start, sphere_end, pdf):
    """Common.slang:186-190."""
    return jnp.maximum(sphere_start - jnp.maximum(sphere_end, object_z), 0.0) / pdf


def calc_visibility(cfg, object_z, sphere_start, sphere_end, pdf, radius):
    return (calc_sphere_visibility(object_z, sphere_start, sphere_end, pdf)
            + calc_halo_visibility(cfg, object_z, sphere_start, sphere_end, pdf, radius))


def get_snapped_uv(uv, resolution):
    """Pixel-center snap (Common.slang:116-120)."""
    res = jnp.asarray(resolution, jnp.float32)
    return (jnp.floor(uv * res) + 0.5) / res


def uv_to_sd_pixel(cfg, uv):
    """Common.slang:164-168: screen uv -> SD-map texel (guard-band shifted)."""
    low = jnp.asarray(cfg.low_resolution, jnp.float32)
    p = jnp.floor(uv * low).astype(jnp.int32) + cfg.sd_guard
    hi = jnp.asarray([cfg.low_resolution[0] + 2 * cfg.sd_guard - 1,
                      cfg.low_resolution[1] + 2 * cfg.sd_guard - 1], jnp.int32)
    return jnp.clip(p, 0, hi)


def sample_depth_at(depth, uv):
    """Point sample a [H,W] texture at uv (uv already pixel-snapped)."""
    h, w = depth.shape
    x = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    return depth[y, x]


# ---------------------------------------------------------------------------
# Gather-free radial sampling (TPU-native).
#
# TPUs have no hardware gather: an arbitrary per-pixel texture fetch runs at
# ~1e8 elem/s, while a static 2D shift (slice) + select chain runs at full
# VPU/HBM speed (~200x faster, measured). The AO ring samples at
# pixel + radius_px * (sin a, cos a) with per-pixel radius; quantizing the
# radius onto a static level table turns every fetch into
# select_by_level(shift(tex, static_offset_l)) — the TPU analogue of the
# reference's snapped-to-pixel-center fetch (Common.slang:116-120), with a
# coarser snap for large radii (<= half a quantization step, the level table
# is exact for radii below SHIFT_EXACT_RADII pixels).
# ---------------------------------------------------------------------------

SHIFT_EXACT_RADII = 12     # integer-exact levels 1..12 px
SHIFT_LOG_LEVELS = 20      # log-spaced levels 12..max radius


def shift_radius_levels(max_radius: float):
    """Static table of quantized sampling radii (pixels)."""
    import numpy as np
    exact = np.arange(1, SHIFT_EXACT_RADII + 1, dtype=np.float64)
    if max_radius > SHIFT_EXACT_RADII:
        logs = np.geomspace(SHIFT_EXACT_RADII, max_radius,
                            SHIFT_LOG_LEVELS + 1)[1:]
        return np.concatenate([exact, logs]).astype(np.float32)
    return exact.astype(np.float32)


def shift_level_index(levels, r_px):
    """Per-pixel nearest-level index (levels ascending, static numpy)."""
    import numpy as np
    bounds = np.sqrt(np.asarray(levels[:-1], np.float64)
                     * np.asarray(levels[1:], np.float64))  # geometric mid
    idx = jnp.zeros(r_px.shape, jnp.int32)
    for b in bounds:
        idx = idx + (r_px > float(b)).astype(jnp.int32)
    return idx


def shift_axis_clamped(a, axis: int, off: int, lo: int | None = None,
                       hi: int | None = None):
    """out[..i..] = a[..clip(i+off, lo, hi)..] along `axis` — roll + edge fix
    (no gather). lo/hi default to the array bounds."""
    if off == 0 and lo in (None, 0) and hi in (None, a.shape[axis] - 1):
        return a
    n = a.shape[axis]
    lo = 0 if lo is None else lo
    hi = n - 1 if hi is None else hi
    out = jnp.roll(a, -off, axis=axis) if off else a
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape[:2], axis)
    if a.ndim == 3:
        idx = idx[..., None]
    hi_edge = jax.lax.index_in_dim(a, hi, axis=axis, keepdims=True)
    lo_edge = jax.lax.index_in_dim(a, lo, axis=axis, keepdims=True)
    out = jnp.where(idx + off > hi, hi_edge, out)
    out = jnp.where(idx + off < lo, lo_edge, out)
    return out


def shift2d_clamped(a, dy: int, dx: int):
    """out[y, x] = a[clamp(y+dy), clamp(x+dx)] — roll + edge-replicate fix,
    all vector ops (no gather). a: [H,W] or [H,W,C]."""

    def fix_axis(arr, d, axis):
        if d == 0:
            return arr
        n = arr.shape[axis]
        d = int(max(-(n - 1), min(n - 1, d)))
        out = jnp.roll(arr, -d, axis=axis)
        idx = jax.lax.broadcasted_iota(jnp.int32, arr.shape[:2], axis)
        edge = jax.lax.index_in_dim(arr, n - 1 if d > 0 else 0, axis=axis,
                                    keepdims=True)
        cond = (idx >= n - d) if d > 0 else (idx < -d)
        if arr.ndim == 3:
            cond = cond[..., None]
        return jnp.where(cond, edge, out)

    return fix_axis(fix_axis(a, dy, 0), dx, 1)


def radial_select(tex, lvl_idx, offsets):
    """Fetch tex at per-pixel quantized radial offset: offsets is the static
    [(dy,dx)] per level; returns where-select over shifted copies."""
    out = jnp.zeros(lvl_idx.shape + tex.shape[2:], tex.dtype)
    for l, (dy, dx) in enumerate(offsets):
        sh = shift2d_clamped(tex, dy, dx)
        m = lvl_idx == l
        out = jnp.where(m[..., None] if tex.ndim == 3 else m, sh, out)
    return out


# ---------------------------------------------------------------------------
# BasicAOData (Common.slang:271-331)
# ---------------------------------------------------------------------------

def basic_init(cam, cfg, uv, depth_lin, normal_v, noise_rot):
    """Per-pixel setup. noise_rot: [H,W] in [0,1) (the dither texture sample).
    Returns dict; 'valid' False means background / sub-pixel radius (ao=1)."""
    res = jnp.asarray(cfg.resolution, jnp.float32)

    radius_uv = cam.view_space_radius_to_uv_radius(depth_lin, cfg.radius)
    radius_px = 0.5 * (radius_uv[..., 0] * res[0] + radius_uv[..., 1] * res[1])
    radius = jnp.full_like(depth_lin, cfg.radius)
    # clamp the screen-space radius (Common.slang:291-297)
    too_big = radius_px > cfg.ss_max_radius
    radius = jnp.where(too_big, radius / radius_px * cfg.ss_max_radius, radius)
    radius_px = jnp.minimum(radius_px, cfg.ss_max_radius)
    valid = radius_px >= 0.5

    pos_v = cam.uv_to_view_space(uv, depth_lin)
    pos_len = jnp.linalg.norm(pos_v, axis=-1)
    pos_len_safe = jnp.maximum(pos_len, 1e-8)

    n_v = normal_v
    n_v = jnp.where((jnp.sum(pos_v * n_v, -1) > 0.0)[..., None], -n_v, n_v)

    rot = noise_rot * 2.0 * 3.141
    rand_dir = jnp.stack([jnp.sin(rot), jnp.cos(rot), jnp.zeros_like(rot)], -1)

    normal = -pos_v / pos_len_safe[..., None]
    bitangent = jnp.cross(normal, rand_dir)
    bitangent = bitangent / jnp.maximum(
        jnp.linalg.norm(bitangent, axis=-1, keepdims=True), 1e-8)
    tangent = jnp.cross(bitangent, normal)

    normal_o = jnp.stack([jnp.sum(n_v * tangent, -1),
                          jnp.sum(n_v * bitangent, -1),
                          jnp.sum(n_v * normal, -1)], -1)
    return dict(pos_v=pos_v, pos_len=pos_len_safe, normal=normal,
                tangent=tangent, bitangent=bitangent, normal_o=normal_o,
                normal_v=n_v, radius=radius, radius_px=radius_px, valid=valid)


def finalize(cfg, avg_ao):
    """BasicAOData::finalize (Common.slang:326-330)."""
    if cfg.kernel == AO_KERNEL_HBAO:
        avg_ao = jnp.clip(1.0 - 2.0 * avg_ao, 0.0, 1.0)
    return jnp.clip(avg_ao, 0.0, 1.0) ** cfg.exponent


# ---------------------------------------------------------------------------
# SampleAOData (Common.slang:334-506)
# ---------------------------------------------------------------------------

def dir_params(cfg):
    """Per-direction (alpha, normalized radius, stencil bit) tables — the
    `lax.scan` xs for the direction ring. alpha = i/N * 2pi
    (Common.slang:356-358)."""
    import numpy as np
    nd = cfg.num_directions
    alphas = (np.arange(nd, dtype=np.float32) / nd) * 2.0 * 3.141
    return {
        "alpha": jnp.asarray(alphas),
        "r": jnp.asarray(cfg.radii()),
        "bit": jnp.asarray((1 << np.arange(nd)).astype(np.uint32)),
    }


def sample_init(cam, cfg, basic, alpha, r_i, uv):
    """Per-direction setup; 'valid' False = below hemisphere (skip).
    alpha/r_i may be traced scalars (scanned over the direction ring)."""
    radius = r_i * basic["radius"]                      # [H,W]
    dxy = jnp.stack([radius * jnp.sin(alpha), radius * jnp.cos(alpha)], -1)

    sphere_height = jnp.sqrt(jnp.maximum(basic["radius"] ** 2 - radius ** 2, 1e-12))
    if cfg.kernel == AO_KERNEL_VAO:
        pdf = 2.0 * sphere_height
    else:
        pdf = jnp.broadcast_to(0.9 * (1.0 - r_i) ** 1.5, sphere_height.shape)

    sphere_start = sphere_height
    n_o = basic["normal_o"]
    z_int = -(dxy[..., 0] * n_o[..., 0] + dxy[..., 1] * n_o[..., 1]) \
        / make_nonzero(n_o[..., 2], 1e-4)
    sphere_end = jnp.clip(z_int, -sphere_height, sphere_height)

    valid = (sphere_start - sphere_end) / (2.0 * sphere_height) > 0.1

    sample_pos_v = (basic["pos_v"] + basic["tangent"] * dxy[..., 0:1]
                    + basic["bitangent"] * dxy[..., 1:2])
    sample_len = jnp.linalg.norm(sample_pos_v, axis=-1)
    sample_uv = cam.view_space_to_uv(sample_pos_v)
    res = jnp.asarray(cfg.resolution, jnp.float32)
    ss_radius = jnp.linalg.norm((uv - sample_uv) * res, axis=-1)

    screen_uv = jnp.clip(sample_uv, 0.0, 1.0)
    in_screen = jnp.all(sample_uv == screen_uv, axis=-1)
    raster_uv = get_snapped_uv(screen_uv, res)

    return dict(sphere_start=sphere_start, sphere_end=sphere_end, pdf=pdf,
                valid=valid, sample_uv=sample_uv, raster_uv=raster_uv,
                in_screen=in_screen, ss_radius=ss_radius,
                sample_len=jnp.maximum(sample_len, 1e-8), radius=radius)


def hbao_kernel(cfg, basic, sample_pos_v):
    """Common.slang:421-430."""
    v = sample_pos_v - basic["pos_v"]
    vv = jnp.sum(v * v, -1)
    ndotv = jnp.sum(basic["normal_v"] * v, -1) / jnp.sqrt(jnp.maximum(vv, 1e-12))
    angle = jnp.clip(ndotv - 0.1, 0.0, 1.0)
    dist = jnp.clip(1.0 - vv / (cfg.radius * cfg.radius), 0.0, 1.0)
    return angle * dist


def add_sample(cfg, basic, s, sample_pos_v, vis, oz, init: bool):
    """SampleAOData::addSample (Common.slang:463-483). Returns (vis, oz)."""
    new_oz = jnp.sum((sample_pos_v - basic["pos_v"]) * basic["normal"], -1)
    oz = new_oz if init else jnp.minimum(oz, new_oz)
    if cfg.kernel == AO_KERNEL_VAO:
        v = calc_visibility(cfg, new_oz, s["sphere_start"], s["sphere_end"],
                            s["pdf"], basic["radius"])
        vis = v if init else jnp.minimum(vis, v)
    else:
        v = jnp.clip(hbao_kernel(cfg, basic, sample_pos_v) / s["pdf"], 0.0, 1.0)
        vis = v if init else jnp.maximum(vis, v)
    return vis, oz


def reset_sample(cfg, like):
    """Common.slang:485-490."""
    vis = jnp.ones_like(like) if cfg.kernel == AO_KERNEL_VAO else jnp.zeros_like(like)
    return vis, jnp.full_like(like, FLT_MAX)


def require_ray(cfg, basic, s, oz):
    """Common.slang:455-461."""
    if cfg.kernel == AO_KERNEL_VAO:
        return ((oz > s["sphere_start"] + const_radius(cfg, basic["radius"], s["sphere_start"]))
                & (s["ss_radius"] > cfg.ss_radius_cutoff))
    return ((oz > jnp.maximum(s["sphere_start"], basic["radius"] * 0.1))
            & (s["ss_radius"] > cfg.ss_radius_cutoff))


def eval_depth_sample(cam, cfg, basic, s, depth_tex, vis, oz, init: bool):
    """evalPrimary/DualVisibility body: sample a depth texture at the snapped
    raster uv and fold into (vis, oz) (Common.slang:432-505)."""
    d = sample_depth_at(depth_tex, s["raster_uv"])
    sample_pos_v = cam.uv_to_view_space(s["raster_uv"], d)
    return add_sample(cfg, basic, s, sample_pos_v, vis, oz, init)


def is_same_pixel(cfg, uv1, uv2):
    """Common.slang:129-134."""
    inv = jnp.asarray(cfg.inv_resolution, jnp.float32)
    return jnp.all(jnp.abs(uv1 - uv2) < inv * 0.9, axis=-1)


def dither_noise_for(height, width):
    """The 4x4 wrap-sampled rotation noise (SVAO.cpp:663-688; sampled with a
    wrapping point sampler through noiseScale = resolution/4). Tiled, NOT
    fancy-indexed: a [H,W] gather from the 4x4 table costs ~20ms at 1080p on
    TPU and gets rematerialized per consumer fusion."""
    import numpy as np
    from ..utils.sampling import DITHER_4X4
    reps = (-(-height // 4), -(-width // 4))
    return jnp.asarray(np.tile(DITHER_4X4, reps)[:height, :width])
