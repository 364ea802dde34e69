"""SVAO phases in gather-free shift mode (see ops/ao_shift.py for the why).

Fully SCALARIZED (structure-of-planes): every 2/3-vector is kept as separate
[H,W] planes. Stacked [H,W,2/3] tensors in broadcast chains measurably poison
XLA/TPU fusions (+200ms per occurrence at 1080p, measured) — the camera math
from ops/ao.py is therefore re-expressed componentwise here.

Semantics match passes/svao.py's gather phases except the depth/SD fetch
position is quantized onto the static shift tables; all visibility math uses
the quantized effective radius, so the estimator stays self-consistent.
Reference: SVAORaster.ps.slang (phase 1), Common.slang calcAO2 (phase 2).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ao as A
from ..ops import ao_shift as S
from ..utils.sampling import AO_KERNEL_VAO


def _cam_consts(cam, cfg):
    """Static-ish scalars of the pinhole camera (SVAO/Common.slang:139-153)."""
    w, h = cfg.resolution
    sx = 0.5 * cam.frame_width / cam.focal_length     # imageScale.x
    sy = 0.5 * cam.frame_height / cam.focal_length
    # GetAORadiusInPixels (Common.slang:255-261) collapses to kpx * r / z
    kpx = 0.5 * (w / sx + h / sy) * 0.5
    return sx, sy, kpx


def _uv_to_view(sx, sy, ux, uy, z):
    """UVToViewSpace componentwise (Common.slang:139-144): returns planes
    (vx, vy, vz) with vz = -z."""
    vx = (2.0 * ux - 1.0) * sx * z
    vy = (1.0 - 2.0 * uy) * sy * z
    return vx, vy, -z


def _sample_coeffs(b, ux, uy):
    """Depth-affine sample-point coefficients at sample uv (ux, uy).

    The view-space point is v(z) = (cx z, cy z, -z) with cx/cy per-pixel
    constants, so everything the kernels need is affine/quadratic in the
    fetched depth z — evaluating k depth layers then costs ~2 FLOPs each
    instead of a full UVToViewSpace + dot-products chain:

      oz      = (v - p) . a      = z * oz_a + pos_len       (a = -p/|p|)
      |v - p|^2                  = z^2 * qa + z * qb + |p|^2
      n . (v - p)                = z * na - n . p

    Returns dict(oz_a, qa, qb, na, np_).
    """
    cx = (2.0 * ux - 1.0) * b["sx"]
    cy = (1.0 - 2.0 * uy) * b["sy"]
    ax, ay, az = b["a"]
    nx, ny, nz = b["n"]
    px, py, pz = b["px"], b["py"], b["pz"]
    oz_a = cx * ax + cy * ay - az
    qa = cx * cx + cy * cy + 1.0
    qb = -2.0 * (cx * px + cy * py - pz)
    na = nx * cx + ny * cy - nz
    np_ = nx * px + ny * py + nz * pz
    return dict(oz_a=oz_a, qa=qa, qb=qb, na=na, np_=np_)


def _eval_depth_affine(cfg, b, co, z, s_start, s_end, pdf):
    """(vis, oz) at fetched depth plane ``z`` via the affine coefficients
    (exact rewrite of UVToViewSpace + calcVisibility/HBAOKernel)."""
    oz = z * co["oz_a"] + b["pos_len"]
    if cfg.kernel == AO_KERNEL_VAO:
        vis = _visibility_vao(cfg, oz, s_start, s_end, pdf, b["radius"])
    else:
        vv = jnp.maximum((z * co["qa"] + co["qb"]) * z
                         + b["pos_len"] * b["pos_len"], 1e-12)
        ndotv = (z * co["na"] - co["np_"]) / jnp.sqrt(vv)
        angle = jnp.clip(ndotv - 0.1, 0.0, 1.0)
        dist = jnp.clip(1.0 - vv / (cfg.radius * cfg.radius), 0.0, 1.0)
        vis = jnp.clip(angle * dist / pdf, 0.0, 1.0)
    return vis, oz


def _prep_planar(cam, cfg, depth, normal_v, y_origin: int = 0):
    """basic_init (Common.slang:271-324), planar.

    y_origin: global screen row of the array's first row — nonzero when
    `depth` is a row band of a larger frame (multi-chip tiles); must be a
    multiple of 4 so the dither classes stay aligned with the full frame.
    UVs are normalized by cfg.resolution (the FULL frame), not the array.
    y_origin may be a traced value (shard_map band index) — alignment is
    then the caller's contract (parallel/tiles.py asserts it statically)."""
    if isinstance(y_origin, int):
        assert y_origin % 4 == 0, "band origin must keep 4x4 dither alignment"
    h, w = depth.shape
    w_full, h_full = cfg.resolution
    hp, wp = h + ((-h) % 4), w + ((-w) % 4)
    if (hp, wp) != (h, w):
        depth = jnp.pad(depth, ((0, hp - h), (0, wp - w)), mode="edge")
        normal_v = jnp.pad(normal_v, ((0, hp - h), (0, wp - w), (0, 0)),
                           mode="edge")
    sx, sy, kpx = _cam_consts(cam, cfg)
    ux = (jax.lax.broadcasted_iota(jnp.float32, (hp, wp), 1) + 0.5) / w_full
    uy = (jax.lax.broadcasted_iota(jnp.float32, (hp, wp), 0)
          + (y_origin + 0.5)) / h_full
    noise = A.dither_noise_for(hp, wp)

    radius_px = kpx * cfg.radius / jnp.maximum(depth, 1e-6)
    radius = jnp.full_like(depth, cfg.radius)
    too_big = radius_px > cfg.ss_max_radius
    radius = jnp.where(too_big, radius / radius_px * cfg.ss_max_radius, radius)
    radius_px = jnp.minimum(radius_px, cfg.ss_max_radius)
    valid = radius_px >= 0.5

    px, py, pz = _uv_to_view(sx, sy, ux, uy, depth)
    pos_len = jnp.sqrt(jnp.maximum(px * px + py * py + pz * pz, 1e-12))

    nx, ny, nz = normal_v[..., 0], normal_v[..., 1], normal_v[..., 2]
    flip = (px * nx + py * ny + pz * nz) > 0.0
    nx = jnp.where(flip, -nx, nx)
    ny = jnp.where(flip, -ny, ny)
    nz = jnp.where(flip, -nz, nz)

    rot = noise * 2.0 * 3.141
    rx, ry = jnp.sin(rot), jnp.cos(rot)

    # frame: normal = -pos/len; bitangent = norm(cross(normal, (rx,ry,0)));
    # tangent = cross(bitangent, normal)  (Common.slang:314-317)
    inv_l = 1.0 / pos_len
    ax, ay, az = -px * inv_l, -py * inv_l, -pz * inv_l
    bx = ay * 0.0 - az * ry
    by = az * rx - ax * 0.0
    bz = ax * ry - ay * rx
    bl = jnp.sqrt(jnp.maximum(bx * bx + by * by + bz * bz, 1e-12))
    bx, by, bz = bx / bl, by / bl, bz / bl
    tx = by * az - bz * ay
    ty = bz * ax - bx * az
    tz = bx * ay - by * ax

    no_x = nx * tx + ny * ty + nz * tz
    no_y = nx * bx + ny * by + nz * bz
    no_z = nx * ax + ny * ay + nz * az

    return dict(depth=depth, ux=ux, uy=uy, radius=radius, radius_px=radius_px,
                valid=valid, px=px, py=py, pz=pz, pos_len=pos_len,
                n=(nx, ny, nz), a=(ax, ay, az), no=(no_x, no_y, no_z),
                sx=sx, sy=sy, hp=hp, wp=wp, y_origin=y_origin)


def _visibility_vao(cfg, oz, s_start, s_end, pdf, radius):
    """calcVisibility (Common.slang:180-196)."""
    sphere = jnp.maximum(s_start - jnp.maximum(s_end, oz), 0.0) / pdf
    halo = (jnp.clip((oz - (1.0 + cfg.thickness) * radius) / s_start, 0.0, 1.0)
            * (s_start - s_end) / pdf)
    return sphere + halo


def _hbao_vis(cfg, b, sx_, sy_, sz_, pdf):
    """HBAOKernel (Common.slang:421-430), planar."""
    vx, vy, vz = sx_ - b["px"], sy_ - b["py"], sz_ - b["pz"]
    vv = jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-12)
    nx, ny, nz = b["n"]
    ndotv = (nx * vx + ny * vy + nz * vz) / jnp.sqrt(vv)
    angle = jnp.clip(ndotv - 0.1, 0.0, 1.0)
    dist = jnp.clip(1.0 - vv / (cfg.radius * cfg.radius), 0.0, 1.0)
    return jnp.clip(angle * dist / pdf, 0.0, 1.0)


FUSED_FETCH = "auto"  # "auto" (Pallas fused fetch on TPU) | "on" | "off"


def _use_fused_fetch():
    if FUSED_FETCH == "auto":
        return jax.devices()[0].platform not in ("cpu",)
    return FUSED_FETCH == "on"


def _sample_dir(cam, cfg, b, depth_pp, pad, offs_i, levels, r_frac, alpha,
                depth2_pp=None, fetched_pre=None, fetched2_pre=None):
    """One ring direction: quantized fetch + sphere-slab sample data.
    Returns dict of planes. fetched_pre/fetched2_pre: [16,qh,qw] planes from
    the fused all-direction Pallas fetch (ops/fetch_pallas.py) — bit-identical
    to the per-direction scan below, HBM traffic /(nd*L)."""
    hp, wp = b["hp"], b["wp"]
    qh, qw = hp // 4, wp // 4
    w, h = cfg.resolution

    m_i = b["radius_px"] * r_frac
    lvl = A.shift_level_index(levels, m_i)
    lvl_p = S.deinterleave(lvl)
    if fetched_pre is not None:
        fetched = S.interleave(fetched_pre, hp, wp)
    else:
        fetched = S.interleave(S.fetch_direction(depth_pp, pad, lvl_p, offs_i,
                                                 qh, qw), hp, wp)
    r_eff = S.level_radius(levels, lvl)
    ux_m, uy_m = S.class_dir_maps(cfg, alpha, hp, wp)
    off_x = jnp.rint(r_eff * ux_m)
    off_y = jnp.rint(r_eff * uy_m)

    r_disc = jnp.minimum(r_eff / jnp.maximum(b["radius_px"], 1e-4), 0.999) \
        * b["radius"]
    same_pix = (off_y == 0.0) & (off_x == 0.0)
    xg = jax.lax.broadcasted_iota(jnp.float32, (hp, wp), 1)
    yg = jax.lax.broadcasted_iota(jnp.float32, (hp, wp), 0) + b["y_origin"]
    sxp = xg + off_x
    syp = yg + off_y
    in_screen = (sxp >= 0) & (sxp < w) & (syp >= 0) & (syp < h)
    uqx = (jnp.clip(sxp, 0, w - 1) + 0.5) / w
    uqy = (jnp.clip(syp, 0, h - 1) + 0.5) / h

    sphere_h = jnp.sqrt(jnp.maximum(b["radius"] ** 2 - r_disc ** 2, 1e-12))
    if cfg.kernel == AO_KERNEL_VAO:
        pdf = 2.0 * sphere_h
    else:
        pdf = jnp.full_like(sphere_h, 0.9 * (1.0 - r_frac) ** 1.5)
    no_x, no_y, no_z = b["no"]
    dxy_x = r_disc * math.sin(alpha)
    dxy_y = r_disc * math.cos(alpha)
    z_int = -(dxy_x * no_x + dxy_y * no_y) / A.make_nonzero(no_z, 1e-4)
    s_end = jnp.clip(z_int, -sphere_h, sphere_h)
    valid = (sphere_h - s_end) / (2.0 * sphere_h) > 0.1
    sample_len = jnp.sqrt(b["pos_len"] ** 2 + r_disc ** 2)

    co = _sample_coeffs(b, uqx, uqy)

    def eval_layer(d_tex):
        """addSample from a fetched depth plane (Common.slang:463-505) —
        affine-in-depth form (see _sample_coeffs)."""
        return _eval_depth_affine(cfg, b, co, d_tex, sphere_h, s_end, pdf)

    vis, oz = eval_layer(fetched)
    vis2 = oz2 = None
    if fetched2_pre is not None:
        f2 = S.interleave(fetched2_pre, hp, wp)
        v2, o2 = eval_layer(f2)
        if cfg.kernel == AO_KERNEL_VAO:
            vis2, oz2 = jnp.minimum(vis, v2), jnp.minimum(oz, o2)
        else:
            vis2, oz2 = jnp.maximum(vis, v2), jnp.minimum(oz, o2)
    elif depth2_pp is not None:
        f2 = S.interleave(S.fetch_direction(depth2_pp, pad, lvl_p, offs_i,
                                            qh, qw), hp, wp)
        v2, o2 = eval_layer(f2)
        if cfg.kernel == AO_KERNEL_VAO:
            vis2, oz2 = jnp.minimum(vis, v2), jnp.minimum(oz, o2)
        else:
            vis2, oz2 = jnp.maximum(vis, v2), jnp.minimum(oz, o2)

    return dict(lvl=lvl, lvl_p=lvl_p, r_eff=r_eff, r_disc=r_disc,
                off_x=off_x, off_y=off_y, same_pix=same_pix,
                in_screen=in_screen, uqx=uqx, uqy=uqy,
                sphere_start=sphere_h, sphere_end=s_end, pdf=pdf,
                valid=valid, sample_len=sample_len, ss_radius=r_eff,
                vis=vis, oz=oz, vis2=vis2, oz2=oz2, fetched=fetched)


def _require_ray(cfg, b, s, oz):
    """Common.slang:455-461."""
    if cfg.kernel == AO_KERNEL_VAO:
        cr = (1.0 + cfg.thickness) * b["radius"] - s["sphere_start"]
        return ((oz > s["sphere_start"] + cr)
                & (s["ss_radius"] > cfg.ss_radius_cutoff))
    return ((oz > jnp.maximum(s["sphere_start"], b["radius"] * 0.1))
            & (s["ss_radius"] > cfg.ss_radius_cutoff))


def svao_phase1_shift(cam, cfg, depth, depth2, normal_v, guard, primary,
                      secondary, trace_out_of_screen=False,
                      use_ray_interval=True, y_origin: int = 0,
                      sd_shape: tuple | None = None):
    """y_origin/sd_shape: band-mode hooks (parallel/tiles.py) — depth is a
    row band starting at global row y_origin, and the ray-interval SD grid
    is produced at the band-local shape sd_shape=(sd_h, sd_w) whose row 0 is
    global SD row y_origin//divisor - sd_guard."""
    from .svao import (DEPTH_MODE_DUAL, DEPTH_MODE_RAYTRACED,
                       DEPTH_MODE_STOCHASTIC, _intervals_to_sd_grid)
    h, w = depth.shape
    w_full, h_full = cfg.resolution
    b = _prep_planar(cam, cfg, depth, normal_v, y_origin)
    hp, wp = b["hp"], b["wp"]
    levels, offs, radii = S.offset_tables(cfg, cfg.ss_max_radius)
    pad = int(-(-float(levels[-1]) // 4)) + 1
    depth_pp = S.pad_planes(S.deinterleave(b["depth"]), pad)
    dual = primary == DEPTH_MODE_DUAL
    depth2_pp = None
    if dual:
        d2 = jnp.pad(depth2, ((0, hp - h), (0, wp - w)), mode="edge") \
            if (hp, wp) != (h, w) else depth2
        depth2_pp = S.pad_planes(S.deinterleave(d2), pad)
    nd = cfg.num_directions

    # interior mask in GLOBAL screen coords: off-band replicate rows (band
    # halo beyond the screen) must not contribute stencil/interval splats
    yy = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0) + y_origin
    xx = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
    interior = ((xx >= guard) & (xx < w_full - guard)
                & (yy >= guard) & (yy < h_full - guard))

    bright = jnp.zeros((hp, wp))
    dark = jnp.zeros((hp, wp))
    stencil = jnp.zeros((hp, wp), jnp.uint32)
    pix_rmin = jnp.full((hp, wp), A.FLT_MAX)
    pix_rmax = jnp.zeros((hp, wp))

    fetch_pre = fetch2_pre = [None] * nd
    if _use_fused_fetch():
        from ..ops.fetch_pallas import fetch_all_directions
        sets = [depth_pp] + ([depth2_pp] if dual else [])
        fa = fetch_all_directions(sets, pad, S.deinterleave(b["radius_px"]),
                                  levels, offs, radii)
        fetch_pre = list(fa[0])
        if dual:
            fetch2_pre = list(fa[1])

    for i in range(nd):
        alpha = (i / nd) * 2.0 * 3.141
        s = _sample_dir(cam, cfg, b, depth_pp, pad, offs[i], levels,
                        float(radii[i]), alpha, depth2_pp,
                        fetched_pre=fetch_pre[i], fetched2_pre=fetch2_pre[i])
        vis, oz = s["vis"], s["oz"]
        if dual:
            need2 = _require_ray(cfg, b, s, oz)
            vis = jnp.where(need2, s["vis2"], vis)
            oz = jnp.where(need2, s["oz2"], oz)

        if cfg.kernel == AO_KERNEL_VAO:
            same_contrib = (s["sphere_start"] - s["sphere_end"]) / s["pdf"]
        else:
            same_contrib = jnp.zeros_like(vis)
        contrib = jnp.where(s["same_pix"], same_contrib, vis)
        bright = bright + jnp.where(s["valid"], contrib, 0.0)

        force_ray = jnp.zeros_like(s["same_pix"])
        oz_int = oz
        if secondary == DEPTH_MODE_RAYTRACED and trace_out_of_screen:
            force_ray = force_ray | ~s["in_screen"]
        if cfg.sd_guard > 0:
            off = ~s["in_screen"]
            force_ray = force_ray | off
            oz_int = jnp.where(off, A.FLT_MAX, oz)  # SVAORaster.ps.slang:75-79

        need = (_require_ray(cfg, b, s, oz) | force_ray)
        need = need & s["valid"] & ~s["same_pix"] & b["valid"] & interior
        stencil = stencil | jnp.where(need, jnp.uint32(1 << i), jnp.uint32(0))

        if secondary == DEPTH_MODE_STOCHASTIC:
            if cfg.kernel == AO_KERNEL_VAO:
                oz_min = jnp.minimum(
                    oz_int, b["radius"] + cfg.thickness * b["radius"]
                    + s["sphere_start"])
            else:
                oz_min = jnp.minimum(oz_int, s["sphere_start"])
            rmin_v = jnp.maximum(b["pos_len"] - oz_min, 0.0)
            rmax_v = jnp.maximum(b["pos_len"] - s["sphere_end"], 0.0)
            if not use_ray_interval:
                rmin_v = jnp.zeros_like(rmin_v)
                rmax_v = jnp.ones_like(rmax_v)
            pix_rmin = jnp.minimum(pix_rmin, jnp.where(need, rmin_v, A.FLT_MAX))
            pix_rmax = jnp.maximum(pix_rmax, jnp.where(need, rmax_v, 0.0))
        else:
            dark = dark + jnp.where(~need & s["valid"] & ~s["same_pix"], vis, 0.0)
        # same-pixel contribution lands on both channels (SVAORaster.ps.slang:55-59)
        dark = dark + jnp.where(s["same_pix"] & s["valid"], same_contrib, 0.0)

    def crop(a):
        return a[:h, :w]

    scale = (2.0 if cfg.kernel == AO_KERNEL_VAO else 1.0) / nd
    bright = crop(bright) * scale
    dark = crop(dark) * scale
    stencil = crop(stencil)
    bg = ~crop(b["valid"])
    bright = jnp.where(bg, 1.0, bright)
    stencil = jnp.where(bg, 0, stencil)

    if sd_shape is not None:
        sd_h, sd_w = sd_shape
    else:
        sd_w = cfg.low_resolution[0] + 2 * cfg.sd_guard
        sd_h = cfg.low_resolution[1] + 2 * cfg.sd_guard
    if secondary == DEPTH_MODE_STOCHASTIC:
        ray_min, ray_max = _intervals_to_sd_grid(
            cfg, crop(b["radius_px"]), crop(pix_rmin), crop(pix_rmax),
            sd_h, sd_w)
    else:
        ray_min = jnp.full((sd_h, sd_w), A.FLT_MAX)
        ray_max = jnp.zeros((sd_h, sd_w))

    if cfg.dual_ao:
        dark = jnp.where(bg, 1.0, dark)
        ao_raw = jnp.stack([bright, dark], -1)
    else:
        ao_raw = bright
    return dict(ao_raw=ao_raw, stencil=stencil, ray_min=ray_min, ray_max=ray_max)


def svao_phase2_shift(cam, cfg, depth, depth2, normal_v, stencil, sd_map,
                      primary, sd_jitter=True, divisor=4, y_origin: int = 0):
    """Stochastic-depth resolve, shift mode (calcAO2, Common.slang:523-663).
    stochMapDivisor must be in {1,2,4} (strided-slice SD fetch); the caller
    falls back to the gather path otherwise.

    Band mode (y_origin != 0): depth/stencil are a row band whose first row
    is global row y_origin, and sd_map is the band-local SD map whose row
    `sd_guard` is global SD row y_origin//divisor — with y_origin a multiple
    of 4*divisor the strided-slice fetch alignment is unchanged (see
    ops/ao_shift.py fetch_sd_direction)."""
    from .svao import DEPTH_MODE_DUAL
    if isinstance(y_origin, int):
        assert y_origin % (4 * divisor) == 0, "band origin breaks SD alignment"
    h, w = depth.shape
    b = _prep_planar(cam, cfg, depth, normal_v, y_origin)
    hp, wp = b["hp"], b["wp"]
    levels, offs, radii = S.offset_tables(cfg, cfg.ss_max_radius)
    pad = int(-(-float(levels[-1]) // 4)) + 1
    dual = primary == DEPTH_MODE_DUAL
    if dual:
        d2 = jnp.pad(depth2, ((0, hp - h), (0, wp - w)), mode="edge") \
            if (hp, wp) != (h, w) else depth2
        layer_pp = S.pad_planes(S.deinterleave(d2), pad)
    else:
        layer_pp = S.pad_planes(S.deinterleave(b["depth"]), pad)

    nd = cfg.num_directions
    qh, qw = hp // 4, wp // 4
    k = sd_map.shape[-1]
    g = cfg.sd_guard
    depth_range = cam.far_z - cam.near_z
    low_w, low_h = cfg.low_resolution

    stencil_pd = jnp.pad(stencil, ((0, hp - h), (0, wp - w))) \
        if (hp, wp) != (h, w) else stencil

    xg = jax.lax.broadcasted_iota(jnp.float32, (hp, wp), 1)
    yg = jax.lax.broadcasted_iota(jnp.float32, (hp, wp), 0) + y_origin
    jit_q = S.tiled_jitter(qh, qw, sd_jitter)
    jit_x = jnp.repeat(jnp.repeat(jit_q[..., 0], 4, axis=0), 4, axis=1)
    jit_y = jnp.repeat(jnp.repeat(jit_q[..., 1], 4, axis=0), 4, axis=1)

    fetch_pre = [None] * nd
    sd_pre = None
    if _use_fused_fetch():
        from ..ops.fetch_pallas import (fetch_all_directions,
                                        fetch_sd_all_directions)
        rq = S.deinterleave(b["radius_px"])
        fa = fetch_all_directions([layer_pp], pad, rq, levels, offs, radii)
        fetch_pre = list(fa[0])
        if divisor == 4:
            sd_pre = fetch_sd_all_directions(sd_map, g, rq, levels, offs,
                                             radii, pad)

    delta = jnp.zeros((hp, wp))
    for i in range(nd):
        bit = ((stencil_pd >> i) & 1).astype(bool)
        alpha = (i / nd) * 2.0 * 3.141
        s = _sample_dir(cam, cfg, b, layer_pp, pad, offs[i], levels,
                        float(radii[i]), alpha, None,
                        fetched_pre=fetch_pre[i])
        old_vis = s["vis"]
        if cfg.kernel == AO_KERNEL_VAO:
            vis = jnp.where(s["in_screen"], s["vis"], 1.0)
        else:
            vis = jnp.where(s["in_screen"], s["vis"], 0.0)
        oz = jnp.where(s["in_screen"], s["oz"], A.FLT_MAX)

        sd_p = (sd_pre[i] if sd_pre is not None
                else S.fetch_sd_direction(sd_map, s["lvl_p"], offs[i], g,
                                          qh, qw, divisor))  # [16,k,qh,qw]
        sd_layers = [S.interleave(sd_p[:, kk], hp, wp) for kk in range(k)]
        # sd sample uv (Common.slang:569): texel + jitter over lowRes
        tex_x = jnp.floor((xg + s["off_x"]) / float(divisor))
        tex_y = jnp.floor((yg + s["off_y"]) / float(divisor))
        suv_x = (tex_x + jit_x) / low_w
        suv_y = (tex_y + jit_y) / low_h

        # all k SD layers evaluate through the depth-affine coefficients at
        # the (per-direction) SD sample uv: ~12 ops per layer instead of a
        # full UVToViewSpace + dot-product chain (see _sample_coeffs)
        co_sd = _sample_coeffs(b, suv_x, suv_y)
        for kk in range(k):
            lin = sd_layers[kk] * depth_range + cam.near_z
            v_k, oz_k = _eval_depth_affine(cfg, b, co_sd, lin,
                                           s["sphere_start"], s["sphere_end"],
                                           s["pdf"])
            if cfg.kernel == AO_KERNEL_VAO:
                vis = jnp.minimum(vis, v_k)
            else:
                vis = jnp.maximum(vis, v_k)
            oz = jnp.minimum(oz, oz_k)
        delta = delta + jnp.where(bit, vis - old_vis, 0.0)

    scale = (2.0 if cfg.kernel == AO_KERNEL_VAO else 1.0) / nd
    delta = delta[:h, :w] * scale
    if cfg.dual_ao:
        delta = jnp.stack([delta, jnp.zeros_like(delta)], -1)
    return delta
