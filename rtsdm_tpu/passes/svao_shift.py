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


_BQ_KEYS = ("depth", "radius", "radius_px", "valid", "px", "py", "pz",
            "pos_len")


def _deint_b(b):
    """Deinterleave the per-pixel basic-init planes once: all downstream
    math is elementwise (layout-free), and in deinterleaved space the
    per-direction screen directions and the dither rotation are per-CLASS
    CONSTANTS, so the whole ring loop runs on [16, qh, qw] planes with
    exactly one quarter->full interleave per OUTPUT — the per-direction
    full-res broadcast chains were phase 1's non-fetch cost."""
    bq = {k: S.deinterleave(b[k]) for k in _BQ_KEYS}
    for k in ("n", "a", "no"):
        bq[k] = tuple(S.deinterleave(x) for x in b[k])
    bq["sx"], bq["sy"] = b["sx"], b["sy"]
    bq["y_origin"] = b["y_origin"]
    return bq


def _class_grids(qh, qw, y_origin):
    """Per-class full-res pixel coordinates in deinterleaved space:
    full (y, x) = (4*qy + cy + y_origin, 4*qx + cx)."""
    cyc = jnp.asarray(np.arange(16, dtype=np.float32) // 4).reshape(16, 1, 1)
    cxc = jnp.asarray(np.arange(16, dtype=np.float32) % 4).reshape(16, 1, 1)
    xg_q = 4.0 * jax.lax.broadcasted_iota(jnp.float32, (16, qh, qw), 2) + cxc
    yg_q = (4.0 * jax.lax.broadcasted_iota(jnp.float32, (16, qh, qw), 1)
            + cyc + y_origin)
    return xg_q, yg_q


def _sample_dir_q(cfg, bq, xg_q, yg_q, levels, r_frac, alpha,
                  fetched_q, fetched2_q=None):
    """_sample_dir in deinterleaved space: every plane is [16, qh, qw] and
    the fetched planes come straight from the fused Pallas fetch (or the
    XLA fetch_direction) with NO interleave. Same math, same fp ops —
    deint(f(x)) == f(deint(x)) for the elementwise chain (bit-exactness
    locked by tests/test_svao.py shift-tier tests)."""
    w, h = cfg.resolution
    lvl = A.shift_level_index(levels, bq["radius_px"] * r_frac)
    r_eff = S.level_radius(levels, lvl)
    ux_c, uy_c = _class_consts(None, alpha)
    off_x = jnp.rint(r_eff * ux_c)
    off_y = jnp.rint(r_eff * uy_c)

    r_disc = jnp.minimum(r_eff / jnp.maximum(bq["radius_px"], 1e-4), 0.999) \
        * bq["radius"]
    same_pix = (off_y == 0.0) & (off_x == 0.0)
    sxp = xg_q + off_x
    syp = yg_q + off_y
    in_screen = (sxp >= 0) & (sxp < w) & (syp >= 0) & (syp < h)
    uqx = (jnp.clip(sxp, 0, w - 1) + 0.5) / w
    uqy = (jnp.clip(syp, 0, h - 1) + 0.5) / h

    sphere_h = jnp.sqrt(jnp.maximum(bq["radius"] ** 2 - r_disc ** 2, 1e-12))
    if cfg.kernel == AO_KERNEL_VAO:
        pdf = 2.0 * sphere_h
    else:
        pdf = jnp.full_like(sphere_h, 0.9 * (1.0 - r_frac) ** 1.5)
    no_x, no_y, no_z = bq["no"]
    dxy_x = r_disc * math.sin(alpha)
    dxy_y = r_disc * math.cos(alpha)
    z_int = -(dxy_x * no_x + dxy_y * no_y) / A.make_nonzero(no_z, 1e-4)
    s_end = jnp.clip(z_int, -sphere_h, sphere_h)
    valid = (sphere_h - s_end) / (2.0 * sphere_h) > 0.1

    co = _sample_coeffs(bq, uqx, uqy)
    vis, oz = _eval_depth_affine(cfg, bq, co, fetched_q, sphere_h, s_end,
                                 pdf)
    vis2 = oz2 = None
    if fetched2_q is not None:
        v2, o2 = _eval_depth_affine(cfg, bq, co, fetched2_q, sphere_h,
                                    s_end, pdf)
        if cfg.kernel == AO_KERNEL_VAO:
            vis2, oz2 = jnp.minimum(vis, v2), jnp.minimum(oz, o2)
        else:
            vis2, oz2 = jnp.maximum(vis, v2), jnp.minimum(oz, o2)

    return dict(lvl=lvl, r_eff=r_eff, r_disc=r_disc,
                off_x=off_x, off_y=off_y, same_pix=same_pix,
                in_screen=in_screen,
                sphere_start=sphere_h, sphere_end=s_end, pdf=pdf,
                valid=valid, ss_radius=r_eff,
                vis=vis, oz=oz, vis2=vis2, oz2=oz2)


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
    qh, qw = hp // 4, wp // 4

    bq = _deint_b(b)
    xg_q, yg_q = _class_grids(qh, qw, y_origin)

    # interior mask in GLOBAL screen coords: off-band replicate rows (band
    # halo beyond the screen) must not contribute stencil/interval splats
    interior = ((xg_q >= guard) & (xg_q < w_full - guard)
                & (yg_q >= guard) & (yg_q < h_full - guard))

    bright = jnp.zeros((16, qh, qw))
    dark = jnp.zeros((16, qh, qw))
    stencil = jnp.zeros((16, qh, qw), jnp.uint32)
    pix_rmin = jnp.full((16, qh, qw), A.FLT_MAX)
    pix_rmax = jnp.zeros((16, qh, qw))

    fetch_pre = fetch2_pre = [None] * nd
    if _use_fused_fetch():
        from ..ops.fetch_pallas import fetch_all_directions
        sets = [depth_pp] + ([depth2_pp] if dual else [])
        fa = fetch_all_directions(sets, pad, bq["radius_px"],
                                  levels, offs, radii)
        fetch_pre = list(fa[0])
        if dual:
            fetch2_pre = list(fa[1])

    for i in range(nd):
        alpha = (i / nd) * 2.0 * 3.141
        if fetch_pre[i] is not None:
            fq = fetch_pre[i]
        else:
            lvl_q = A.shift_level_index(levels,
                                        bq["radius_px"] * float(radii[i]))
            fq = S.fetch_direction(depth_pp, pad, lvl_q, offs[i], qh, qw)
        f2q = None
        if dual:
            f2q = (fetch2_pre[i] if fetch2_pre[i] is not None
                   else S.fetch_direction(depth2_pp, pad,
                                          A.shift_level_index(
                                              levels, bq["radius_px"]
                                              * float(radii[i])),
                                          offs[i], qh, qw))
        s = _sample_dir_q(cfg, bq, xg_q, yg_q, levels, float(radii[i]),
                          alpha, fq, f2q)
        vis, oz = s["vis"], s["oz"]
        if dual:
            need2 = _require_ray(cfg, bq, s, oz)
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

        need = (_require_ray(cfg, bq, s, oz) | force_ray)
        need = need & s["valid"] & ~s["same_pix"] & bq["valid"] & interior
        stencil = stencil | jnp.where(need, jnp.uint32(1 << i), jnp.uint32(0))

        if secondary == DEPTH_MODE_STOCHASTIC:
            if cfg.kernel == AO_KERNEL_VAO:
                oz_min = jnp.minimum(
                    oz_int, bq["radius"] + cfg.thickness * bq["radius"]
                    + s["sphere_start"])
            else:
                oz_min = jnp.minimum(oz_int, s["sphere_start"])
            rmin_v = jnp.maximum(bq["pos_len"] - oz_min, 0.0)
            rmax_v = jnp.maximum(bq["pos_len"] - s["sphere_end"], 0.0)
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
        return S.interleave(a, hp, wp)[:h, :w]

    scale = (2.0 if cfg.kernel == AO_KERNEL_VAO else 1.0) / nd
    bright = crop(bright) * scale
    dark = crop(dark) * scale
    stencil = crop(stencil)
    pix_rmin = crop(pix_rmin)
    pix_rmax = crop(pix_rmax)
    bg = ~b["valid"][:h, :w]
    bright = jnp.where(bg, 1.0, bright)
    stencil = jnp.where(bg, 0, stencil)

    if sd_shape is not None:
        sd_h, sd_w = sd_shape
    else:
        sd_w = cfg.low_resolution[0] + 2 * cfg.sd_guard
        sd_h = cfg.low_resolution[1] + 2 * cfg.sd_guard
    if secondary == DEPTH_MODE_STOCHASTIC:
        ray_min, ray_max = _intervals_to_sd_grid(
            cfg, b["radius_px"][:h, :w], pix_rmin, pix_rmax,
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


def _class_consts(offs_unused, alpha):
    """Per-dither-class screen-direction constants for one ring direction,
    shaped [16, 1, 1] for deinterleaved-space broadcasting (the tiled
    full-res maps of ao_shift.class_dir_maps collapse to one scalar per
    class)."""
    thetas = S.class_angles()
    ux = np.zeros((16, 1, 1), np.float32)
    uy = np.zeros((16, 1, 1), np.float32)
    for c in range(16):
        x, y = S.screen_dir(alpha, float(thetas[c]))
        ux[c, 0, 0], uy[c, 0, 0] = x, y
    return jnp.asarray(ux), jnp.asarray(uy)


def _sd_eval_deint(cfg, bq, sd_p, s, jqx, jqy,
                   xg_q, yg_q, divisor, low_w, low_h, depth_range, near_z,
                   k=None, packed16=False):
    """The phase-2 k-layer SD visibility eval, fully DEINTERLEAVED
    (calcAO2's stochastic-depth branch, Common.slang:562-597).

    Everything the eval needs is either elementwise in the per-pixel planes
    (layout-free: deint(f(x)) == f(deint(x))) or a per-class CONSTANT in
    deinterleaved space (screen directions, dither rotation) — so the whole
    eval runs on [16, qh, qw] planes and only the final reduced visibility
    interleaves back to full res. The previous full-res formulation paid
    nd*k quarter->full interleave transposes plus full-res broadcast chains:
    measured 32.8 of phase 2's 37.4 ms at 1080p (tools/phase2_profile.py,
    2026-08-19).

    bq: dict of deinterleaved b-planes; sd_p: [16, k, qh, qw] fetched SD
    slots (XLA fallback) or, with packed16=True, [16, ceil(k/2), qh, qw]
    int32 16-bit pairs (ops/fetch_pallas.fetch_sd_packed — the unpack
    fuses into the eval here instead of materializing [nd, 16, k, qh, qw]);
    s: the _sample_dir_q dict of this direction (shared ring geometry).
    Returns vis_sd [16, qh, qw]: min (VAO) / max (HBAO) over the k layers."""
    if k is None:
        k = sd_p.shape[1]
    off_x, off_y = s["off_x"], s["off_y"]
    ss, se, pdf = s["sphere_start"], s["sphere_end"], s["pdf"]
    radius_q = bq["radius"]
    plen = bq["pos_len"]

    # SD sample uv (Common.slang:569): texel + jitter over lowRes. The 4x4
    # jitter tiles over QUARTER coords, so it is class-independent here.
    tex_x = jnp.floor((xg_q + off_x) / float(divisor))
    tex_y = jnp.floor((yg_q + off_y) / float(divisor))
    suv_x = (tex_x + jqx) / low_w
    suv_y = (tex_y + jqy) / low_h
    cxs = (2.0 * suv_x - 1.0) * bq["sx"]
    cys = (1.0 - 2.0 * suv_y) * bq["sy"]
    ax, ay, az = bq["a"]
    oz_a = cxs * ax + cys * ay - az
    if cfg.kernel != AO_KERNEL_VAO:
        nx, ny, nz = bq["n"]
        px, py, pz = bq["px"], bq["py"], bq["pz"]
        qa = cxs * cxs + cys * cys + 1.0
        qb = -2.0 * (cxs * px + cys * py - pz)
        na = nx * cxs + ny * cys - nz
        np_ = nx * px + ny * py + nz * pz

    acc = None
    for kk in range(k):
        if packed16:
            from ..ops.fetch_pallas import unpack_sd16
            sd_val = unpack_sd16(sd_p, kk)
        else:
            sd_val = sd_p[:, kk]
        lin = sd_val * depth_range + near_z
        if cfg.kernel == AO_KERNEL_VAO:
            oz = lin * oz_a + plen
            v_k = _visibility_vao(cfg, oz, ss, se, pdf, radius_q)
            acc = v_k if acc is None else jnp.minimum(acc, v_k)
        else:
            vv = jnp.maximum((lin * qa + qb) * lin + plen * plen, 1e-12)
            ndotv = (lin * na - np_) / jnp.sqrt(vv)
            angle = jnp.clip(ndotv - 0.1, 0.0, 1.0)
            dist = jnp.clip(1.0 - vv / (cfg.radius * cfg.radius), 0.0, 1.0)
            v_k = jnp.clip(angle * dist / pdf, 0.0, 1.0)
            acc = v_k if acc is None else jnp.maximum(acc, v_k)
    return acc


def svao_phase2_shift(cam, cfg, depth, depth2, normal_v, stencil, sd_map,
                      primary, sd_jitter=True, divisor=4, y_origin: int = 0):
    """Stochastic-depth resolve, shift mode (calcAO2, Common.slang:523-663).
    stochMapDivisor must be in {1,2,4} (strided-slice SD fetch); the caller
    falls back to the gather path otherwise.

    The SD-layer visibility eval runs fully deinterleaved (_sd_eval_deint);
    only the reduced per-direction visibility interleaves back to full res
    where it folds into the primary-layer eval and the stencil-masked delta.

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
    g = cfg.sd_guard
    depth_range = cam.far_z - cam.near_z
    low_w, low_h = cfg.low_resolution

    stencil_pd = jnp.pad(stencil, ((0, hp - h), (0, wp - w))) \
        if (hp, wp) != (h, w) else stencil
    stencil_q = S.deinterleave(stencil_pd)

    bq = _deint_b(b)
    xg_q, yg_q = _class_grids(qh, qw, y_origin)
    jit_q = S.tiled_jitter(qh, qw, sd_jitter)
    jqx, jqy = jit_q[..., 0], jit_q[..., 1]

    fetch_pre = [None] * nd
    sd_pre = None
    k_sd = sd_map.shape[-1]
    if _use_fused_fetch():
        from ..ops.fetch_pallas import fetch_all_directions, fetch_sd_packed
        rq = bq["radius_px"]
        fa = fetch_all_directions([layer_pp], pad, rq, levels, offs, radii)
        fetch_pre = list(fa[0])
        if divisor == 4:
            sd_pre = fetch_sd_packed(sd_map, g, rq, levels, offs,
                                     radii, pad)

    delta_q = jnp.zeros((16, qh, qw))
    for i in range(nd):
        bit = ((stencil_q >> i) & 1).astype(bool)
        alpha = (i / nd) * 2.0 * 3.141
        lvl_q = A.shift_level_index(levels, bq["radius_px"] * float(radii[i]))
        fq = (fetch_pre[i] if fetch_pre[i] is not None
              else S.fetch_direction(layer_pp, pad, lvl_q, offs[i], qh, qw))
        s = _sample_dir_q(cfg, bq, xg_q, yg_q, levels, float(radii[i]),
                          alpha, fq)
        old_vis = s["vis"]
        if cfg.kernel == AO_KERNEL_VAO:
            vis = jnp.where(s["in_screen"], s["vis"], 1.0)
        else:
            vis = jnp.where(s["in_screen"], s["vis"], 0.0)

        sd_p = (sd_pre[i] if sd_pre is not None
                else S.fetch_sd_direction(sd_map, lvl_q, offs[i], g,
                                          qh, qw, divisor))  # [16,k,qh,qw]
        vis_sd = _sd_eval_deint(cfg, bq, sd_p, s, jqx, jqy, xg_q, yg_q,
                                divisor, low_w, low_h, depth_range,
                                cam.near_z, k=k_sd,
                                packed16=sd_pre is not None)
        if cfg.kernel == AO_KERNEL_VAO:
            vis = jnp.minimum(vis, vis_sd)
        else:
            vis = jnp.maximum(vis, vis_sd)
        delta_q = delta_q + jnp.where(bit, vis - old_vis, 0.0)

    scale = (2.0 if cfg.kernel == AO_KERNEL_VAO else 1.0) / nd
    delta = S.interleave(delta_q, hp, wp)[:h, :w] * scale
    if cfg.dual_ao:
        delta = jnp.stack([delta, jnp.zeros_like(delta)], -1)
    return delta
