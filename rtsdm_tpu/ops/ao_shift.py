"""Gather-free SVAO sampling (the TPU fast path).

Why: TPUs have no hardware gather — the per-pixel texture fetches of the AO
ring (reference SVAORaster.ps.slang / Common.slang calcAO2) run ~200x slower
as XLA gathers than as static shifts + selects (measured on v5e). This module
reformulates the ring sampling so every fetch is a statically-shifted copy of
the texture selected per pixel:

  * The per-pixel dither rotation (SVAO.cpp:663-688) is periodic on a 4x4
    grid, so the image deinterleaves into 16 rotation classes
    (reference's own interleaved-rendering trick, DeinterleaveTexture);
    within a class the screen-space sample direction of ring direction i is
    a single static vector (exact at screen center, small perspective skew
    toward the borders).
  * The per-pixel sample radius (radiusInPixels * sampleRadius[i],
    Common.slang:355-360) is quantized onto a static level table — exact for
    small radii, log-spaced (<=6% error) beyond. The visibility math then
    uses the QUANTIZED effective disc radius, so the estimator stays
    consistent (this generalizes the reference's own snap-to-pixel-center).
  * The stochastic-depth fetch aligns perfectly when stochMapDivisor == 4:
    SD texel of (pixel + off) = quarter_coord + static offset, a pure static
    slice of the guard-banded SD map.

The exact gather formulation stays available (VAOConfig via passes/svao.py
`samplingMode='gather'`) for validation.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.sampling import DITHER_4X4, JITTER_4X4
from . import ao as A

# ---------------------------------------------------------------------------
# static tables
# ---------------------------------------------------------------------------


def class_angles():
    """Rotation angle per 4x4 dither class (BasicAOData.Init randRotation =
    noise * 2*pi, Common.slang:311)."""
    return (DITHER_4X4.reshape(16) * 2.0 * 3.141).astype(np.float32)


def screen_dir(alpha: float, theta: float):
    """Static screen-space unit direction of ring direction `alpha` under
    class rotation `theta` (exact at screen center; see module docstring).

    Derivation: at center, tangent=(sx,sy,0), bitangent=(-sy,sx,0) with
    (sx,sy)=(sin theta, cos theta); disc offset v = R(theta)·(dx,dy); pixel
    offset ∝ (v.x, -v.y)."""
    dx, dy = math.sin(alpha), math.cos(alpha)
    sx, sy = math.sin(theta), math.cos(theta)
    vx = sx * dx - sy * dy
    vy = sy * dx + sx * dy
    return vx, -vy


def radius_levels(max_radius_px: float):
    return A.shift_radius_levels(max_radius_px)


def offset_tables(cfg, max_radius_px: float):
    """Static offsets: offs[i][c][l] = (dy, dx) integer pixel offset for
    direction i, dither class c, radius level l."""
    levels = radius_levels(max_radius_px)
    thetas = class_angles()
    nd = cfg.num_directions
    radii = cfg.radii()
    alphas = [(i / nd) * 2.0 * 3.141 for i in range(nd)]
    offs = []
    for i in range(nd):
        per_class = []
        for c in range(16):
            ux, uy = screen_dir(alphas[i], float(thetas[c]))
            per_class.append([(int(round(r * uy)), int(round(r * ux)))
                              for r in levels])
        offs.append(per_class)
    return levels, offs, radii


# ---------------------------------------------------------------------------
# de/interleave helpers (4x4, matching the dither grid)
# ---------------------------------------------------------------------------

def deinterleave(tex):
    """[H,W(,C)] -> [16, H/4, W/4(,C)], class = (y%4)*4 + x%4. H,W must be
    multiples of 4 (pad upstream)."""
    h, w = tex.shape[:2]
    t = tex.reshape((h // 4, 4, w // 4, 4) + tex.shape[2:])
    t = jnp.moveaxis(t, (1, 3), (0, 1))
    return t.reshape((16, h // 4, w // 4) + tex.shape[2:])


def interleave(planes, h, w):
    t = planes.reshape((4, 4) + planes.shape[1:])
    t = jnp.moveaxis(t, (0, 1), (1, 3))
    return t.reshape((h, w) + planes.shape[3:])


def _pad4(a):
    h, w = a.shape[:2]
    ph, pw = (-h) % 4, (-w) % 4
    if ph or pw:
        a = jnp.pad(a, ((0, ph), (0, pw)) + ((0, 0),) * (a.ndim - 2), mode="edge")
    return a


# ---------------------------------------------------------------------------
# the per-direction fetch
# ---------------------------------------------------------------------------

def pad_planes(planes, pad: int):
    """Edge-replicate-pad the class planes once so every per-level fetch is a
    single static slice (shift2d per candidate is ~8 HLO ops; a slice of a
    padded array is 1)."""
    return jnp.pad(planes, ((0, 0), (pad, pad), (pad, pad)), mode="edge")


def fetch_direction(padded_planes, pad: int, lvl_planes, offs_i, qh, qw):
    """For ring direction i: per-class select-of-slices, SCANNED over the
    radius levels.

    padded_planes: [16, qh+2p, qw+2p]; lvl_planes: [16, qh, qw] int32.
    offs_i: static [(dy,dx)] per class per level. Returns fetched [16,qh,qw].

    Unrolling 16 classes x L levels of slice-selects made the HLO explode
    (~16k slice ops across 8 directions -> 600 s compiles / compile-helper
    OOM at divisor 1, VERDICT r1 weak #4). The level loop is a `lax.scan`
    whose per-step offsets come from a static int table consumed by
    dynamic_slice: compile size /L, runtime within noise (acc traffic
    ~0.25 ms/direction at 1080p).

    The barriers force lvl/planes to materialize once: without them XLA
    inlines their whole producer chains into each slice-select fusion
    (measured 110GB of recomputed reads at 1080p)."""
    padded_planes = jax.lax.optimization_barrier(padded_planes)
    lvl_planes = jax.lax.optimization_barrier(lvl_planes)
    n_levels = len(offs_i[0])
    # static table [L, 16, 3]: (source class, y start, x start) per level
    tab = np.zeros((n_levels, 16, 3), np.int32)
    for c in range(16):
        cy, cx = c // 4, c % 4
        for l, (dy, dx) in enumerate(offs_i[c]):
            c2 = ((cy + dy) % 4) * 4 + ((cx + dx) % 4)
            qdy = max(-pad, min(pad, (cy + dy) // 4))
            qdx = max(-pad, min(pad, (cx + dx) // 4))
            tab[l, c] = (c2, pad + qdy, pad + qdx)
    tab = jnp.asarray(tab)

    def body(acc, l):
        t = tab[l]
        new = []
        for c in range(16):
            sl = jax.lax.dynamic_slice(
                padded_planes, (t[c, 0], t[c, 1], t[c, 2]), (1, qh, qw))[0]
            new.append(jnp.where(lvl_planes[c] == l, sl, acc[c]))
        return jnp.stack(new), None

    acc0 = jnp.zeros((16, qh, qw))
    out, _ = jax.lax.scan(body, acc0, jnp.arange(n_levels))
    return out


def level_radius(levels, lvl):
    """Analytic inverse of shift_level_index: quantized radius from the level
    index (exact integer region + geometric region), avoiding a select chain."""
    exact_n = A.SHIFT_EXACT_RADII
    if len(levels) <= exact_n:
        return (lvl + 1).astype(jnp.float32)
    ratio = float(levels[-1] / levels[-2])
    log_r0 = math.log(float(levels[exact_n]))
    log_step = math.log(ratio)
    r_log = jnp.exp(log_r0 + (lvl - exact_n).astype(jnp.float32) * log_step)
    return jnp.where(lvl < exact_n, (lvl + 1).astype(jnp.float32), r_log)


def class_dir_maps(cfg, alpha_i: float, h: int, w: int):
    """Tiled per-pixel unit screen direction for ring direction i under the
    pixel's dither-class rotation — a periodic 4x4 pattern, gather-free."""
    thetas = class_angles().reshape(4, 4)
    ux = np.zeros((4, 4), np.float32)
    uy = np.zeros((4, 4), np.float32)
    for cy in range(4):
        for cx in range(4):
            x, y = screen_dir(alpha_i, float(thetas[cy, cx]))
            ux[cy, cx], uy[cy, cx] = x, y
    reps = (-(-h // 4), -(-w // 4))
    ux_m = jnp.asarray(np.tile(ux, reps)[:h, :w])
    uy_m = jnp.asarray(np.tile(uy, reps)[:h, :w])
    return ux_m, uy_m


def fetch_sd_direction(sd_map, lvl_planes, offs_i, guard, qh, qw,
                       divisor: int = 4):
    """Stochastic-depth fetch for direction i (divisor in {1,2,4}): for a
    class-c pixel (full-res 4q + c) with static offset d, the SD texel is
    floor((4q + c + d)/div) + guard = (4/div) q + floor((c+d)/div) + guard —
    a static STRIDED slice of the guard-banded SD map [sdH, sdW, k] (the
    guard band doubles as slice padding).

    Layout: the k slot dim moves to the FRONT for the whole computation —
    a [qh, qw, k] minor-dim-4 tensor occupies only 4 of the 128 VPU lanes
    per tile (32x waste); planar [k, qh, qw] keeps qw on the lanes
    (CLAUDE.md planar rule). Returns sd_planes [16, k, qh, qw]."""
    assert divisor in (1, 2, 4)
    stride = 4 // divisor
    k = sd_map.shape[-1]
    sd_h, sd_w = sd_map.shape[:2]
    sd_pl = jnp.moveaxis(sd_map, -1, 0)                 # [k, sdH, sdW]
    lvl_planes = jax.lax.optimization_barrier(lvl_planes)

    # stride > 1 (divisor 1/2): decompose into phase-shifted strided views
    # so the scanned fetch can use (unstrided) dynamic_slice
    if stride > 1:
        phases = [sd_pl[:, oy::stride, ox::stride]
                  for oy in range(stride) for ox in range(stride)]
        ph = max(p.shape[1] for p in phases)
        pw = max(p.shape[2] for p in phases)
        phases = [jnp.pad(p, ((0, 0), (0, ph - p.shape[1]),
                              (0, pw - p.shape[2]))) for p in phases]
        grid = jnp.stack(phases)                        # [s^2, k, ph, pw]
    else:
        ph, pw = sd_h, sd_w
        grid = sd_pl[None]
    grid = jax.lax.optimization_barrier(grid)

    # per class: group consecutive levels with the same SD offset (the
    # /divisor floor collapses ~2x at divisor 4), then pad all classes to a
    # common group count with never-true sentinels and SCAN over groups
    # (unrolled slice-selects exploded the HLO; see fetch_direction)
    per_class = []
    for c in range(16):
        cy, cx = c // 4, c % 4
        groups = []  # (lo, hi, qdy, qdx)
        for l, (dy, dx) in enumerate(offs_i[c]):
            qdy = (cy + dy) // divisor + guard
            qdx = (cx + dx) // divisor + guard
            if groups and groups[-1][2] == qdy and groups[-1][3] == qdx:
                groups[-1] = (groups[-1][0], l, qdy, qdx)
            else:
                groups.append((l, l, qdy, qdx))
        per_class.append(groups)
    gmax = max(len(g) for g in per_class)
    # table [Gmax, 16, 5]: (phase, y0', x0', lo, hi); sentinel lo=1>hi=0
    tab = np.zeros((gmax, 16, 5), np.int32)
    tab[..., 3] = 1
    for c, groups in enumerate(per_class):
        for gi, (lo, hi, qdy, qdx) in enumerate(groups):
            y0 = max(0, min(qdy, sd_h - 1 - (qh - 1) * stride))
            x0 = max(0, min(qdx, sd_w - 1 - (qw - 1) * stride))
            phase = (y0 % stride) * stride + (x0 % stride) if stride > 1 else 0
            yq = min(y0 // stride, max(ph - qh, 0))
            xq = min(x0 // stride, max(pw - qw, 0))
            tab[gi, c] = (phase, yq, xq, lo, hi)
    tab = jnp.asarray(tab)

    def body(acc, gi):
        t = tab[gi]
        new = []
        for c in range(16):
            sl = jax.lax.dynamic_slice(
                grid, (t[c, 0], 0, t[c, 1], t[c, 2]), (1, k, qh, qw))[0]
            lvl = lvl_planes[c]
            m = (lvl >= t[c, 3]) & (lvl <= t[c, 4])
            new.append(jnp.where(m[None], sl, acc[c]))
        return jnp.stack(new), None

    acc0 = jnp.zeros((16, k, qh, qw))
    out, _ = jax.lax.scan(body, acc0, jnp.arange(gmax))
    return out


def tiled_jitter(qh, qw, enabled=True):
    """The 4x4 SD-map sub-texel jitter as a tiled (gather-free) pattern over
    quarter coords (Jitter.slangh:27-50; table index = (ty%4)*4 + tx%4 where
    (ty,tx) = quarter coord + static offset — the static phase shift is a
    <=1-texel jitter-pattern rotation, ignored)."""
    if not enabled:
        return jnp.full((qh, qw, 2), 0.5)
    tab = jnp.asarray(JITTER_4X4.reshape(4, 4, 2))
    reps_y = -(-qh // 4)
    reps_x = -(-qw // 4)
    return jnp.tile(tab, (reps_y, reps_x, 1))[:qh, :qw]
