"""History-warp (reprojection resample) — Pallas TPU kernel.

Why: TAA / temporal passes resample the previous frame at per-pixel motion-
shifted positions. As XLA that is a per-pixel gather (4 taps bilinear, 16
effective taps Catmull-Rom): ~100M gathered elements per 720p frame for the
9-tap CR fetch — ~1 s on TPU, and the headline graphs run TWO TAA passes.

TPU-native design (no gather anywhere):
  * separable filters: Catmull-Rom's 9 bilinear taps expand to the exact
    4x4 tensor-product kernel, bilinear to 2x2 — both are "N weighted taps
    per axis at consecutive texel rows/columns",
  * per 8x128 pixel block, sample positions are coherent (motion fields are
    smooth); one DMA brings the bounding region [C, RH, RW] into VMEM
    (origin = per-block min tap, so UNIFORM motion of any magnitude fits;
    only intra-block motion SPREAD is bounded),
  * the y-axis filter is folded into a weighted N-hot row matrix and
    applied as ONE MXU matmul [B, RH] x [RH, RW] -> per-pixel filtered
    rows; the x-axis filter is a weighted N-hot lane mask + reduce on the
    VPU,
  * pixels whose taps exceed the region (violent motion discontinuities)
    fall back to a caller-provided plane (for TAA: the current frame —
    the variance clip bounds the error exactly like a disocclusion).

Edge semantics match passes/temporal._bilinear: taps clamp to the image
border (implemented by edge-padding the texture and clamping tap indices,
which blends equal values — bit-equivalent).

Reference: TAA.ps.slang:45-76 (the GPU version leans on texture units; the
TPU has none, so the filter becomes MXU work).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH, BW = 8, 128      # output block
MARGIN = 16          # intra-block tap-spread allowance (pixels, each side)


def whole_map_exact(h, w):
    """True when warp_resample_pallas's VMEM region covers the whole [h,w]
    map (see region sizing in warp_resample_pallas), making the kernel an
    EXACT sampler for arbitrary sample fields. Callers sampling with
    unbounded tap spread (env maps at the lat-long seam, page atlases) must
    gate on this — outside the region the kernel returns the fallback."""
    return h <= 768 and w <= 256


def _axis_weights(p, mode):
    """Tap base index + per-tap weights along one axis.

    p: continuous sample coordinate in pixel units (texel y has center
    y + 0.5). Returns (base_int, [w...]) with taps at texel indices
    base, base+1, ... matching passes/temporal.py exactly."""
    if mode == "nearest":
        # texel index trunc(p) for p >= 0 (clip handles the rest) — matches
        # the `(uv * wh).astype(int32)` fetches in passes/temporal.py
        return jnp.floor(p).astype(jnp.int32), [jnp.ones_like(p)]
    if mode == "bilinear":
        x = p - 0.5
        x0 = jnp.floor(x)
        f = x - x0
        return x0.astype(jnp.int32), [1.0 - f, f]
    # catmull_rom (TAA.ps.slang:45-60): taps at floor(p-0.5)-1 .. +2
    tc = jnp.floor(p - 0.5)
    f = p - 0.5 - tc
    f2, f3 = f * f, f * f * f
    w0 = f2 - 0.5 * (f3 + f)
    w1 = 1.5 * f3 - 2.5 * f2 + 1.0
    w3 = 0.5 * (f3 - f2)
    w2 = 1.0 - w0 - w1 - w3
    return (tc - 1.0).astype(jnp.int32), [w0, w1, w2, w3]


def _warp_kernel(c, n_tap, rh, rw, hpad, wpad, mode,
                 sx_ref, sy_ref, fb_ref, tex_hbm, out_ref, scratch, sem):
    sx = sx_ref[...].reshape(BH * BW, 1)
    sy = sy_ref[...].reshape(BH * BW, 1)

    bx0, wxs = _axis_weights(sx, mode)
    by0, wys = _axis_weights(sy, mode)
    # clamp the tap BASE so every clipped tap still reads an edge-copy row
    # of the pad-4 texture (all taps equal at the border — identical to the
    # per-tap clip in temporal._bilinear); hpad/wpad = unpadded H/W,
    # hrows/wcols = padded totals
    hrows, wcols = tex_hbm.shape[1], tex_hbm.shape[2]
    bx0 = jnp.clip(bx0, -n_tap, wpad - 1)
    by0 = jnp.clip(by0, -n_tap, hpad - 1)

    # region origin: min first-tap over the block (dynamic scalars), in
    # pad-4 coordinates
    oy = jnp.clip(jnp.min(by0) + 4, 0, hrows - rh)
    ox = jnp.clip(jnp.min(bx0) + 4, 0, wcols - rw)
    pltpu.make_async_copy(tex_hbm.at[:, pl.ds(oy, rh), pl.ds(ox, rw)],
                          scratch, sem).start()

    ly = by0 + 4 - oy                       # local first-tap row
    lx = bx0 + 4 - ox
    ok = ((ly >= 0) & (ly <= rh - n_tap)
          & (lx >= 0) & (lx <= rw - n_tap))           # [B,1]

    lys = jnp.where(ok, ly, 0)
    lxs = jnp.where(ok, lx, 0)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (BH * BW, rh), 1)
    wrow = jnp.zeros((BH * BW, rh), jnp.float32)
    for t in range(n_tap):
        wrow = wrow + jnp.where(row_iota == lys + t, wys[t], 0.0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (BH * BW, rw), 1)
    wcol = jnp.zeros((BH * BW, rw), jnp.float32)
    for t in range(n_tap):
        wcol = wcol + jnp.where(col_iota == lxs + t, wxs[t], 0.0)

    pltpu.make_async_copy(tex_hbm.at[:, pl.ds(oy, rh), pl.ds(ox, rw)],
                          scratch, sem).wait()

    okp = ok.reshape(BH, BW)
    for ch in range(c):
        rows = jax.lax.dot_general(wrow, scratch[ch],
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        val = jnp.sum(rows * wcol, axis=1).reshape(BH, BW)
        out_ref[ch] = jnp.where(okp, val, fb_ref[ch])


def warp_resample_pallas(tex, sx, sy, fallback, mode="catmull_rom",
                         wrap_x=False):
    """Resample planar ``tex`` [C,H,W] at per-pixel positions (sx, sy)
    [HO,WO] (pixel units, texel centers at +0.5; the output grid may differ
    from the texture grid — env-map lookups sample a tiny map from screen
    space). fallback: [C,HO,WO] used where a block's tap spread exceeds the
    DMA region. Returns [C,HO,WO].

    wrap_x: wrap addressing in x (lat-long env maps; |overhang| <= 4
    texels, which covers bilinear's single wrap tap) instead of clamp.
    Small textures get a region covering the WHOLE map, so every sample is
    valid and the fallback never fires — the kernel is then an exact
    arbitrary-position sampler."""
    n_tap = {"nearest": 1, "bilinear": 2, "catmull_rom": 4}[mode]
    c, h, w = tex.shape
    ho, wo = sx.shape
    hb = ho + (-ho) % BH
    wb = wo + (-wo) % BW
    # region: motion-bounded window, or the whole map (+clamp slack) when
    # the map is small — then every sample is valid regardless of spread
    # (env maps, page atlases). Budget ~2.5 MB of VMEM for the region.
    rh = h + 8 + n_tap if h <= 768 else BH + 2 * MARGIN + n_tap
    rw = w + 8 + n_tap if w <= 256 else BW + 2 * MARGIN + n_tap
    assert c * rh * rw * 4 <= (4 << 20), (c, rh, rw)
    # pad 4 low (clamped tap base reaches -n_tap >= -4) and enough high
    # that any clamped origin still fits a full [rh, rw] region
    hi_y = max(rh - 1, n_tap + 4)
    hi_x = max(rw - 1, n_tap + 4)
    texp = jnp.pad(tex, ((0, 0), (4, hi_y), (0, 0)), mode="edge")
    if wrap_x:
        reps = -(-hi_x // w)
        texp = jnp.concatenate(
            [texp[:, :, -4:], texp,
             jnp.tile(texp, (1, 1, reps))[:, :, :hi_x]], axis=2)
    else:
        texp = jnp.pad(texp, ((0, 0), (0, 0), (4, hi_x)), mode="edge")

    def p2(a):
        # edge mode: padded lanes mirror the block's real samples, so they
        # never drag the per-block region origin away from the content
        return jnp.pad(a, ((0, hb - ho), (0, wb - wo)), mode="edge")

    sxp, syp = p2(sx), p2(sy)
    fbp = jnp.pad(fallback, ((0, 0), (0, hb - ho), (0, wb - wo)))

    kernel = functools.partial(_warp_kernel, c, n_tap, rh, rw, h, w, mode)
    blk = pl.BlockSpec((BH, BW), lambda i, j: (i, j),
                       memory_space=pltpu.VMEM)
    cblk = pl.BlockSpec((c, BH, BW), lambda i, j: (0, i, j),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(hb // BH, wb // BW),
        in_specs=[blk, blk, cblk, pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=cblk,
        out_shape=jax.ShapeDtypeStruct((c, hb, wb), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, rh, rw), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(sxp, syp, fbp, texp)
    return out[:, :ho, :wo]
