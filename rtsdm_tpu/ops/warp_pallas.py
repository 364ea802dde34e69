"""History-warp (reprojection resample) — Pallas TPU kernel.

Why: TAA / temporal passes resample the previous frame at per-pixel motion-
shifted positions. As XLA that is a per-pixel gather (4 taps bilinear, 16
effective taps Catmull-Rom): ~100M gathered elements per 720p frame for the
9-tap CR fetch — ~1 s on TPU, and the headline graphs run TWO TAA passes.

TPU-native design (no gather anywhere, Mosaic-verified constraints):
  * separable filters: Catmull-Rom's 9 bilinear taps expand to the exact
    4x4 tensor-product kernel, bilinear to 2x2 — both are "N weighted taps
    per axis at consecutive texel rows/columns",
  * per 8x128 pixel block, one DMA brings a bounding region [C, RH, RW]
    into VMEM. The region origin is the per-block min tap FLOOR-ALIGNED to
    the (8, 128) VMEM tiling (Mosaic requires provably aligned dynamic DMA
    origins — `(x // 8) * 8` carries the divisibility proof); the region
    extents carry the alignment slack and are tile-aligned,
  * the filter runs ROW-AT-A-TIME so every per-pixel quantity stays a
    [1, BW] lane vector (Mosaic has no [8,128]->[1024,1] reshape and no
    cheap transposes): x-filter FIRST as one MXU matmul per (row, slab,
    channel) — region rows x weighted-N-hot columns [RH', RW] @ [RW, BW] —
    then the y-filter as an N-hot weighted sublane reduction,
  * the region's rows are processed in 56-row SLABS (48-row assignment
    stride, 8-row tap overlap, slab starts 8-aligned); a slab's matmul is
    skipped (`pl.when`) when no pixel of the output row lands in it. Small
    whole-map textures (env maps, page atlases — unbounded tap spread
    across pages) stay EXACT because the region is the whole map, while
    coherent sample fields only pay for the 1-2 slabs they touch,
  * validity is value-space: out-of-range taps simply never match the
    N-hot iota, so the filtered weight mass differs from 1; pixels with
    |mass - 1| >= 1e-4 take the caller-provided fallback plane (for TAA:
    the current frame — the variance clip bounds the error exactly like a
    disocclusion). A dropped tap with |w| < 1e-4 counts as valid, which
    bounds the value error by ~1e-4 * range instead of falling back.

Edge semantics match passes/temporal._bilinear: taps clamp to the image
border (implemented by edge-padding the texture and clamping tap bases,
which blends equal values — bit-equivalent).

Reference: TAA.ps.slang:45-76 (the GPU version leans on texture units; the
TPU has none, so the filter becomes MXU work).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH, BW = 8, 128      # output block
MARGIN = 16          # intra-block tap-spread allowance (pixels, each side)
SLAB = 56            # slab slice height (rows live per matmul)
STRIDE = 48          # slab assignment stride (SLAB - 8 tap overlap)
VMEM_BUDGET = 6 << 20  # region bytes per call; channels chunk to fit


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


def _slabs(rh):
    """Static (slice_start, assign_lo, assign_hi) covering region rows: a
    pixel with first tap ly in [assign_lo, assign_hi] has all taps inside
    [slice_start, slice_start + min(SLAB, rh)). Slice starts are 8-aligned
    (STRIDE and rh - SLAB are multiples of 8); entries sharing a slice
    start merge into one gated matmul."""
    sh = min(SLAB, rh)
    out = []
    s = 0
    while True:
        ss = max(0, min(STRIDE * s, rh - sh))
        lo = STRIDE * s
        last = STRIDE * (s + 1) >= rh - 4
        hi = rh - 4 if last else STRIDE * (s + 1) - 1
        if out and out[-1][0] == ss:
            out[-1] = (ss, out[-1][1], hi)
        else:
            out.append((ss, lo, hi))
        if last:
            return tuple(out)
        s += 1


def _warp_kernel(c, n_tap, rh, rw, hpad, wpad, mode, whole,
                 sy_ref, sx_ref, fb_ref, tex_hbm, out_ref,
                 acc, scratch, sem):
    """Grid (hb//BH, wb//BW). sy/sx: [BH, BW] sample rows/cols (pixel
    units); fb/out: [c, BH, BW]; scratch [c, rh, rw]; acc [c+1, BH, BW]
    (filtered channels + weight-mass sentinel)."""
    hrows, wcols = tex_hbm.shape[1], tex_hbm.shape[2]
    by0, wys = _axis_weights(sy_ref[...], mode)     # [BH, BW]
    bx0, wxs = _axis_weights(sx_ref[...], mode)
    # clamp the tap BASE so border samples read the edge-copy pad (all taps
    # equal at the border — identical to the per-tap clip in
    # temporal._bilinear); hpad/wpad = unpadded H/W
    by0 = jnp.clip(by0, -n_tap, hpad - 1)
    bx0 = jnp.clip(bx0, -n_tap, wpad - 1)

    if whole:
        oy = 0
        ox = 0

        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _dma():
            cp = pltpu.make_async_copy(tex_hbm, scratch, sem)
            cp.start()
            cp.wait()
    else:
        # region origin: min first-tap over the block (pad-4 coordinates),
        # floored to the (8, 128) tiling — the floor product form is what
        # lets Mosaic prove the DMA origin alignment
        oy = jnp.clip(jnp.min(by0) + 4, 0, hrows - rh)
        oy = (oy // 8) * 8
        ox = jnp.clip(jnp.min(bx0) + 4, 0, wcols - rw)
        ox = (ox // 128) * 128
        cp = pltpu.make_async_copy(
            tex_hbm.at[:, pl.ds(oy, rh), pl.ds(ox, rw)], scratch, sem)
        cp.start()
        cp.wait()

    ly = by0 + 4 - oy                               # [BH, BW] region-local
    lx = bx0 + 4 - ox
    sh = min(SLAB, rh)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (rw, BW), 0)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (sh, BW), 0)

    for r in range(BH):
        ly_r = ly[r:r + 1, :]                       # [1, BW]
        lx_r = lx[r:r + 1, :]
        wcolT = jnp.zeros((rw, BW), jnp.float32)    # weighted N-hot columns
        for t in range(n_tap):
            wcolT = wcolT + jnp.where(iota_w == lx_r + t,
                                      wxs[t][r:r + 1, :], 0.0)
        swx = jnp.sum(wcolT, axis=0, keepdims=True)
        acc[:, r:r + 1, :] = jnp.zeros((c + 1, 1, BW), jnp.float32)

        for (ss, a_lo, a_hi) in _slabs(rh):
            sel = (ly_r >= a_lo) & (ly_r <= a_hi)

            @pl.when(jnp.any(sel))
            def _slab(ss=ss, sel=sel):
                lloc = ly_r - ss
                wrowT = jnp.zeros((sh, BW), jnp.float32)
                for t in range(n_tap):
                    wrowT = wrowT + jnp.where((iota_s == lloc + t) & sel,
                                              wys[t][r:r + 1, :], 0.0)
                acc[c, r:r + 1, :] += jnp.sum(wrowT, axis=0, keepdims=True)
                for ch in range(c):
                    xf = jax.lax.dot_general(
                        scratch[ch, ss:ss + sh, :], wcolT,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # [sh, BW]
                    acc[ch, r:r + 1, :] += jnp.sum(xf * wrowT, axis=0,
                                                   keepdims=True)

        valid = jnp.abs(acc[c, r:r + 1, :] * swx - 1.0) < 1e-4
        for ch in range(c):
            out_ref[ch, r:r + 1, :] = jnp.where(
                valid, acc[ch, r:r + 1, :], fb_ref[ch, r:r + 1, :])


def _round(v, m):
    return v + (-v) % m


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
    whole_y = h <= 768
    whole_x = w <= 256

    # pad 4 low on both axes (clamped tap base reaches -n_tap >= -4); high
    # pads sized so every (clipped, floor-aligned) region stays in bounds
    if whole_y:
        rh = _round(h + 4 + n_tap + 8, 8)
        hi_y = rh - h - 4
    else:
        rh = _round(BH + 2 * MARGIN + n_tap + 7, 8)
        hi_y = rh - 1
    if whole_x:
        rw = _round(w + 4 + n_tap + 8, 128)
        hi_x = rw - w - 4
    else:
        rw = _round(BW + 2 * MARGIN + n_tap + 127, 128)
        hi_x = rw - 1
    whole = whole_y and whole_x
    # mixed small/large axes: fall back to the bounded region on both (the
    # whole_map_exact gate keeps exactness-dependent callers off this path)
    if not whole:
        if whole_y:
            rh = _round(min(h + 4 + n_tap + 8, BH + 2 * MARGIN + n_tap + 7),
                        8)
            hi_y = rh - 1
        if whole_x:
            rw = _round(min(w + 4 + n_tap + 8,
                            BW + 2 * MARGIN + n_tap + 127), 128)
            hi_x = rw - 1

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

    # chunk channels so the VMEM region fits the budget
    cmax = max(1, VMEM_BUDGET // (rh * rw * 4))
    if c > cmax:
        outs = [warp_resample_pallas(tex[c0:c0 + cmax], sx, sy,
                                     fallback[c0:c0 + cmax], mode=mode,
                                     wrap_x=wrap_x)
                for c0 in range(0, c, cmax)]
        return jnp.concatenate(outs, axis=0)

    kernel = functools.partial(_warp_kernel, c, n_tap, rh, rw, h, w, mode,
                               whole)
    blk = pl.BlockSpec((BH, BW), lambda i, j: (i, j),
                       memory_space=pltpu.VMEM)
    cblk = pl.BlockSpec((c, BH, BW), lambda i, j: (0, i, j),
                        memory_space=pltpu.VMEM)
    if whole:
        # scratch holds the whole padded map: DMA extents = array extents
        # (no slicing, no alignment constraint beyond the padded shape)
        texp = jnp.pad(texp, ((0, 0), (0, rh - texp.shape[1]),
                              (0, rw - texp.shape[2])))
    out = pl.pallas_call(
        kernel,
        grid=(hb // BH, wb // BW),
        in_specs=[blk, blk, cblk, pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=cblk,
        out_shape=jax.ShapeDtypeStruct((c, hb, wb), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c + 1, BH, BW), jnp.float32),
                        pltpu.VMEM((c, rh, rw), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(syp, sxp, fbp, texp)
    return out[:, :ho, :wo]
