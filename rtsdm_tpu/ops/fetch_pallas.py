"""Fused-direction level-select fetch — the Pallas tier of
ops/ao_shift.fetch_direction.

Why: phase 1 of SVAO (and the HBAO ring) fetches a shifted copy of the
deinterleaved depth planes once per ring direction; the XLA formulation
scans the radius-level table per direction, so the [16, qh, qw] plane set
and the select accumulator stream through HBM  nd x L  times (~10 GB/frame
at 1080p with nd=8, L=32 — the dominant cost of svao_phase1_shift, measured
60.7 ms in BENCH_r02).

This kernel tiles the quarter-res planes, DMAs each tile's halo region into
VMEM ONCE, and runs all nd directions x L levels of the select chain from
VMEM: HBM traffic drops to one (halo-amplified) read of the planes plus one
write of the nd fetched outputs, independent of nd x L.

Mosaic shape (hardware-verified constraints, round 4):
  * halo DMA slices must be (8, 128)-tile-aligned in BOTH origin and
    extents -> extents round up to the tiling (junk over-fetch, sources
    padded to match) and origins are grid-derived multiples;
  * VMEM loads at table-driven offsets must be STATIC: direction rides as
    the fastest grid axis and each direction's body is a `pl.when(i == d)`
    branch whose slice table entries are Python ints (a direction-indexed
    SMEM table compiles to dynamic vector.loads Mosaic rejects: "cannot
    statically prove that index in dimension 1 is a multiple of 8");
  * the select chain is PLANAR per class — stacking 16 classes per level
    ([16,TH,TW] temporaries per level per direction) blew the Mosaic stack
    allocator past the 16 MB scoped-VMEM limit (30.75M measured).

Semantics are bit-identical to fetch_direction: the same static offset
tables (cross-class remap: a full-res offset from class c lands in class
c2 = ((cy+dy)%4)*4 + (cx+dx)%4 at quarter offset (cy+dy)//4) and the SAME
per-pixel level index — computed by the caller-side XLA tier
(shift_level_index) and fed to the kernel as an int32 plane set, so the
two tiers cannot diverge on level rounding.

Reference equivalent: the texture-unit fetches of SVAORaster.ps.slang's
sample ring — the TPU has no texture units, so the fetch becomes a
VMEM-resident select chain.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, TW = 32, 128  # output tile (quarter-res texels)


def _dma_extents(pad):
    """Halo DMA slice extents rounded up to the (8, 128) VMEM tiling —
    Mosaic rejects memref slices whose extents are not tile-aligned
    ("Slice shape along dimension 1 must be aligned to tiling (8)").
    The extra rows/cols are junk over-fetch; sources are padded to match."""
    rh = -(-(TH + 2 * pad) // 8) * 8
    rw = -(-(TW + 2 * pad) // 128) * 128
    return rh, rw


def _class_groups(offs, pad):
    """Static per-(dir, class) slice-select groups: consecutive levels with
    the same (source class, local dy, local dx) collapse into one
    (lo_level, hi_level, c2, y, x) select — exactly the table
    fetch_direction builds, deduplicated."""
    nd = len(offs)
    groups = []
    for i in range(nd):
        per_c = []
        for c in range(16):
            cy, cx = c // 4, c % 4
            g = []
            for l, (dy, dx) in enumerate(offs[i][c]):
                c2 = ((cy + dy) % 4) * 4 + ((cx + dx) % 4)
                y = pad + max(-pad, min(pad, (cy + dy) // 4))
                x = pad + max(-pad, min(pad, (cx + dx) // 4))
                if g and g[-1][2:] == (c2, y, x):
                    g[-1] = (g[-1][0], l, c2, y, x)
                else:
                    g.append((l, l, c2, y, x))
            per_c.append(tuple(tuple(e) for e in g))
        groups.append(tuple(per_c))
    return tuple(groups)


def _select_chain(big, lv, groups_c):
    """Planar select chain for one class: big [..., rh, rw] VMEM-resident
    halo, lv [TH, TW] int32 level plane, groups_c static (lo, hi, *, y, x).
    Returns the fetched [..., TH, TW] plane (leading dims broadcast)."""
    acc = None
    for (lo, hi, _c2, y, x) in groups_c:
        sl = big[..., y:y + TH, x:x + TW]
        m = (lv == lo) if lo == hi else (lv >= lo) & (lv <= hi)
        if big.ndim == 3:
            m = m[None]
        acc = sl if acc is None else jnp.where(m, sl, acc)
    return acc


def _fetch_fused_kernel(branches, pad, n_src, lvl_ref, *refs):
    """Grid (by, bx, tap) — tap FASTEST so the halo DMA (gated on i == 0;
    scratch persists across grid steps) runs once per tile. branches:
    static ((t0, t1, per_class_groups), ...) — taps [t0, t1) share one
    offset table and differ only in their level plane (SVAO: one tap per
    direction; HBAO: NUM_STEPS taps per direction).
    lvl_ref: [1, 16, TH, TW] int32 level plane for tap i.
    refs: n_src HBM plane sets, out [n_src, 1, 16, TH, TW],
    scratch [n_src][16, rh, rw] (tile-aligned halo extents), sems."""
    src_hbm = refs[:n_src]
    out_ref = refs[n_src]
    scratch = refs[n_src + 1:n_src + 1 + n_src]
    sems = refs[-1]
    by = pl.program_id(0)
    bx = pl.program_id(1)
    i = pl.program_id(2)
    rh, rw = _dma_extents(pad)

    @pl.when(i == 0)
    def _dma():
        for s in range(n_src):
            pltpu.make_async_copy(
                src_hbm[s].at[:, pl.ds(by * TH, rh), pl.ds(bx * TW, rw)],
                scratch[s], sems.at[s]).start()
        for s in range(n_src):
            pltpu.make_async_copy(
                src_hbm[s].at[:, pl.ds(by * TH, rh), pl.ds(bx * TW, rw)],
                scratch[s], sems.at[s]).wait()

    for (t0, t1, groups) in branches:
        cond = (i == t0) if t1 == t0 + 1 else ((i >= t0) & (i < t1))

        @pl.when(cond)
        def _body(groups=groups):
            for s in range(n_src):
                big = scratch[s][...]               # [16, rh, rw]
                for c in range(16):
                    lv = lvl_ref[0, c]
                    out_ref[s, 0, c] = _fetch_one(big, lv, groups[c])


def _fetch_one(big, lv, groups_c):
    """One class of the fused fetch: selects among per-group source-class
    planes (each group reads a DIFFERENT class plane c2)."""
    acc = None
    for (lo, hi, c2, y, x) in groups_c:
        sl = big[c2, y:y + TH, x:x + TW]
        m = (lv == lo) if lo == hi else (lv >= lo) & (lv <= hi)
        acc = sl if acc is None else jnp.where(m, sl, acc)
    return acc


def _fetch_call_core(padded_sets, lvl, branches, pad, qh, qw, nt=None):
    """Shared pallas_call: padded_sets [16, qh+2p, qw+2p] each, lvl
    [NL, 16, hp, wp] int32 level planes (tap i reads plane i % NL — lets
    taps that share a level plane share the array), branches static.
    Returns [n_src, NT, 16, qh, qw]."""
    n_src = len(padded_sets)
    nl = lvl.shape[0]
    if nt is None:
        nt = nl
    hp = qh + (-qh) % TH
    wp = qw + (-qw) % TW
    # re-pad note: padded_sets are already halo-padded [16, qh+2p, qw+2p];
    # extend on the high side for tile alignment AND for the rounded DMA
    # extents (the last tile's over-fetch must stay in bounds)
    rh, rw = _dma_extents(pad)
    sets = [jnp.pad(s, ((0, 0), (0, hp - qh + rh - TH - 2 * pad),
                        (0, wp - qw + rw - TW - 2 * pad)))
            for s in padded_sets]
    nby, nbx = hp // TH, wp // TW

    kernel = functools.partial(_fetch_fused_kernel, branches, pad, n_src)
    lvl_spec = pl.BlockSpec((1, 16, TH, TW),
                            lambda j, l, i: (i % nl, 0, j, l),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((n_src, 1, 16, TH, TW),
                            lambda j, l, i: (0, i, 0, j, l),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nby, nbx, nt),
        in_specs=[lvl_spec] + [pl.BlockSpec(memory_space=pl.ANY)] * n_src,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_src, nt, 16, hp, wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, rh, rw), jnp.float32)
                        for _ in range(n_src)]
        + [pltpu.SemaphoreType.DMA((n_src,))],
    )(lvl, *sets)
    return out[..., :qh, :qw]


@functools.partial(jax.jit,
                   static_argnames=("pad", "levels_key", "offs_key",
                                    "radii_key", "nd"))
def _fetch_fused_call(padded_sets, radius_q, *, pad, levels_key, offs_key,
                      radii_key, nd):
    # levels/offs/radii ride as hashable static keys (tuples) — they derive
    # from cfg + static tables only
    levels = np.asarray(levels_key, np.float32)
    offs = offs_key
    bounds = tuple(float(b) for b in
                   np.sqrt(levels[:-1].astype(np.float64)
                           * levels[1:].astype(np.float64)))
    groups = _class_groups(offs, pad)
    branches = tuple((d, d + 1, groups[d]) for d in range(nd))
    qh, qw = radius_q.shape[1:]
    hp = qh + (-qh) % TH
    wp = qw + (-qw) % TW
    radius_p = jnp.pad(radius_q, ((0, 0), (0, hp - qh), (0, wp - qw)))
    # per-direction level plane (the XLA tier's shift_level_index, exactly:
    # same bounds, same float32 multiply) — int32 [nd, 16, hp, wp]
    lvl = jnp.stack([
        sum(((radius_p * float(r) > b).astype(jnp.int32) for b in bounds),
            start=jnp.zeros((16, hp, wp), jnp.int32))
        for r in radii_key])
    return _fetch_call_core(padded_sets, lvl, branches, pad, qh, qw)


def fetch_all_directions(padded_sets, pad, radius_px_q, levels, offs, radii):
    """All-direction fetch for every plane set.

    padded_sets: list of [16, qh+2p, qw+2p] (ao_shift.pad_planes output);
    radius_px_q: [16, qh, qw] (deinterleaved radius_px);
    levels/offs/radii: ao_shift.offset_tables output.
    Returns list over sets of [nd, 16, qh, qw] — entry [i] bit-identical to
    fetch_direction(set, pad, shift_level_index(levels, radius*radii[i]),
    offs[i], qh, qw)."""
    nd = len(offs)
    levels_key = tuple(float(x) for x in levels)
    offs_key = tuple(tuple(tuple((int(dy), int(dx)) for (dy, dx) in cl)
                           for cl in d) for d in offs)
    radii_key = tuple(float(r) for r in radii)
    out = _fetch_fused_call(tuple(padded_sets), radius_px_q, pad=pad,
                            levels_key=levels_key, offs_key=offs_key,
                            radii_key=radii_key, nd=nd)
    return [out[s] for s in range(len(padded_sets))]


def _same_class_groups(offs_per_dir, pad):
    """Per-direction per-class select groups WITHOUT cross-class remap
    (HBAO samples within one deinterleave slice, HBAO.ps.slang:165):
    offs_per_dir[d][c] = [(dy, dx)] per level, quarter-res units."""
    out = []
    for offs_c in offs_per_dir:
        per_c = []
        for c in range(16):
            g = []
            for l, (dy, dx) in enumerate(offs_c[c]):
                y = pad + max(-pad, min(pad, int(dy)))
                x = pad + max(-pad, min(pad, int(dx)))
                if g and g[-1][2:] == (c, y, x):
                    g[-1] = (g[-1][0], l, c, y, x)
                else:
                    g.append((l, l, c, y, x))
            per_c.append(tuple(tuple(e) for e in g))
        out.append(tuple(per_c))
    return tuple(out)


@functools.partial(jax.jit, static_argnames=("pad", "offs_key",
                                             "taps_per_dir"))
def fetch_taps_same_class(padded_sets, lvl_taps, *, pad, offs_key,
                          taps_per_dir):
    """Fetch NT = n_dirs * taps_per_dir taps from each plane set with ONE
    halo DMA per tile (the HBAO ring: 8 directions x NUM_STEPS steps x 28
    levels of _fetch_slices as XLA is ~16k tiny ops — measured 57.7 ms of
    config 1's 66 ms at 256x256; here every tap is a VMEM select chain).

    padded_sets: list of [16, qh+2p, qw+2p] (ao_shift.pad_planes);
    lvl_taps: [taps_per_dir, 16, qh, qw] int32 per-STEP level planes (the
    HBAO march length is direction-independent, so tap t = d*taps_per_dir
    + k reads plane k — the kernel shares the planes across directions);
    offs_key: static tuple [n_dirs][16][(dy, dx) per level], quarter-res.
    Returns [n_src, NT, 16, qh, qw] — entry [s, d*taps_per_dir + k]
    bit-identical to passes/hbao._fetch_slices(padded_sets[s], pad,
    lvl_taps[k], offs for direction d, qh, qw)."""
    groups = _same_class_groups(offs_key, pad)
    branches = tuple((d * taps_per_dir, (d + 1) * taps_per_dir, groups[d])
                     for d in range(len(offs_key)))
    qh, qw = lvl_taps.shape[2:]
    hp = qh + (-qh) % TH
    wp = qw + (-qw) % TW
    lvl_p = jnp.pad(lvl_taps, ((0, 0), (0, 0), (0, hp - qh), (0, wp - qw)))
    return _fetch_call_core(padded_sets, lvl_p, branches, pad, qh, qw,
                            nt=len(offs_key) * taps_per_dir)


# ---------------------------------------------------------------------------
# SD-map variant (phase 2): k depth slots per texel, divisor-4 geometry.
# fetch_sd_direction streams acc [16,k,qh,qw] through HBM once per level
# group per direction (~10 GB/frame at 1080p, the bulk of phase 2); here one
# halo DMA per TILE serves all directions x levels from VMEM (direction is
# the fastest grid axis, each direction a static pl.when branch).


def _sd_tables(offs, guard, pad, sd_h, sd_w, qh, qw):
    """Static per-(dir, level, class) TILE-LOCAL slice origin, derived from
    the global origin fetch_sd_direction uses for divisor=4 (stride 1: sd
    texel of full-res pixel 4q+c+d = q + (c+d)//4 + guard; the whole output
    plane is one shifted slice, so local = global - (guard - pad)).

    Returns (tab, ok): ok=False when a global edge clamp pushes an origin
    outside the tile halo (tiny SD maps with guard < pad) — the caller then
    falls back to the XLA tier."""
    nd = len(offs)
    n_levels = len(offs[0][0])
    tab = np.zeros((nd, n_levels, 16, 2), np.int32)
    ok = True
    for i in range(nd):
        for c in range(16):
            cy, cx = c // 4, c % 4
            for l, (dy, dx) in enumerate(offs[i][c]):
                y0 = max(0, min((cy + dy) // 4 + guard, sd_h - 1 - (qh - 1)))
                x0 = max(0, min((cx + dx) // 4 + guard, sd_w - 1 - (qw - 1)))
                ly = y0 - guard + pad
                lx = x0 - guard + pad
                if not (0 <= ly <= 2 * pad and 0 <= lx <= 2 * pad):
                    ok = False
                tab[i, l, c] = (max(0, min(ly, 2 * pad)),
                                max(0, min(lx, 2 * pad)))
    return tab, ok


def _sd_groups(tab):
    """Dedup consecutive levels with identical local origins into
    (lo, hi, None, y, x) select groups per (dir, class)."""
    nd, n_levels = tab.shape[:2]
    groups = []
    for i in range(nd):
        per_c = []
        for c in range(16):
            g = []
            for l in range(n_levels):
                y, x = int(tab[i, l, c, 0]), int(tab[i, l, c, 1])
                if g and g[-1][3:] == (y, x):
                    g[-1] = (g[-1][0], l, None, y, x)
                else:
                    g.append((l, l, None, y, x))
            per_c.append(tuple(tuple(e) for e in g))
        groups.append(tuple(per_c))
    return tuple(groups)


def _fetch_sd_kernel(kp, nd, pad, gy, gx, groups,
                     lvl_ref, sd_hbm, out_ref, scratch, sem):
    by = pl.program_id(0)
    bx = pl.program_id(1)
    i = pl.program_id(2)                            # direction: FASTEST axis

    # tile origin in SD rows: out row ty+y maps to sd row y0 + ty + y with
    # y0 in [guard-pad, guard+pad] (clamping only bites at the map edge,
    # where the guard band is dead anyway). Scratch persists across grid
    # steps and direction is the fastest axis, so the halo DMA runs once
    # per TILE, not once per (direction, tile). gy/gx are the axis-specific
    # padded guards, chosen by the caller so y_lo/x_lo are (8,128)-aligned
    # and the extents are tile-aligned (Mosaic slice rules).
    rh, rw = _dma_extents(pad)

    @pl.when(i == 0)
    def _dma():
        y_lo = by * TH + gy - pad
        x_lo = bx * TW + gx - pad
        cp = pltpu.make_async_copy(
            sd_hbm.at[:, pl.ds(y_lo, rh), pl.ds(x_lo, rw)],
            scratch, sem)
        cp.start()
        cp.wait()

    for d in range(nd):
        @pl.when(i == d)
        def _body(d=d):
            for c in range(16):
                lv = lvl_ref[0, c]
                # hoist the G group masks once per class, then run one 2D
                # select chain per PACKED plane: the k-proportional select
                # traffic was the kernel's whole cost (k=1 5.4 ms vs k=4
                # 28.9 ms measured 2026-08-19), and [k,TH,TW] 3D slice
                # selects lower worse than per-plane 2D chains
                masks = []
                for (lo, hi, _c2, y, x) in groups[d][c]:
                    masks.append((lv == lo) if lo == hi
                                 else (lv >= lo) & (lv <= hi))
                for kk in range(kp):
                    acc = None
                    for (m, (lo, hi, _c2, y, x)) in zip(masks, groups[d][c]):
                        sl = scratch[kk, y:y + TH, x:x + TW]
                        acc = sl if acc is None else jnp.where(m, sl, acc)
                    out_ref[0, c, kk] = acc


def unpack_sd16(packed, kk):
    """Layer kk of a 16-bit-pair packed SD plane set (fetch_sd_packed
    output): [..., kp, h, w] int32 -> [..., h, w] float in [0, 1]. Pure
    elementwise — fuses into the eval consumer, so the unpacked [nd, 16,
    k, qh, qw] tensor never materializes (stacking it cost ~7 ms at 1080p,
    measured 2026-08-19: 22.1 ms with the stack vs the kp-plane kernel's
    ~15 ms)."""
    p = packed[..., kk // 2, :, :]
    v = (p & 0xFFFF) if kk % 2 == 0 else jax.lax.shift_right_logical(p, 16)
    # true division (not reciprocal-multiply): fp32(n)/65535 is correctly
    # rounded where the backend divide is IEEE (CPU: bit-equal to the grid
    # value fp32(n/65535) the ray tier stored; reciprocal-multiply missed
    # by 1 ulp on ~0.1% of texels even there). TPU fp32 divide is
    # reciprocal-based and can miss by <=1 ulp on ~0.7% of texels
    # (hardware smoke 2026-08-19: max abs 6e-8) — the on-device parity
    # gate therefore allows 1 ulp; CPU tests stay bit-exact.
    return v.astype(jnp.float32) / 65535.0


def fetch_sd_all_directions(sd_map, guard, radius_px_q, levels, offs, radii,
                            pad):
    """Unpacked-contract wrapper over fetch_sd_packed: returns [nd, 16, k,
    qh, qw] float — entry [i] equals ao_shift.fetch_sd_direction(sd_map,
    lvl_p_i, offs[i], guard, qh, qw, 4) up to 16-bit depth quantization
    (bit-exact when the inputs sit on the 16-bit grid, i.e. for the ray SD
    tier). Hot callers (svao_phase2_shift) use fetch_sd_packed +
    unpack_sd16 directly so the unpack fuses into the eval."""
    out = fetch_sd_packed(sd_map, guard, radius_px_q, levels, offs, radii,
                          pad)
    if out is None:
        return None
    k = sd_map.shape[-1]
    nd = out.shape[0]
    qh, qw = out.shape[-2:]
    full = jnp.stack([unpack_sd16(out, kk) for kk in range(2 * out.shape[2])],
                     axis=2)
    return full[:, :, :k]


def fetch_sd_packed(sd_map, guard, radius_px_q, levels, offs, radii, pad):
    """All-direction SD fetch, divisor=4 only. sd_map: [sd_h, sd_w, k]
    guard-banded NORMALIZED depths in [0, 1]; returns 16-bit-PAIR-packed
    planes [nd, 16, ceil(k/2), qh, qw] int32 (layer 2j in bits 0-15 of
    plane j, layer 2j+1 in bits 16-31) — see unpack_sd16. Caller falls
    back to the XLA tier for divisor 1/2.

    16-bit pair packing: the select-chain traffic is proportional to the
    plane count, and the RAY SD tier already quantizes depths to 16 bits in
    the reservoir pack (ops/rt.py _pack_key_depth) — so pairs of layers
    ride one int32 plane through the chain (bit-exact for the ray tier,
    <=1/65535 normalized-depth rounding for the raster tier; measured
    k=4 28.9 -> 2-plane packed kernel, 2026-08-19)."""
    nd = len(offs)
    qh, qw = radius_px_q.shape[1:]
    k = sd_map.shape[-1]
    kp = (k + 1) // 2
    d16 = jnp.clip(jnp.round(jnp.moveaxis(sd_map, -1, 0) * 65535.0),
                   0.0, 65535.0).astype(jnp.int32)   # [k, sd_h, sd_w]
    if k % 2:
        d16 = jnp.concatenate([d16, jnp.zeros_like(d16[:1])], axis=0)
    sd_pl = d16[0::2] | (d16[1::2] << 16)            # [kp, sd_h, sd_w]
    sd_h, sd_w = sd_pl.shape[1:]
    bounds = tuple(float(b) for b in
                   np.sqrt(np.asarray(levels[:-1], np.float64)
                           * np.asarray(levels[1:], np.float64)))
    tab, ok = _sd_tables(offs, guard, pad, sd_h, sd_w, qh, qw)
    if not ok:
        return None
    groups = _sd_groups(tab)

    hp = qh + (-qh) % TH
    wp = qw + (-qw) % TW
    radius_p = jnp.pad(radius_px_q, ((0, 0), (0, hp - qh), (0, wp - qw)))
    # per-direction level planes, computed exactly as shift_level_index
    lvl = jnp.stack([
        sum(((radius_p * float(r) > b).astype(jnp.int32) for b in bounds),
            start=jnp.zeros((16, hp, wp), jnp.int32))
        for r in radii])
    rh, rw = _dma_extents(pad)
    # pad the SD planes low so the DMA origin constants (guard - pad) are
    # tile-aligned per axis (Mosaic: dynamic slice offsets/extents must
    # respect the (8, 128) tiling), and high so the rounded extents stay in
    # bounds. Scratch row 0 still maps to original SD row (tile + guard-pad)
    # on both axes, so the slice tables are unchanged.
    lo_y = max(0, pad - guard)
    while (guard + lo_y - pad) % 8:
        lo_y += 1
    lo_x = max(0, pad - guard)
    while (guard + lo_x - pad) % 128:
        lo_x += 1
    hi_y = max(0, hp - TH + rh + guard - pad - sd_h)
    hi_x = max(0, wp - TW + rw + guard - pad - sd_w)
    sd_pad = jnp.pad(sd_pl, ((0, 0), (lo_y, hi_y), (lo_x, hi_x)),
                     mode="edge")
    gy, gx = guard + lo_y, guard + lo_x

    nby, nbx = hp // TH, wp // TW
    kernel = functools.partial(_fetch_sd_kernel, kp, nd, pad, gy, gx, groups)
    lvl_spec = pl.BlockSpec((1, 16, TH, TW), lambda j, l, i: (i, 0, j, l),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 16, kp, TH, TW),
                            lambda j, l, i: (i, 0, 0, j, l),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nby, nbx, nd),
        in_specs=[lvl_spec, pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nd, 16, kp, hp, wp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((kp, rh, rw), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
    )(lvl, sd_pad)
    return out[..., :qh, :qw]
