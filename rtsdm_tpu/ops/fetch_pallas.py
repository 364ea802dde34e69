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

Semantics are bit-identical to fetch_direction: the same static offset
tables (cross-class remap: a full-res offset from class c lands in class
c2 = ((cy+dy)%4)*4 + (cx+dx)%4 at quarter offset (cy+dy)//4), the same
per-pixel level index (shift_level_index of radius_px * r_frac[i]).

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


def _class_tables(offs, pad):
    """Static per-(dir, class, level) (source class, local dy, local dx)
    exactly as fetch_direction builds them."""
    nd = len(offs)
    n_levels = len(offs[0][0])
    tab = np.zeros((nd, n_levels, 16, 3), np.int32)
    for i in range(nd):
        for c in range(16):
            cy, cx = c // 4, c % 4
            for l, (dy, dx) in enumerate(offs[i][c]):
                c2 = ((cy + dy) % 4) * 4 + ((cx + dx) % 4)
                qdy = max(-pad, min(pad, (cy + dy) // 4))
                qdx = max(-pad, min(pad, (cx + dx) // 4))
                tab[i, l, c] = (c2, pad + qdy, pad + qdx)
    return tab


def _fetch_fused_kernel(nd, n_levels, pad, tab, bounds, r_frac, n_src,
                        radius_ref, *refs):
    """Grid (by, bx). radius_ref: [16, TH, TW] full-res radius_px per
    quarter texel. refs: n_src HBM plane sets, out [n_src, nd, 16, TH, TW],
    scratch [n_src][16, TH+2p, TW+2p], sems."""
    src_hbm = refs[:n_src]
    out_ref = refs[n_src]
    scratch = refs[n_src + 1:n_src + 1 + n_src]
    sems = refs[-1]
    by = pl.program_id(0)
    bx = pl.program_id(1)

    for s in range(n_src):
        pltpu.make_async_copy(
            src_hbm[s].at[:, pl.ds(by * TH, TH + 2 * pad),
                          pl.ds(bx * TW, TW + 2 * pad)],
            scratch[s], sems.at[s]).start()
    for s in range(n_src):
        pltpu.make_async_copy(
            src_hbm[s].at[:, pl.ds(by * TH, TH + 2 * pad),
                          pl.ds(bx * TW, TW + 2 * pad)],
            scratch[s], sems.at[s]).wait()

    radius = radius_ref[...]                       # [16, TH, TW]
    for i in range(nd):
        m = radius * r_frac[i]
        lvl = jnp.zeros((16, TH, TW), jnp.int32)
        for b in bounds:                           # shift_level_index
            lvl = lvl + (m > b).astype(jnp.int32)
        for s in range(n_src):
            acc = jnp.zeros((16, TH, TW), jnp.float32)
            big = scratch[s][...]
            for l in range(n_levels):
                planes = [big[tab[i, l, c, 0],
                              tab[i, l, c, 1]:tab[i, l, c, 1] + TH,
                              tab[i, l, c, 2]:tab[i, l, c, 2] + TW]
                          for c in range(16)]
                acc = jnp.where(lvl == l, jnp.stack(planes), acc)
            out_ref[s, i] = acc


@functools.partial(jax.jit,
                   static_argnames=("pad", "levels_key", "offs_key",
                                    "radii_key", "nd"))
def _fetch_fused_call(padded_sets, radius_q, *, pad, levels_key, offs_key,
                      radii_key, nd):
    # levels/offs/radii ride as hashable static keys (tuples) — they derive
    # from cfg + static tables only
    levels = np.asarray(levels_key, np.float32)
    offs = offs_key
    n_src = len(padded_sets)
    n_levels = len(levels)
    bounds = tuple(float(b) for b in
                   np.sqrt(levels[:-1].astype(np.float64)
                           * levels[1:].astype(np.float64)))
    tab = _class_tables(offs, pad)
    r_frac = radii_key
    qh, qw = radius_q.shape[1:]
    hp = qh + (-qh) % TH
    wp = qw + (-qw) % TW
    radius_p = jnp.pad(radius_q, ((0, 0), (0, hp - qh), (0, wp - qw)))
    sets = [jnp.pad(s, ((0, 0), (0, hp - qh), (0, wp - qw)))
            for s in padded_sets]
    # re-pad note: padded_sets are already halo-padded [16, qh+2p, qw+2p];
    # extend the tile-alignment pad on the high side only
    nby, nbx = hp // TH, wp // TW

    kernel = functools.partial(_fetch_fused_kernel, nd, n_levels, pad, tab,
                               bounds, r_frac, n_src)
    rad_spec = pl.BlockSpec((16, TH, TW), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((n_src, nd, 16, TH, TW),
                            lambda i, j: (0, 0, 0, i, j),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nby, nbx),
        in_specs=[rad_spec] + [pl.BlockSpec(memory_space=pl.ANY)] * n_src,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_src, nd, 16, hp, wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, TH + 2 * pad, TW + 2 * pad),
                                   jnp.float32) for _ in range(n_src)]
        + [pltpu.SemaphoreType.DMA((n_src,))],
    )(radius_p, *sets)
    return out[..., :qh, :qw]


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


# ---------------------------------------------------------------------------
# SD-map variant (phase 2): k depth slots per texel, divisor-4 geometry.
# fetch_sd_direction streams acc [16,k,qh,qw] through HBM once per level
# group per direction (~10 GB/frame at 1080p, the bulk of phase 2); here one
# halo DMA per TILE serves all directions x levels from VMEM (direction is
# the fastest grid axis; scratch persists across grid steps, and the
# per-direction slice origins ride in SMEM indexed by program_id).


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


def _fetch_sd_kernel(k, n_levels, pad, guard, bounds,
                     tab_ref, rfrac_ref, radius_ref, sd_hbm, out_ref,
                     scratch, sem):
    by = pl.program_id(0)
    bx = pl.program_id(1)
    i = pl.program_id(2)                            # direction: FASTEST axis

    # tile origin in SD rows: out row ty+y maps to sd row y0 + ty + y with
    # y0 in [guard-pad, guard+pad] (clamping only bites at the map edge,
    # where the guard band is dead anyway). Scratch persists across grid
    # steps and direction is the fastest axis, so the halo DMA runs once
    # per TILE, not once per (direction, tile).
    @pl.when(i == 0)
    def _dma():
        y_lo = by * TH + guard - pad
        x_lo = bx * TW + guard - pad
        cp = pltpu.make_async_copy(
            sd_hbm.at[:, pl.ds(y_lo, TH + 2 * pad),
                      pl.ds(x_lo, TW + 2 * pad)],
            scratch, sem)
        cp.start()
        cp.wait()

    radius = radius_ref[...]                        # [16, TH, TW]

    # the per-direction radius fraction and slice origins ride in SMEM
    # indexed by program_id: each direction body is traced and run ONCE per
    # grid step (the previous compute-all-directions-select-one form did
    # nd x the VPU work per block)
    m = radius * rfrac_ref[i]
    lvl = jnp.zeros((16, TH, TW), jnp.int32)
    for b in bounds:
        lvl = lvl + (m > b).astype(jnp.int32)
    acc = jnp.zeros((16, k, TH, TW), jnp.float32)
    for l in range(n_levels):
        sls = []
        for c in range(16):
            dy = tab_ref[i, l, c, 0]
            dx = tab_ref[i, l, c, 1]
            sls.append(scratch[:, pl.ds(dy, TH), pl.ds(dx, TW)])
        sl = jnp.stack(sls)                         # [16,k,TH,TW]
        acc = jnp.where((lvl == l)[:, None], sl, acc)
    out_ref[...] = acc[None]


def fetch_sd_all_directions(sd_map, guard, radius_px_q, levels, offs, radii,
                            pad):
    """All-direction SD fetch, divisor=4 only. sd_map: [sd_h, sd_w, k]
    guard-banded; returns [nd, 16, k, qh, qw] — entry [i] equals
    ao_shift.fetch_sd_direction(sd_map, lvl_p_i, offs[i], guard, qh, qw, 4).
    Caller falls back to the XLA tier for divisor 1/2."""
    nd = len(offs)
    qh, qw = radius_px_q.shape[1:]
    k = sd_map.shape[-1]
    sd_pl = jnp.moveaxis(sd_map, -1, 0)             # [k, sd_h, sd_w]
    sd_h, sd_w = sd_pl.shape[1:]
    n_levels = len(levels)
    bounds = tuple(float(b) for b in
                   np.sqrt(np.asarray(levels[:-1], np.float64)
                           * np.asarray(levels[1:], np.float64)))
    r_frac = tuple(float(r) for r in radii)
    tab, ok = _sd_tables(offs, guard, pad, sd_h, sd_w, qh, qw)
    if not ok:
        return None

    hp = qh + (-qh) % TH
    wp = qw + (-qw) % TW
    radius_p = jnp.pad(radius_px_q, ((0, 0), (0, hp - qh), (0, wp - qw)))
    # pad the SD planes so every halo DMA is in bounds: rows up to
    # hp + guard + pad, plus pad below guard-pad if guard < pad
    lo = max(0, pad - guard)
    hi_y = max(0, hp + guard + pad - sd_h + lo)
    hi_x = max(0, wp + guard + pad - sd_w + lo)
    sd_pad = jnp.pad(sd_pl, ((0, 0), (lo, hi_y), (lo, hi_x)), mode="edge")
    guard_k = guard + lo

    nby, nbx = hp // TH, wp // TW
    kernel = functools.partial(_fetch_sd_kernel, k, n_levels, pad, guard_k,
                               bounds)
    rad_spec = pl.BlockSpec((16, TH, TW), lambda j, l, i: (0, j, l),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 16, k, TH, TW),
                            lambda j, l, i: (i, 0, 0, j, l),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nby, nbx, nd),
        in_specs=[smem, smem, rad_spec, pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nd, 16, k, hp, wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, TH + 2 * pad, TW + 2 * pad),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(jnp.asarray(tab, jnp.int32),
      jnp.asarray(np.asarray(r_frac, np.float32)), radius_p, sd_pad)
    return out[..., :qh, :qw]
