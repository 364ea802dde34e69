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
        in_specs=[rad_spec] + [pl.BlockSpec(memory_space=pltpu.ANY)] * n_src,
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
