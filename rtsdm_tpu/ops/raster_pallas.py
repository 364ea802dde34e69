"""Pallas TPU visibility-raster kernel — the at-scale tier of ops/raster.py.

The XLA rasterizer's triangle->tile binning is a [tiles x T] mask + cumsum +
scatter; at reference scale that scatter dominates the whole frame
(measured: 10.0 s of a 10.1 s SunTemple raster at 2944x2104 / 323k tris —
setup 84 ms, tile z-splat 85 ms, binning ~9.9 s). TPU scatters never get
fast; instead this kernel reuses the stochastic-depth streaming
architecture (ops/rt_pallas.py):

  * triangles -> screen-space edge coefficients once in XLA
    (ops/raster.py:_setup_triangles — shared, so accept/z rules stay
    bit-identical with the XLA tier),
  * coefficient CHUNKS of TC=128 triangles live in HBM [n_chunks, 16, TC];
    per-chunk screen bboxes come from one XLA reduce,
  * each kernel block owns an 8x32-pixel tile ([RB,1] sublane column);
    a per-block compacted chunk list (top_k, scatter-free — the same
    'TLAS walk' as build_chunk_lists but in 2D screen space) bounds the
    work to overlapping chunks,
  * per chunk the [RB, TC] edge/z evaluation reduces to the block's
    running z-buffer with lane min + lowest-lane argmin extraction —
    closest-hit instead of the SD kernel's reservoir, same skeleton.

Reference: the D3D12 raster pipeline this replaces is
Source/RenderPasses/GBuffer/ (draw calls + hardware z); the chunked
traversal mirrors Scene::rasterize draw-range submission (Scene.cpp:3302).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raster import CULL_MODES, _setup_triangles
from .rt_pallas import (LIST_CAP, NSLOT, RB, TC, TILE_RH, TILE_RW, pad_tile,
                        tile_flatten, tile_unflatten)

COEF_ROWS = 17  # c0(3) c1(3) c2(3) zc(3) wc(3) valid(1) orig_id(1)

_BIG = jnp.float32(3e38)


def screen_morton_order(bbox, valid, width, height):
    """Sort-middle key: 2D morton code of the triangle's screen bbox center.
    The scene's 3D-morton chunk order projects to LARGE screen bboxes (a
    128-triangle chunk spans its whole 3D cell's projection), so blocks
    visit far too many chunks (measured 1.8 s at SunTemple 2944x2104).
    Re-sorting per frame by screen position makes chunks screen-compact —
    the 'sort-middle' stage of a classic parallel rasterizer, done as one
    argsort instead of a binning scatter. Invalid triangles sort last, so
    trailing chunks are empty and overlap nothing."""
    cx = jnp.clip((bbox[:, 0] + bbox[:, 2]) * (0.5 * 1024.0 / width),
                  0.0, 1023.0).astype(jnp.int32)
    cy = jnp.clip((bbox[:, 1] + bbox[:, 3]) * (0.5 * 1024.0 / height),
                  0.0, 1023.0).astype(jnp.int32)

    def spread(v):  # interleave 10 bits with zeros
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    key = spread(cx) | (spread(cy) << 1)
    key = jnp.where(valid, key, jnp.int32(2**30))
    return jnp.argsort(key)


def pack_coef_chunks(coef, valid, orig_id):
    """[T,5,3] coefficients + [T] valid + [T] original triangle ids ->
    [n_chunks, COEF_ROWS, TC] HBM array for the streaming kernel (padded
    triangles invalid). orig_id rides as a float row (exact to 2^24)."""
    t = coef.shape[0]
    tp = t + ((-t) % TC)
    n_chunks = tp // TC
    flat = jnp.pad(coef.reshape(t, 15), ((0, tp - t), (0, 0)))
    v = jnp.pad(valid.astype(jnp.float32), (0, tp - t))
    oid = jnp.pad(orig_id.astype(jnp.float32), (0, tp - t))
    rows = jnp.concatenate([flat, v[:, None], oid[:, None]], axis=1)
    return rows.T.reshape(COEF_ROWS, n_chunks, TC).transpose(1, 0, 2)


def chunk_screen_bboxes(bbox, valid):
    """Per-chunk screen bbox [4, n_chunks] (x0,y0,x1,y1); invalid triangles
    don't extend the bounds (empty chunk -> inverted bbox, overlaps
    nothing)."""
    t = bbox.shape[0]
    tp = t + ((-t) % TC)
    n_chunks = tp // TC
    bb = jnp.pad(bbox, ((0, tp - t), (0, 0)))
    va = jnp.pad(valid, (0, tp - t))[:, None]
    bb = bb.reshape(n_chunks, TC, 4)
    va = va.reshape(n_chunks, TC, 1)
    lo = jnp.where(va, bb[..., 0:2], _BIG).min(axis=1)     # [nc, 2]
    hi = jnp.where(va, bb[..., 2:4], -_BIG).max(axis=1)
    return jnp.concatenate([lo, hi], axis=1).T             # [4, nc]


def build_chunk_lists_2d(cbox, nby, nbx):
    """Per-pixel-block compacted chunk lists in screen space: block (by,bx)
    covers pixels [bx*32, bx*32+32) x [by*8, by*8+8). Returns
    (lists [nb, LIST_CAP or n_chunks] ascending, counts [nb] unclamped)."""
    n_chunks = cbox.shape[1]
    nb = nby * nbx
    by = (jnp.arange(nb, dtype=jnp.int32) // nbx).astype(jnp.float32)
    bx = (jnp.arange(nb, dtype=jnp.int32) % nbx).astype(jnp.float32)
    x0, y0 = bx * TILE_RW, by * TILE_RH
    x1, y1 = x0 + TILE_RW, y0 + TILE_RH
    overlap = ((cbox[0][None, :] < x1[:, None])
               & (cbox[2][None, :] > x0[:, None])
               & (cbox[1][None, :] < y1[:, None])
               & (cbox[3][None, :] > y0[:, None]))
    counts = overlap.sum(axis=1).astype(jnp.int32)
    if n_chunks > LIST_CAP * 2:
        keys = jnp.where(overlap,
                         jnp.int32(n_chunks)
                         - jnp.arange(n_chunks, dtype=jnp.int32)[None, :], 0)
        vals, _ = jax.lax.top_k(keys, LIST_CAP)
        lists = jnp.where(vals > 0, jnp.int32(n_chunks) - vals, 0)
        return lists, counts
    rank = jnp.cumsum(overlap.astype(jnp.int32), axis=1) - 1
    rows = jnp.broadcast_to(jnp.arange(nb)[:, None], (nb, n_chunks))
    cols = jnp.where(overlap, rank, n_chunks)
    lists = jnp.zeros((nb, n_chunks + 1), jnp.int32).at[rows, cols].set(
        jnp.broadcast_to(jnp.arange(n_chunks, dtype=jnp.int32)[None, :],
                         (nb, n_chunks)), mode="drop")[:, :n_chunks]
    return lists, counts


def _raster_kernel(n_chunks, use_floor, min_separation,
                   count_ref, list_ref, px_ref, py_ref, floor_ref,
                   coef_hbm,
                   z_out, id_out, b1_out, b2_out,
                   scratch, sems):
    px = jnp.broadcast_to(jnp.reshape(px_ref[...], (RB, 1)), (RB, TC))
    py = jnp.broadcast_to(jnp.reshape(py_ref[...], (RB, 1)), (RB, TC))
    if use_floor:
        floor = jnp.broadcast_to(jnp.reshape(floor_ref[...], (RB, 1)),
                                 (RB, TC))

    raw = count_ref[0, 0, 0]
    full = raw > list_ref.shape[-1]
    cnt = jnp.where(full, n_chunks, raw)

    def get_dma(slot, j):
        ci = jnp.where(full, j,
                       list_ref[0, 0, jnp.minimum(j, list_ref.shape[-1] - 1)])
        return pltpu.make_async_copy(coef_hbm.at[ci], scratch.at[slot],
                                     sems.at[slot])

    lane = jax.lax.broadcasted_iota(jnp.int32, (RB, TC), 1)

    def chunk_math(carry, tri):
        best_z, best_id, best_b1, best_b2 = carry
        # rows: c0 c1 c2 zc wc (xyz each), valid
        e0 = tri[0:1] * px + tri[1:2] * py + tri[2:3]
        e1 = tri[3:4] * px + tri[4:5] * py + tri[5:6]
        e2 = tri[6:7] * px + tri[7:8] * py + tri[8:9]
        zn = tri[9:10] * px + tri[10:11] * py + tri[11:12]
        wd = tri[12:13] * px + tri[13:14] * py + tri[14:15]
        va = tri[15:16] > 0.0
        # identical accept rules to ops/raster.py:_raster_tiles (tolerance
        # re-covers shared-edge cracks; z-test resolves the double-hit)
        tol = -1e-5 * (jnp.abs(e0) + jnp.abs(e1) + jnp.abs(e2))
        inside = (e0 >= tol) & (e1 >= tol) & (e2 >= tol) & (wd > 0.0) & va
        z = zn / jnp.where(wd == 0.0, 1.0, wd)
        inside = inside & (z >= 0.0) & (z <= 1.0)
        esum = e0 + e1 + e2
        esum = jnp.where(esum == 0.0, 1.0, esum)
        if use_floor:
            view_depth = wd / esum
            inside = inside & (view_depth > floor + min_separation)

        zm = jnp.where(inside, z, 2.0)
        zmin = jnp.min(zm, axis=1, keepdims=True)              # [RB,1]
        upd = (zmin < best_z) & (zmin <= 1.0)
        # lowest-lane argmin (deterministic tie-break)
        li = jnp.min(jnp.where(zm == zmin, lane, jnp.int32(TC)),
                     axis=1, keepdims=True)
        sel = lane == li
        b1c = jnp.sum(jnp.where(sel, e1 / esum, 0.0), axis=1, keepdims=True)
        b2c = jnp.sum(jnp.where(sel, e2 / esum, 0.0), axis=1, keepdims=True)
        idc = jnp.sum(jnp.where(sel, tri[16:17], 0.0), axis=1,
                      keepdims=True).astype(jnp.int32)
        return (jnp.where(upd, zmin, best_z),
                jnp.where(upd, idc, best_id),
                jnp.where(upd, b1c, best_b1),
                jnp.where(upd, b2c, best_b2))

    for p0 in range(NSLOT - 1):
        @pl.when(p0 < cnt)
        def _(p0=p0):
            get_dma(p0 % NSLOT, p0).start()

    def loop_body(j, carry):
        slot = j % NSLOT

        @pl.when(j + (NSLOT - 1) < cnt)
        def _():
            get_dma((j + (NSLOT - 1)) % NSLOT, j + (NSLOT - 1)).start()

        get_dma(slot, j).wait()
        return chunk_math(carry, scratch[slot])

    init = (jnp.full((RB, 1), 1.0, jnp.float32),   # background NDC depth
            jnp.full((RB, 1), -1, jnp.int32),
            jnp.zeros((RB, 1), jnp.float32),
            jnp.zeros((RB, 1), jnp.float32))
    res = jax.lax.fori_loop(0, cnt, loop_body, init)
    z_out[...] = jnp.reshape(res[0], (1, 1, RB))
    id_out[...] = jnp.reshape(res[1], (1, 1, RB))
    b1_out[...] = jnp.reshape(res[2], (1, 1, RB))
    b2_out[...] = jnp.reshape(res[3], (1, 1, RB))


def _raster_sd_kernel(n_chunks, k, alpha,
                      count_ref, list_ref, px_ref, py_ref,
                      first_ref, rmin_ref, rmax_ref,
                      coef_hbm, *rest):
    """k-slot stochastic raster (reference StochasticDepthMap/
    StochasticDepth.ps.slang): fragments beyond the first depth layer write
    into R = floor(alpha*k + rng) stratified slots, z-tested per slot.
    Same per-slot masked-min structure as the SD coverage insertion
    (rt_pallas._hash_tail), driven by the raster fragment stream."""
    out_refs = rest[:k]
    scratch, sems = rest[k], rest[k + 1]
    px = jnp.broadcast_to(jnp.reshape(px_ref[...], (RB, 1)), (RB, TC))
    py = jnp.broadcast_to(jnp.reshape(py_ref[...], (RB, 1)), (RB, TC))
    first = jnp.broadcast_to(jnp.reshape(first_ref[...], (RB, 1)), (RB, TC))
    rmin = jnp.broadcast_to(jnp.reshape(rmin_ref[...], (RB, 1)), (RB, TC))
    rmax = jnp.broadcast_to(jnp.reshape(rmax_ref[...], (RB, 1)), (RB, TC))

    raw = count_ref[0, 0, 0]
    full = raw > list_ref.shape[-1]
    cnt = jnp.where(full, n_chunks, raw)

    def get_dma(slot, j):
        ci = jnp.where(full, j,
                       list_ref[0, 0, jnp.minimum(j, list_ref.shape[-1] - 1)])
        return pltpu.make_async_copy(coef_hbm.at[ci], scratch.at[slot],
                                     sems.at[slot])

    from ..utils.sampling import coverage_mask_select

    def chunk_math(carry, tri):
        e0 = tri[0:1] * px + tri[1:2] * py + tri[2:3]
        e1 = tri[3:4] * px + tri[4:5] * py + tri[5:6]
        e2 = tri[6:7] * px + tri[7:8] * py + tri[8:9]
        zn = tri[9:10] * px + tri[10:11] * py + tri[11:12]
        wd = tri[12:13] * px + tri[13:14] * py + tri[14:15]
        va = tri[15:16] > 0.0
        oid = tri[16:17]
        inside = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0) & (wd > 0.0) & va
        z = zn / jnp.where(wd == 0.0, 1.0, wd)
        inside = inside & (z >= 0.0) & (z <= 1.0)
        esum = e0 + e1 + e2
        esum = jnp.where(esum == 0.0, 1.0, esum)
        view_depth = wd / esum
        # first-layer discard + ray interval (ps.slang:65-85; rayMax==0
        # doubles as the request mask)
        inside = inside & (view_depth > first + 0.01)
        # logical form, not where-over-booleans: an i1 select lowers to an
        # i8->i1 truncation Mosaic rejects ("Unsupported target bitwidth
        # for truncation", hardware compile 2026-08-19)
        inside = inside & ((rmin == 0.0) | (view_depth >= rmin))
        inside = inside & (rmax != 0.0) & (view_depth <= rmax)

        # fragment rng from pixel + primitive id (hashes SV_Position +
        # SV_PrimitiveID like the raster variant)
        hb = (px.astype(jnp.int32) * 374761393
              ^ (py.astype(jnp.int32) * 668265263)
              ^ (oid.astype(jnp.int32) << 7))
        hb = (hb ^ (hb >> 13)) * jnp.int32(0x9E3779B1 - (1 << 32))
        hb = hb ^ (hb >> 16)
        rng = (jnp.abs(hb) % 32767).astype(jnp.float32) * (1.0 / 32767.0)
        # 0x9E3779B1 as the SIGNED int32 it wraps to: the raw unsigned
        # literal overflows int32 argument parsing under jit
        h2 = (hb ^ (oid.astype(jnp.int32)
                    * jnp.int32(0x9E3779B1 - (1 << 32)))) ^ (hb >> 5)
        rng2 = (jnp.abs(h2) % 32767).astype(jnp.float32) * (1.0 / 32767.0)
        mask = coverage_mask_select(alpha, rng, rng2, k)

        vd = jnp.where(inside, view_depth, jnp.float32(3e38))
        out = []
        for s in range(k):
            covered = ((mask >> s) & 1) > 0
            m = jnp.min(jnp.where(covered, vd, jnp.float32(3e38)),
                        axis=1, keepdims=True)
            out.append(jnp.minimum(carry[s], m))
        return tuple(out)

    for p0 in range(NSLOT - 1):
        @pl.when(p0 < cnt)
        def _(p0=p0):
            get_dma(p0 % NSLOT, p0).start()

    def loop_body(j, carry):
        slot = j % NSLOT

        @pl.when(j + (NSLOT - 1) < cnt)
        def _():
            get_dma((j + (NSLOT - 1)) % NSLOT, j + (NSLOT - 1)).start()

        get_dma(slot, j).wait()
        return chunk_math(carry, scratch[slot])

    # empty slots hold the 3e38 sentinel; the wrapper substitutes far_z
    # (far_z is a traced camera value — it cannot be a kernel constant)
    init = tuple(jnp.full((RB, 1), 3e38, jnp.float32) for _ in range(k))
    res = jax.lax.fori_loop(0, cnt, loop_body, init)
    for s in range(k):
        out_refs[s][...] = jnp.reshape(res[s], (1, 1, RB))


@functools.partial(jax.jit, static_argnames=("width", "height", "cull", "k",
                                             "alpha"))
def raster_stochastic_pallas(view_proj, positions, far, *, width: int,
                             height: int, k: int, alpha: float,
                             first_depth, ray_min, ray_max,
                             cull: str = "back"):
    """k-slot stochastic raster at scale. Returns LINEAR view depths
    [H, W, k] (far where empty) — drop-in for the XLA
    passes/stochastic_depth.py:_raster_stochastic z-splat."""
    coef, bbox, valid = _setup_triangles(
        view_proj, positions, width, height, jnp.float32(0), jnp.float32(0),
        CULL_MODES[cull])
    order = screen_morton_order(bbox, valid, width, height)
    coef, bbox, valid = coef[order], bbox[order], valid[order]
    coef_hbm = pack_coef_chunks(coef, valid, order)
    cbox = chunk_screen_bboxes(bbox, valid)
    n_chunks = coef_hbm.shape[0]

    hp = height + (-height) % TILE_RH
    wp = width + (-width) % TILE_RW
    nby, nbx = hp // TILE_RH, wp // TILE_RW
    nb = nby * nbx
    lists, counts = build_chunk_lists_2d(cbox, nby, nbx)
    lw = lists.shape[1]
    lp = lw + ((-lw) % 8)
    lists = jnp.pad(lists, ((0, 0), (0, lp - lw)))

    yy = jnp.broadcast_to(jnp.arange(hp, dtype=jnp.float32)[:, None] + 0.5,
                          (hp, wp))
    xx = jnp.broadcast_to(jnp.arange(wp, dtype=jnp.float32)[None, :] + 0.5,
                          (hp, wp))

    def tf(a, fill):
        p, _ = pad_tile(a, fill=fill)
        return tile_flatten(p).reshape(nb, 1, RB)

    px = tile_flatten(xx).reshape(nb, 1, RB)
    py = tile_flatten(yy).reshape(nb, 1, RB)
    first = tf(first_depth, 3e38) if first_depth is not None \
        else jnp.full((nb, 1, RB), -3e38, jnp.float32)
    rmin = tf(ray_min, 0.0) if ray_min is not None \
        else jnp.zeros((nb, 1, RB), jnp.float32)
    rmax = tf(ray_max, 0.0) if ray_max is not None \
        else jnp.full((nb, 1, RB), 3e38, jnp.float32)

    kernel = functools.partial(_raster_sd_kernel, n_chunks, k, alpha)
    count_spec = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                              memory_space=pltpu.SMEM)
    list_spec = pl.BlockSpec((1, 1, lp), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM)
    pix_spec = pl.BlockSpec((1, 1, RB), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    coef_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec((1, 1, RB), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[count_spec, list_spec] + [pix_spec] * 5 + [coef_spec],
        out_specs=tuple([out_spec] * k),
        out_shape=tuple(jax.ShapeDtypeStruct((nb, 1, RB), jnp.float32)
                        for _ in range(k)),
        scratch_shapes=[pltpu.VMEM((NSLOT, COEF_ROWS, TC), jnp.float32),
                        pltpu.SemaphoreType.DMA((NSLOT,))],
    )(counts[:, None, None], lists[:, None, :], px, py, first, rmin, rmax,
      coef_hbm)

    def unt(a):
        t = tile_unflatten(a.reshape(nb * RB), hp, wp)[:height, :width]
        return jnp.where(t >= 3e37, far, t)  # empty slot -> far

    return jnp.stack([unt(o) for o in outs], axis=-1)


@functools.partial(jax.jit, static_argnames=("width", "height", "cull",
                                             "min_separation", "full_dim"))
def rasterize_pallas(view_proj, positions, *, width: int, height: int,
                     jitter_x=0.0, jitter_y=0.0, cull: str = "back",
                     depth_floor=None, min_separation: float = 0.0,
                     origin=(0.0, 0.0), full_dim: tuple | None = None):
    """Drop-in for ops/raster.py:rasterize at scale (same output dict;
    `overflow` reports blocks whose chunk list hit LIST_CAP — those blocks
    fall back to streaming every chunk, so it stays a diagnostic, never a
    correctness loss)."""
    jitter_x = jnp.asarray(jitter_x, jnp.float32)
    jitter_y = jnp.asarray(jitter_y, jnp.float32)
    coef, bbox, valid = _setup_triangles(
        view_proj, positions, width, height, jitter_x, jitter_y,
        CULL_MODES[cull], origin=origin, full_dim=full_dim)
    order = screen_morton_order(bbox, valid, width, height)
    coef, bbox, valid = coef[order], bbox[order], valid[order]
    coef_hbm = pack_coef_chunks(coef, valid, order)
    cbox = chunk_screen_bboxes(bbox, valid)
    n_chunks = coef_hbm.shape[0]

    hp = height + (-height) % TILE_RH
    wp = width + (-width) % TILE_RW
    nby, nbx = hp // TILE_RH, wp // TILE_RW
    nb = nby * nbx
    lists, counts = build_chunk_lists_2d(cbox, nby, nbx)
    lw = lists.shape[1]
    lp = lw + ((-lw) % 8)
    lists = jnp.pad(lists, ((0, 0), (0, lp - lw)))

    # pixel-center coords in tile-flattened order (viewport-local; edge
    # functions are in GLOBAL coords, so add origin like _raster_tiles)
    ox, oy = origin
    yy = jnp.broadcast_to(jnp.arange(hp, dtype=jnp.float32)[:, None]
                          + (oy + 0.5), (hp, wp))
    xx = jnp.broadcast_to(jnp.arange(wp, dtype=jnp.float32)[None, :]
                          + (ox + 0.5), (hp, wp))
    px = tile_flatten(xx).reshape(nb, 1, RB)
    py = tile_flatten(yy).reshape(nb, 1, RB)
    use_floor = depth_floor is not None
    if use_floor:
        fpad, _ = pad_tile(depth_floor, fill=3e38)
        fl = tile_flatten(fpad).reshape(nb, 1, RB)
    else:
        fl = jnp.zeros((nb, 1, RB), jnp.float32)

    kernel = functools.partial(_raster_kernel, n_chunks, use_floor,
                               min_separation)
    count_spec = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                              memory_space=pltpu.SMEM)
    list_spec = pl.BlockSpec((1, 1, lp), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM)
    pix_spec = pl.BlockSpec((1, 1, RB), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    coef_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec((1, 1, RB), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    z, tid, b1, b2 = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[count_spec, list_spec, pix_spec, pix_spec, pix_spec,
                  coef_spec],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((nb, 1, RB), jnp.float32),
                   jax.ShapeDtypeStruct((nb, 1, RB), jnp.int32),
                   jax.ShapeDtypeStruct((nb, 1, RB), jnp.float32),
                   jax.ShapeDtypeStruct((nb, 1, RB), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((NSLOT, COEF_ROWS, TC), jnp.float32),
                        pltpu.SemaphoreType.DMA((NSLOT,))],
    )(counts[:, None, None], lists[:, None, :], px, py, fl, coef_hbm)

    def unt(a):
        return tile_unflatten(a.reshape(nb * RB), hp, wp)[:height, :width]

    tri_id = unt(tid)
    bary = jnp.stack([unt(b1), unt(b2)], -1)
    depth = unt(z)
    overflow = jnp.maximum(counts - lists.shape[1], 0).sum()
    return {"tri_id": tri_id, "bary": bary, "depth": depth,
            "overflow": overflow}

# ---------------------------------------------------------------------------
# Deferred attribute materialization — the "shading gather" done TPU-native.
#
# After the visibility raster (or the RT vbuffer), every G-buffer channel is
# an attribute fetch indexed by the per-pixel winning triangle. The XLA form
# (ops/raster.py:interpolate — `vertex_attr[tri_id]`) is a per-pixel gather
# from a [T,3,C] table: TPU has no hardware gather, and at 1080p / 323k
# triangles the full channel set costs ~0.7 s/frame. This path instead:
#
#   * keeps all attributes in ONE [n_chunks, NR, TC] HBM table in the
#     scene's morton chunk order (pure reshape of the scene arrays — no
#     per-frame permutation),
#   * computes, per 8x32 pixel block, the exact list of chunks that won at
#     least one pixel (sort + unique over the block's 256 winner ids — a
#     block needs ~1-6 chunks on coherent visibility, never more than 256),
#   * streams only those chunks into VMEM and extracts every attribute row
#     of each pixel's winner with a single one-hot MXU matmul
#     ([RB,TC] selection x [NR,TC]^T -> [RB,NR]) — the systolic array does
#     the "gather", the VPU only does the barycentric combine.
#
# Reference equivalent: the pixel-shader attribute interpolation stage of
# the raster G-buffer (Source/RenderPasses/GBuffer/GBufferRaster.3d.slang).


def build_winner_chunk_lists(wchunk, cap=RB):
    """Per-block unique winner chunks. wchunk: [nb, RB] int32 original chunk
    ids (-1 = background). Returns (lists [nb, cap] ascending-padded-with-0,
    counts [nb]). Exact: a block of RB pixels can never need more than RB
    distinct chunks, so cap=RB loses nothing."""
    s = jnp.sort(wchunk, axis=1)
    first = jnp.concatenate(
        [jnp.ones_like(s[:, :1], dtype=bool), s[:, 1:] != s[:, :-1]], axis=1)
    uniq = first & (s >= 0)
    counts = uniq.sum(axis=1).astype(jnp.int32)
    big = jnp.int32(2**30)
    keys = jnp.where(uniq, big - s, 0)
    cap = min(cap, s.shape[1])
    vals, _ = jax.lax.top_k(keys, cap)            # descending keys
    lists = jnp.where(vals > 0, big - vals, 0)    # ascending chunk ids
    return lists, counts


def _fetch_kernel(nci, nflat, nrp, ncop,
                  count_ref, list_ref, wchunk_ref, wlane_ref, b1_ref, b2_ref,
                  attr_hbm, out_ref, acc, scratch, sem):
    cnt = count_ref[0, 0, 0]
    wchunk = jnp.reshape(wchunk_ref[...], (RB, 1))
    wlane = jnp.reshape(wlane_ref[...], (RB, 1))
    b1 = jnp.reshape(b1_ref[...], (1, RB))
    b2 = jnp.reshape(b2_ref[...], (1, RB))
    b0 = 1.0 - b1 - b2
    lane = jax.lax.broadcasted_iota(jnp.int32, (RB, TC), 1)

    acc[...] = jnp.zeros((nrp, RB), jnp.float32)

    def body(j, carry):
        ci = list_ref[0, 0, j]
        cp = pltpu.make_async_copy(attr_hbm.at[ci], scratch.at[0], sem.at[0])
        cp.start()
        sel = ((wchunk == ci) & (lane == wlane)).astype(jnp.float32)
        cp.wait()
        # one-hot row extraction on the MXU: [nrp,TC] x [RB,TC]^T ->
        # [nrp,RB] — attribute rows along sublanes, pixels along lanes, so
        # the combine below reads ROW slices (a dim-0 stack of lane-offset
        # column slices is a Mosaic-unsupported relayout)
        ext = jax.lax.dot_general(scratch[0], sel, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        acc[...] = acc[...] + ext
        return carry

    jax.lax.fori_loop(0, cnt, body, 0)

    a = acc[...]                                   # [nrp, RB]
    for i in range(nci):                           # barycentric combine
        out_ref[0, i:i + 1, :] = (b0 * a[3 * i:3 * i + 1, :]
                                  + b1 * a[3 * i + 1:3 * i + 2, :]
                                  + b2 * a[3 * i + 2:3 * i + 3, :])
    for f in range(nflat):                         # per-triangle rows
        out_ref[0, nci + f:nci + f + 1, :] = \
            a[3 * nci + f:3 * nci + f + 1, :]
    for p in range(nci + nflat, ncop):
        out_ref[0, p:p + 1, :] = jnp.zeros((1, RB), jnp.float32)


def pack_attr_chunks(interp, flats):
    """interp: list of [T,3,C] vertex attributes; flats: list of [T] or
    [T,C] per-triangle attributes -> ([n_chunks, NR_pad, TC] HBM table,
    nci, nflat). Row layout: comp-major, vertex inner (row 3i+v = component
    i at vertex v), then the flat rows. Pure reshapes of the scene arrays —
    the chunk order IS the scene triangle order."""
    cols = []
    for t in interp:
        tt = jnp.swapaxes(t.astype(jnp.float32), 1, 2)   # [T, C, 3]
        cols.append(tt.reshape(tt.shape[0], -1))         # comp-major
    nci = sum(c.shape[1] for c in cols) // 3
    nflat = 0
    for f in flats:
        ff = f.astype(jnp.float32)
        ff = ff[:, None] if ff.ndim == 1 else ff
        nflat += ff.shape[1]
        cols.append(ff)
    rows = jnp.concatenate(cols, axis=1)                 # [T, NR]
    t, nr = rows.shape
    nrp = nr + ((-nr) % 8)
    tp = t + ((-t) % TC)
    rows = jnp.pad(rows, ((0, tp - t), (0, nrp - nr)))
    hbm = rows.T.reshape(nrp, tp // TC, TC).transpose(1, 0, 2)
    return hbm, nci, nflat


def fetch_attributes_pallas(tri_id, bary, interp, flats):
    """Materialize interpolated + flat attributes for a winner image.

    tri_id: [H,W] int32 original triangle ids (-1 background); bary [H,W,2].
    interp: list of [T,3,C_i]; flats: list of [T] / [T,C].
    Returns list of [H,W,C_i] (interp order) + list of [H,W] / [H,W,C]
    (flats order); background pixels are 0 (callers mask, same contract as
    ops/raster.py:interpolate / flat_fetch)."""
    height, width = tri_id.shape
    attr_hbm, nci, nflat = pack_attr_chunks(interp, flats)
    nrp = attr_hbm.shape[1]
    ncout = nci + nflat
    ncop = ncout + ((-ncout) % 8)

    tid_p, _ = pad_tile(tri_id, fill=-1)
    hp, wp = tid_p.shape
    nb = (hp // TILE_RH) * (wp // TILE_RW)
    tid_t = tile_flatten(tid_p).reshape(nb, RB)
    safe = jnp.maximum(tid_t, 0)
    wchunk = jnp.where(tid_t >= 0, safe // TC, -1).astype(jnp.int32)
    wlane = (safe % TC).astype(jnp.int32)
    b_p, _ = pad_tile(bary, fill=0.0)
    b_t = tile_flatten(b_p).reshape(nb, RB, 2)

    lists, counts = build_winner_chunk_lists(wchunk)
    lp = lists.shape[1] + ((-lists.shape[1]) % 8)
    lists = jnp.pad(lists, ((0, 0), (0, lp - lists.shape[1])))

    kernel = functools.partial(_fetch_kernel, nci, nflat, nrp, ncop)
    count_spec = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                              memory_space=pltpu.SMEM)
    list_spec = pl.BlockSpec((1, 1, lp), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM)
    pix_spec = pl.BlockSpec((1, 1, RB), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, ncop, RB), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[count_spec, list_spec, pix_spec, pix_spec, pix_spec,
                  pix_spec, pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nb, ncop, RB), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nrp, RB), jnp.float32),
                        pltpu.VMEM((1, nrp, TC), jnp.float32),
                        pltpu.SemaphoreType.DMA((1,))],
    )(counts[:, None, None], lists[:, None, :],
      wchunk[:, None, :], wlane[:, None, :],
      b_t[..., 0][:, None, :], b_t[..., 1][:, None, :], attr_hbm)

    def unt(a):
        return tile_unflatten(a.reshape(nb * RB), hp, wp)[:height, :width]

    comps = [unt(out[:, i, :]) for i in range(ncout)]
    results = []
    k = 0
    for t in interp:
        c = t.shape[2]
        results.append(jnp.stack(comps[k:k + c], axis=-1))
        k += c
    for f in flats:
        if f.ndim == 1:
            results.append(comps[k])
            k += 1
        else:
            results.append(jnp.stack(comps[k:k + f.shape[1]], axis=-1))
            k += f.shape[1]
    return results
