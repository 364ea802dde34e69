"""Pallas TPU kernel for the stochastic-depth ray trace.

Replaces the XLA scan formulation of ops/rt.py:sd_trace for the hot path:
one ray per SD texel, Möller-Trumbore against every triangle, keep k hits by
smallest selection key (reservoir; see ops/rt.py docstring for semantics).

Kernel layout (v5e):
  * grid over ray blocks of RB rays; ray components stored [Rp, 1] so each
    block is a [RB, 1] sublane-major column — broadcasts against triangle
    rows with no relayout.
  * all triangle data lives in VMEM for the whole kernel (component-major
    [3, Tp] arrays; ~40 KB per 1k triangles), streamed over chunks of
    TC=128 lanes by static slices inside a fori_loop.
  * the per-chunk [RB, TC] intersection temporaries live in registers/VMEM —
    nothing round-trips HBM (the XLA version re-read ~200 MB per extraction
    pass).
  * reservoir = k packed int32 columns (15-bit key | 16-bit quantized depth,
    see ops/rt.py:_pack_key_depth); per chunk k (min, mask) passes extract
    the chunk's best hits, k more merge them into the carry.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB = 256          # rays per block (sublanes)
TC = 128          # triangles per chunk (lanes)
INVALID = 2**31 - 1  # python int: a jnp constant would be captured by the kernel

COVERAGE_MAX_K = 5  # select-chain mask decode bound (2^k selects per chunk)


def _hash_tail(mode, k, max_count, alpha, ok, ok_face, u, v, d_norm, carry,
               tail_bound=True):
    """Shared insertion tail for the SD kernels: fold this chunk's accepted
    hits into the reservoir carry (reference algorithm(),
    Common.slangh:102-254; semantics per ops/rt.py:sd_trace).

    carry = (slot_0..slot_{k-1}[, count]) of [RB,1] int32; ok/ok_face/u/v/
    d_norm are [RB,TC]. Returns the updated carry.

    mode 'default'  — bottom-k by 15-bit barycentric hash key.
    mode 'kbuffer'  — bottom-k by quantized depth (hash tie-break low bits).
    mode 'coverage' — per-slot masked min over stratified coverage masks;
        the mask table lookup is a static select-chain (2^k selects), NOT a
        per-lane gather — TPU has no hardware gather (CLAUDE.md rule).
    max_count — cap participation at the first `max_count` face-accepted
        hits in chunk-stream order (MAX_COUNT, Common.slangh:143); the
        exclusive per-lane ordinal comes from one [RB,TC]x[TC,TC] MXU
        matmul against a strictly-lower-triangular constant (the MXU is
        otherwise idle in this kernel; a lane cumsum has no Mosaic lowering).
    """
    slots, count = (carry[:k], carry[k]) if max_count is not None else \
        (carry, None)
    if max_count is not None:
        okf = ok_face.astype(jnp.float32)
        lt = (jax.lax.broadcasted_iota(jnp.int32, (TC, TC), 0)
              < jax.lax.broadcasted_iota(jnp.int32, (TC, TC), 1))
        ordinal = jax.lax.dot(okf, lt.astype(jnp.float32),
                              precision=jax.lax.Precision.HIGHEST)
        ok = ok & ((count.astype(jnp.float32) + ordinal)
                   < jnp.float32(max_count))
        count = jnp.minimum(
            count + jnp.sum(okf, axis=1, keepdims=True).astype(jnp.int32),
            jnp.int32(2**30))

    # integer hash of the barycentrics (replaces the reference's sin-based
    # hash, Common.slangh:36-39 — same role: a uniform selection key)
    hb = (u * 8388593.0).astype(jnp.int32) ^ ((v * 4194301.0).astype(jnp.int32) << 7)
    hb = (hb ^ (hb >> 8)) * jnp.int32(0x9E3779B1 - (1 << 32))
    hb = hb ^ (hb >> 13)
    k15 = jnp.abs(hb) % 32767
    d16 = jnp.clip((d_norm * 65535.0).astype(jnp.int32), 0, 65535)

    if mode == "coverage":
        from ..utils.sampling import coverage_mask_select
        rng = k15.astype(jnp.float32) * (1.0 / 32767.0)
        # second hash (rng2 = hash3D(bary, t), Common.slangh:128): remix the
        # first hash with the quantized depth
        h2 = (hb ^ (d16 * jnp.int32(0x9E3779B1 - (1 << 32)))) ^ (hb >> 5)
        h2 = h2 ^ (h2 >> 11)
        rng2 = (jnp.abs(h2) % 32767).astype(jnp.float32) * (1.0 / 32767.0)
        mask = coverage_mask_select(alpha, rng, rng2, k)
        pk_d = jnp.where(ok, d16, jnp.int32(INVALID))
        out = []
        for s in range(k):
            covered = ((mask >> s) & 1) > 0
            m = jnp.min(jnp.where(covered, pk_d, jnp.int32(INVALID)),
                        axis=1, keepdims=True)
            out.append(jnp.minimum(slots[s], m))
    else:
        if mode == "kbuffer":
            packed = jnp.where(ok, d16 * 32768 + jnp.minimum(k15, 32766),
                               jnp.int32(INVALID))
        else:
            packed = jnp.where(ok, k15 * 65536 + d16, jnp.int32(INVALID))

        def extract_full(slots):
            pk = packed
            best = []
            for _ in range(k):
                m = jnp.min(pk, axis=1, keepdims=True)
                best.append(m)
                pk = jnp.where(pk == m, jnp.int32(INVALID), pk)
            both = jnp.concatenate(list(slots) + best, axis=1)
            out = []
            for _ in range(k):
                m = jnp.min(both, axis=1, keepdims=True)
                out.append(m)
                both = jnp.where(both == m, jnp.int32(INVALID), both)
            return tuple(out)

        def insert_one(slots):
            # <=1 accepted hit per ray in this chunk: one lane-min extracts
            # the candidate, a k-step sorted trickle inserts it — replaces
            # 2k full [RB,TC]/[RB,2k] extraction rounds. Slot values are
            # strictly increasing until INVALID and duplicate values merge
            # (the full path invalidates ALL equal copies per round), so
            # dedup the candidate against the slots first.
            v = jnp.min(packed, axis=1, keepdims=True)
            dup = slots[0] == v
            for s in slots[1:]:
                dup = dup | (s == v)
            v = jnp.where(dup, jnp.int32(INVALID), v)
            out = []
            for s in slots:
                out.append(jnp.minimum(s, v))
                v = jnp.maximum(s, v)
            return tuple(out)

        if tail_bound and k > 1:
            # most hit visits accept exactly one lane per ray (tight ray
            # intervals); bound the extraction rounds by the actual max
            # per-ray hit count — exact, see insert_one
            nhit = jnp.max(jnp.sum(ok.astype(jnp.int32), axis=1))
            out = jax.lax.cond(nhit <= 1, insert_one, extract_full,
                               tuple(slots))
        else:
            out = extract_full(tuple(slots))
    if count is not None:
        return tuple(out) + (count,)
    return tuple(out)


def shared_origin_rows(v0t, e1t, e2t, origin):
    """Per-triangle shared-origin intersection rows (XLA, once per frame).

    Every SD ray starts at the pinhole camera origin, so the Möller-Trumbore
    cross products that mix ray and triangle data collapse to per-TRIANGLE
    constants (scalar-triple-product identities: with tv = origin - v0,
    det = e1.(d x e2) = d.(e2 x e1), u*det = tv.(d x e2) = d.(e2 x tv),
    v*det = d.(tv x e1), t*det = e2.(tv x e1) = tv.(e1 x e2)).

    Returns (nt, bt, ct, tp): [3,Tp] x3 + [1,Tp] — d.nt = det, d.bt = u*det,
    d.ct = v*det, tp = t*det."""
    def cross(a, b):
        return jnp.stack([a[1] * b[2] - a[2] * b[1],
                          a[2] * b[0] - a[0] * b[2],
                          a[0] * b[1] - a[1] * b[0]])

    tv = origin.reshape(3, 1) - v0t
    nt = cross(e2t, e1t)
    bt = cross(e2t, tv)
    ct = cross(tv, e1t)
    tp = jnp.sum(tv * cross(e1t, e2t), axis=0, keepdims=True)
    return nt, bt, ct, tp


def _shared_origin_math(k, eps_det, cull_back, mode, max_count, alpha,
                        d3, tmin, tmax, za, zb,
                        n3, b3, c3, tp,
                        acc_back, reject, amask, carry, hit_gate=False,
                        tail_bound=True):
    """Per-chunk intersection + reservoir fold, shared-origin form.

    d3 = (dx, dy, dz) ray-direction broadcasts [RB, TC]; n3/b3/c3 are
    [3, TC] triangle rows; tmin/tmax/za/zb are [RB, 1] columns. The three
    Möller-Trumbore dots stay on the VPU: routing them through the MXU as
    [RB,3] @ [3,TC] matmuls was A/B'd on hardware (2026-08-19) and LOST —
    71.7 ms vs 52.1 ms for the 388k-ray SunTemple trace (k=3 f32-HIGHEST
    matmuls pay 6 bf16 passes + operand relayout per visit; the "idle MXU"
    is not free at this shape).

    The face test compares UNNORMALIZED terms (pu, pv, tp against
    det-scaled bounds): u >= 0 <=> pu*sign(det) >= 0, u+v <= 1 <=>
    (pu+pv)*s <= |det|, t in (tmin,tmax) <=> tp*s in (tmin*|det|,
    tmax*|det|) — so the reciprocal and the u/v/t normalizations move into
    the gated tail and are only paid on hit visits.

    hit_gate=True wraps everything past the face test in
    lax.cond(any(ok_face)): most chunk visits accept no hit at all (the
    requested-texel ray intervals are tight), and skipping the hash/alpha/
    extraction tail is EXACT — merging an all-INVALID candidate set is the
    identity on the carry. Hardware A/B 2026-08-19: gate off 95 ms, on
    52 ms for the 388k-ray SunTemple trace."""
    dx, dy, dz = d3
    det = dx * n3[0:1] + dy * n3[1:2] + dz * n3[2:3]
    pu = dx * b3[0:1] + dy * b3[1:2] + dz * b3[2:3]
    pv = dx * c3[0:1] + dy * c3[1:2] + dz * c3[2:3]
    if cull_back:
        ok = det > eps_det
        adet, spu, spv, stp = det, pu, pv, jnp.broadcast_to(tp, pu.shape)
    else:
        ok = (jnp.abs(det) > eps_det) & ((det > 0.0) | (acc_back > 0.0))
        s = jnp.where(det >= 0.0, 1.0, -1.0)
        adet, spu, spv, stp = det * s, pu * s, pv * s, tp * s
    ok = ok & (reject == 0.0)
    ok_face = ok & (spu >= 0.0) & (spv >= 0.0) & (spu + spv <= adet) \
        & (stp > tmin * adet) & (stp < tmax * adet)

    def tail(carry):
        inv = 1.0 / jnp.where(jnp.abs(det) < eps_det, 1.0, det)
        u = pu * inv
        v = pv * inv
        t = tp * inv
        # alpha-coverage test at the hit's barycentric cell (the baked-mask
        # stand-in for hashed-alpha, see prep_triangles); ok_face (pre-alpha)
        # feeds the MAX_COUNT cap — the reference counts alpha-failed hits
        cell = (jnp.clip(u * 4.0, 0.0, 3.0).astype(jnp.int32)
                + 4 * jnp.clip(v * 4.0, 0.0, 3.0).astype(jnp.int32))
        abit = jax.lax.shift_right_logical(
            jnp.broadcast_to(amask, cell.shape), cell) & 1
        okh = ok_face & (abit > 0)

        d_norm = jnp.clip(t * za - zb, 0.0, 1.0)
        return _hash_tail(mode, k, max_count, alpha, okh, ok_face, u, v,
                          d_norm, carry, tail_bound=tail_bound)

    if not hit_gate:
        return tail(carry)
    return jax.lax.cond(jnp.any(ok_face), tail, lambda c: c, carry)


def _classic_origin_math(k, eps_det, cull_back, mode, max_count, alpha,
                         o3, d3, tmin, tmax, za, zb,
                         v0, e1, e2,
                         acc_back, reject, amask, carry, hit_gate=False,
                         tail_bound=True):
    """Per-chunk intersection + reservoir fold, classic Möller-Trumbore with
    PER-RAY origins (o3 = (ox, oy, oz) [RB, 1] columns). Used by the any-hit
    paths (RayShadow.ps.slang:131-186, ReSTIR visibility) whose rays start
    at per-pixel surface points — the shared-origin collapse of
    shared_origin_rows does not apply there.

    Same unnormalized face test and gated tail as _shared_origin_math:
    pvec = d x e2 and tv = o - v0 are formed per visit (9 + 3 ops/component
    more than the shared-origin form), det = e1.pvec, u*det = tv.pvec,
    qvec = tv x e1, v*det = d.qvec, t*det = e2.qvec."""
    ox, oy, oz = o3
    dx, dy, dz = d3
    px = dy * e2[2:3] - dz * e2[1:2]
    py = dz * e2[0:1] - dx * e2[2:3]
    pz = dx * e2[1:2] - dy * e2[0:1]
    det = e1[0:1] * px + e1[1:2] * py + e1[2:3] * pz
    tvx = ox - v0[0:1]
    tvy = oy - v0[1:2]
    tvz = oz - v0[2:3]
    pu = tvx * px + tvy * py + tvz * pz
    qx = tvy * e1[2:3] - tvz * e1[1:2]
    qy = tvz * e1[0:1] - tvx * e1[2:3]
    qz = tvx * e1[1:2] - tvy * e1[0:1]
    pv = dx * qx + dy * qy + dz * qz
    tp = e2[0:1] * qx + e2[1:2] * qy + e2[2:3] * qz
    if cull_back:
        ok = det > eps_det
        adet, spu, spv, stp = det, pu, pv, tp
    else:
        ok = (jnp.abs(det) > eps_det) & ((det > 0.0) | (acc_back > 0.0))
        s = jnp.where(det >= 0.0, 1.0, -1.0)
        adet, spu, spv, stp = det * s, pu * s, pv * s, tp * s
    ok = ok & (reject == 0.0)
    ok_face = ok & (spu >= 0.0) & (spv >= 0.0) & (spu + spv <= adet) \
        & (stp > tmin * adet) & (stp < tmax * adet)

    def tail(carry):
        inv = 1.0 / jnp.where(jnp.abs(det) < eps_det, 1.0, det)
        u = pu * inv
        v = pv * inv
        t = tp * inv
        cell = (jnp.clip(u * 4.0, 0.0, 3.0).astype(jnp.int32)
                + 4 * jnp.clip(v * 4.0, 0.0, 3.0).astype(jnp.int32))
        abit = jax.lax.shift_right_logical(
            jnp.broadcast_to(amask, cell.shape), cell) & 1
        okh = ok_face & (abit > 0)
        d_norm = jnp.clip(t * za - zb, 0.0, 1.0)
        return _hash_tail(mode, k, max_count, alpha, okh, ok_face, u, v,
                          d_norm, carry, tail_bound=tail_bound)

    if not hit_gate:
        return tail(carry)
    return jax.lax.cond(jnp.any(ok_face), tail, lambda c: c, carry)


def _sd_kernel(n_chunks, k, eps_det, cull_back, mode, max_count, alpha,
               aabb_ref,
               nt_ref, bt_ref, ct_ref, flag_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tmin_ref, tmax_ref, za_ref, zb_ref,
               *out_refs):
    # ray blocks arrive as [1, RB] rows (compact in HBM — a [Rp,1] column
    # layout tile-pads x128 and OOMs at multi-megaray counts); reshape to
    # [RB, 1] columns once, then hoist the lane-broadcasts of the three
    # direction components (used 3x each in the dots). Triangles arrive as
    # SHARED-ORIGIN rows (shared_origin_rows): the origin-dependent cross
    # products are baked per frame, so the per-chunk math is three dot
    # products instead of two cross products + three dots.
    bc = lambda r: jnp.broadcast_to(jnp.reshape(r[...], (RB, 1)), (RB, TC))
    d3 = (bc(dx_ref), bc(dy_ref), bc(dz_ref))
    col0 = lambda r: jnp.reshape(r[...], (RB, 1))
    tmin, tmax = col0(tmin_ref), col0(tmax_ref)
    za, zb = col0(za_ref), col0(zb_ref)   # d_norm = clip(t*za - zb, 0, 1)

    # conservative AABB of this ray block's segments (SD-texel blocks are
    # spatially coherent; empty intervals contribute nothing) — the bundle
    # side of the chunk-AABB cull
    valid = tmax > tmin

    def _seg_bounds(o_c, d_c):
        a = o_c + d_c * tmin
        b = o_c + d_c * tmax
        lo = jnp.where(valid, jnp.minimum(a, b), jnp.inf)
        hi = jnp.where(valid, jnp.maximum(a, b), -jnp.inf)
        return jnp.min(lo), jnp.max(hi)

    col = lambda r: jnp.reshape(r[...], (RB, 1))
    bx0, bx1 = _seg_bounds(col(ox_ref), col(dx_ref))
    by0, by1 = _seg_bounds(col(oy_ref), col(dy_ref))
    bz0, bz1 = _seg_bounds(col(oz_ref), col(dz_ref))

    def chunk_body(ci, carry):
        # chunk-AABB vs block-AABB cull (morton-sorted triangles make chunk
        # bounds tight — a 1-level BVH)
        overlap = ((aabb_ref[0, ci] <= bx1) & (aabb_ref[3, ci] >= bx0)
                   & (aabb_ref[1, ci] <= by1) & (aabb_ref[4, ci] >= by0)
                   & (aabb_ref[2, ci] <= bz1) & (aabb_ref[5, ci] >= bz0))

        def run_chunk(carry):
            return _chunk_math(ci, carry)

        return jax.lax.cond(overlap, run_chunk, lambda c: c, carry)

    def _chunk_math(ci, carry):
        sl = lambda ref: ref[:, pl.ds(ci * TC, TC)]          # [3, TC]
        nt = sl(nt_ref)
        bt = sl(bt_ref)
        ct = sl(ct_ref)
        flag = flag_ref[:, pl.ds(ci * TC, TC)]               # [4, TC]
        acc_back = flag[0:1]
        reject = flag[1:2]
        amask = flag[2:3].astype(jnp.int32)                  # [1, TC] bitmap
        tp = flag[3:4]                                       # t * det
        return _shared_origin_math(
            k, eps_det, cull_back, mode, max_count, alpha,
            d3, tmin, tmax, za, zb,
            nt, bt, ct, tp, acc_back, reject, amask, carry)

    init = tuple(jnp.full((RB, 1), INVALID, jnp.int32) for _ in range(k))
    if max_count is not None:
        init = init + (jnp.zeros((RB, 1), jnp.int32),)
    res = jax.lax.fori_loop(0, n_chunks, chunk_body, init)
    for s in range(k):
        out_refs[s][...] = jnp.reshape(res[s], (1, 1, RB))


@functools.partial(jax.jit, static_argnames=("num_samples", "cull_back",
                                             "mode", "max_count", "alpha"))
def sd_trace_pallas(v0t, e1t, e2t, flags, origins, dirs, tmin, tmax, vz_scale,
                    near, far, *, num_samples: int = 4, cull_back: bool = True,
                    mode: str = "default", max_count: int | None = None,
                    alpha: float = 0.2):
    """v0t/e1t/e2t: [3, Tp] component-major triangle data (Tp % TC == 0);
    flags: [2, Tp] — row 0 >0 accepts back faces (double-sided/alpha-tested,
    SVAO/Common.slang:695), row 1 >0 rejects the triangle entirely
    (failed alpha test / padding); origins/dirs: [R,3]; tmin/tmax/vz_scale: [R].
    Returns packed int32 reservoir [R, num_samples] (INVALID = miss).

    PRECONDITION: all origins equal (every SD ray starts at the pinhole
    camera; origins[0] is taken as THE origin for the shared-origin
    per-triangle precompute, shared_origin_rows)."""
    r = origins.shape[0]
    rp = r + ((-r) % RB)
    tp = v0t.shape[1]
    n_chunks = tp // TC
    k = num_samples

    nb = rp // RB

    def col(a, pad_value=0.0):
        a = jnp.pad(a, (0, rp - r), constant_values=pad_value)
        return a.reshape(nb, 1, RB)

    inv_range = 1.0 / (far - near)
    za = vz_scale * inv_range
    zb = jnp.broadcast_to(near * inv_range, (r,))
    cols = [col(origins[:, 0]), col(origins[:, 1]), col(origins[:, 2]),
            col(dirs[:, 0]), col(dirs[:, 1]), col(dirs[:, 2]),
            col(tmin), col(tmax, pad_value=-1.0),  # padded rays miss all
            col(za), col(zb)]

    # chunk AABBs [8, n_chunks] (6 used) for the in-kernel cull; rejected
    # (padding/alpha-fail) triangles must not extend the bounds
    v0r = v0t.T.reshape(n_chunks, TC, 3)
    e1r = e1t.T.reshape(n_chunks, TC, 3)
    e2r = e2t.T.reshape(n_chunks, TC, 3)
    rej = (flags[1].reshape(n_chunks, TC, 1) > 0.0)
    corners = jnp.stack([v0r, v0r + e1r, v0r + e2r], axis=2)  # [nc,TC,3,3]
    big = jnp.float32(3e38)
    cmin = jnp.where(rej[:, :, None], big, corners).min((1, 2))
    cmax = jnp.where(rej[:, :, None], -big, corners).max((1, 2))
    aabb = jnp.zeros((8, n_chunks))
    aabb = aabb.at[0:3].set(cmin.T).at[3:6].set(cmax.T)

    # shared-origin per-triangle rows + a [4, Tp] flag block carrying t*det
    nt, bt, ct, tpk = shared_origin_rows(v0t, e1t, e2t, origins[0])
    flags4 = jnp.concatenate([flags, tpk], axis=0)

    kernel = functools.partial(_sd_kernel, n_chunks, k, 1e-9, cull_back,
                               mode, max_count, alpha)
    aabb_spec = pl.BlockSpec((8, n_chunks), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    tri_spec = pl.BlockSpec((3, tp), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    flag_spec = pl.BlockSpec((4, tp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((1, 1, RB), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, RB), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(rp // RB,),
        in_specs=[aabb_spec, tri_spec, tri_spec, tri_spec, flag_spec]
        + [ray_spec] * 10,
        out_specs=tuple([out_spec] * k),
        out_shape=tuple(jax.ShapeDtypeStruct((nb, 1, RB), jnp.int32)
                        for _ in range(k)),
    )(aabb, nt, bt, ct, flags4, *cols)
    return jnp.stack([o.reshape(rp) for o in outs], axis=1)[:r]


# ---------------------------------------------------------------------------
# HBM-streaming tier: triangles live in HBM and are DMA'd per chunk, only for
# chunks whose AABB overlaps the ray block — the BVH tier of the kernel.
#
# The hierarchy is 2-level like the reference's BLAS/TLAS split
# (Scene.cpp:3091 buildBlas; SURVEY §7 hard part 1), reformulated TPU-first:
#   * leaves = morton-sorted triangle chunks of TC=128 (native/scenekit.cpp
#     emits the morton order at scene build) with tight AABBs,
#   * the "traversal" = a per-ray-block chunk LIST built OUTSIDE the kernel
#     by one vectorized [blocks x chunks] AABB-overlap pass + a compaction
#     scatter (build_chunk_lists) — XLA does in one fused elementwise+scan
#     what a SIMT kernel does with divergent stacks,
#   * the kernel walks its block's list with double-buffered HBM->VMEM DMA,
#     so VMEM no longer caps the scene size and per-block work is
#     proportional to the OVERLAPPING chunk count, not T.
# ---------------------------------------------------------------------------

PACK_ROWS = 13  # shared-origin rows nt(3) bt(3) ct(3) tp(1)
                # + flags(3: acc-back, reject, alpha mask)
PACK_ROWS_CLASSIC = 12  # classic rows v0(3) e1(3) e2(3) + flags(3) — for
                        # rays with PER-RAY origins (shadow/ReSTIR any-hit),
                        # where the shared-origin precompute doesn't apply
NSLOT = 8       # streaming scratch slots (DMA pipeline depth); hardware A/B
                # at 388k rays / 2.5k chunks: nslot=8 51.9 ms vs nslot=4 54.0
SD_GROUP = 1    # chunks per list entry / DMA ("superchunk"). Hardware A/B
                # (2026-08-19, 388k rays, 2.5k chunks, hit_gate on): group=2
                # 65 ms, group=4 107 ms vs group=1 52 ms — the false-positive
                # math from union super-AABBs costs MORE than the amortized
                # DMA latency once the any(ok_face) tail gate makes a miss
                # visit cheap. Keep 1; the knob stays for future scenes.
LIST_CAP = 512  # per-block chunk-list bound for the top_k compaction; the
                # Pallas parity tool (tools/pallas_parity.py) validates the
                # kernels against the oracle at reference scale and fails
                # loudly if a cap ever drops real overlaps


def _sd_stream_kernel(k, eps_det, cull_back, early_exit, n_chunks,
                      mode, max_count, alpha, group, nslot, hit_gate,
                      classic, tail_bound, ray_gate,
                      count_ref, list_ref, aabb_ref,
                      ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                      tmin_ref, tmax_ref, za_ref, zb_ref,
                      tri_hbm, *rest):
    out_refs = rest[:k]
    scratch, sems = rest[k], rest[k + 1]
    bc = lambda r: jnp.broadcast_to(jnp.reshape(r[...], (RB, 1)), (RB, TC))
    d3 = (bc(dx_ref), bc(dy_ref), bc(dz_ref))
    col0 = lambda r: jnp.reshape(r[...], (RB, 1))
    o3 = (col0(ox_ref), col0(oy_ref), col0(oz_ref))
    tmin, tmax = col0(tmin_ref), col0(tmax_ref)
    za, zb = col0(za_ref), col0(zb_ref)

    if ray_gate:
        # per-ray slab precompute for the chunk-AABB gate: exact (a
        # triangle inside the chunk AABB hit at t implies t lies in the
        # ray's slab interval) but measured a 20 ms LOSS at SunTemple-full
        # (2026-08-19: gate on 62.4 ms vs off 42.4 — the per-visit SMEM
        # scalar reads + lax.cond stall the DMA-overlapped visit loop far
        # more than the skipped Moller-Trumbore saves). Default OFF; kept
        # as a knob for scenes with much emptier visit streams.
        def _safe_inv(r):
            d = jnp.reshape(r[...], (RB, 1))
            mag = jnp.maximum(jnp.abs(d), 1e-12)
            return 1.0 / jnp.where(d >= 0.0, mag, -mag)

        inv3 = (_safe_inv(dx_ref), _safe_inv(dy_ref), _safe_inv(dz_ref))
        seg_valid = tmax > tmin

    raw = count_ref[0, 0, 0]
    # overflow fallback: a block overlapping more chunks than the list can
    # hold streams the WHOLE chunk array in order (correctness over speed;
    # the any-hit early exit keeps this cheap for the shadow-ray case that
    # produces such blocks — unbounded directional-light segments)
    full = raw > list_ref.shape[-1]
    cnt = jnp.where(full, n_chunks, raw)

    def get_dma(slot, j):
        ci = jnp.where(full, j,
                       list_ref[0, 0, jnp.minimum(j, list_ref.shape[-1] - 1)])
        return pltpu.make_async_copy(tri_hbm.at[ci], scratch.at[slot],
                                     sems.at[slot])

    def chunk_math(carry, tri):
        # tri is a [group*rows, TC] superchunk: `group` leaf chunks of
        # math per DMA, static row offsets (Mosaic: no dynamic VMEM offsets)
        for g in range(group):
            if classic:
                o = g * PACK_ROWS_CLASSIC
                carry = _classic_origin_math(
                    k, eps_det, cull_back, mode, max_count, alpha,
                    o3, d3, tmin, tmax, za, zb,
                    tri[o + 0:o + 3],                             # v0
                    tri[o + 3:o + 6],                             # e1
                    tri[o + 6:o + 9],                             # e2
                    tri[o + 9:o + 10], tri[o + 10:o + 11],
                    tri[o + 11:o + 12].astype(jnp.int32), carry,
                    hit_gate=hit_gate, tail_bound=tail_bound)
            else:
                o = g * PACK_ROWS
                carry = _shared_origin_math(
                    k, eps_det, cull_back, mode, max_count, alpha,
                    d3, tmin, tmax, za, zb,
                    tri[o + 0:o + 3],                             # nt
                    tri[o + 3:o + 6],                             # bt
                    tri[o + 6:o + 9],                             # ct
                    tri[o + 9:o + 10],                            # tp = t*det
                    tri[o + 10:o + 11], tri[o + 11:o + 12],
                    tri[o + 12:o + 13].astype(jnp.int32), carry,
                    hit_gate=hit_gate, tail_bound=tail_bound)
        return carry

    init = tuple(jnp.full((RB, 1), INVALID, jnp.int32) for _ in range(k))
    if max_count is not None:
        init = init + (jnp.zeros((RB, 1), jnp.int32),)

    # 4-deep DMA pipeline: the 6 KB chunk transfers are latency-bound at
    # 2 slots (math per chunk ~ DMA latency); 3 outstanding prefetches keep
    # the queue full
    for p0 in range(nslot - 1):
        @pl.when(p0 < cnt)
        def _(p0=p0):
            get_dma(p0 % nslot, p0).start()

    def loop_body(j, carry):
        slot = j % nslot

        @pl.when(j + (nslot - 1) < cnt)
        def _():
            get_dma((j + (nslot - 1)) % nslot, j + (nslot - 1)).start()

        get_dma(slot, j).wait()
        if not ray_gate:
            return chunk_math(carry, scratch[slot])
        ci = jnp.where(full, j,
                       list_ref[0, 0, jnp.minimum(j, list_ref.shape[-1] - 1)])
        tn = jnp.full((RB, 1), -jnp.inf)
        tf = jnp.full((RB, 1), jnp.inf)
        for c, (o_c, inv_c) in enumerate(zip(o3, inv3)):
            a = (aabb_ref[0, c, ci] - o_c) * inv_c
            b = (aabb_ref[0, 3 + c, ci] - o_c) * inv_c
            tn = jnp.maximum(tn, jnp.minimum(a, b))
            tf = jnp.minimum(tf, jnp.maximum(a, b))
        # relative slack: extremal triangle vertices lie ON the AABB faces,
        # so fp rounding in tn/tf must never reject a boundary hit —
        # over-accepting only costs a redundant visit
        tol = 4e-6 * (1.0 + jnp.abs(tn) + jnp.abs(tf))
        hitq = seg_valid & (tn <= tf + tol) & (tf > tmin - tol) \
            & (tn < tmax + tol)
        return jax.lax.cond(jnp.any(hitq),
                            lambda c: chunk_math(c, scratch[slot]),
                            lambda c: c, carry)

    if early_exit and k == 1:
        # any-hit mode: stop streaming once every ray in the block has a
        # hit (shadow rays toward a directional light otherwise stream the
        # whole scene — 12 s/frame observed at SunTemple-full). The caller
        # orders chunks near-to-far along the mean ray direction so the
        # exit triggers early. Outstanding prefetches are drained so the
        # DMA semaphores are clean for the next grid step.
        def w_cond(state):
            j, r0 = state
            return jnp.logical_and(j < cnt, jnp.any(r0 == INVALID))

        def w_body(state):
            j, r0 = state
            (r0n,) = loop_body(j, (r0,))
            return (j + 1, r0n)

        j_exit, r0 = jax.lax.while_loop(w_cond, w_body, (0, init[0]))

        def drain(i, _):
            get_dma(i % nslot, i).wait()
            return 0

        jax.lax.fori_loop(j_exit, jnp.minimum(cnt, j_exit + (nslot - 1)),
                          drain, 0)
        res = (r0,)
    elif max_count is not None:
        # MAX_COUNT early exit — the TPU-native version of the reference's
        # traversal cap (Common.slangh:143): once every ray in the block has
        # counted max_count face-accepted hits, further chunks cannot
        # contribute, so stop streaming. On depth-complex scenes this is a
        # real bandwidth win (the GPU analogue is AcceptHitAndEndSearch).
        def c_cond(state):
            j, carry = state
            return jnp.logical_and(j < cnt,
                                   jnp.any(carry[k] < jnp.int32(max_count)))

        def c_body(state):
            j, carry = state
            return (j + 1, loop_body(j, carry))

        j_exit, res = jax.lax.while_loop(c_cond, c_body, (0, init))

        def drain2(i, _):
            get_dma(i % nslot, i).wait()
            return 0

        jax.lax.fori_loop(j_exit, jnp.minimum(cnt, j_exit + (nslot - 1)),
                          drain2, 0)
    else:
        res = jax.lax.fori_loop(0, cnt, loop_body, init)
    for s in range(k):
        out_refs[s][...] = jnp.reshape(res[s], (1, 1, RB))


TILE_RH, TILE_RW = 8, 32  # ray-block tile shape (TILE_RH*TILE_RW == RB)


def tile_flatten(a):
    """[H,W(,C)] -> [H*W(,C)] in 8x32-tile order: each kernel ray block then
    covers a compact 8x32 texel tile instead of a 256x1 strip, tightening
    the block's segment AABB ~10x on coherent depth fields. Pure reshapes/
    transposes — no gathers. H,W must be multiples of (8,32) (pad first)."""
    h, w = a.shape[:2]
    assert h % TILE_RH == 0 and w % TILE_RW == 0
    t = a.reshape((h // TILE_RH, TILE_RH, w // TILE_RW, TILE_RW) + a.shape[2:])
    t = jnp.swapaxes(t, 1, 2)
    return t.reshape((h * w,) + a.shape[2:])


def tile_unflatten(a, h, w):
    t = a.reshape((h // TILE_RH, w // TILE_RW, TILE_RH, TILE_RW) + a.shape[1:])
    t = jnp.swapaxes(t, 1, 2)
    return t.reshape((h, w) + a.shape[1:])


def pad_tile(a, fill=0.0):
    """Edge-pad [H,W(,C)] to (8,32) multiples; returns (padded, (H,W))."""
    h, w = a.shape[:2]
    ph, pw = (-h) % TILE_RH, (-w) % TILE_RW
    if ph or pw:
        a = jnp.pad(a, ((0, ph), (0, pw)) + ((0, 0),) * (a.ndim - 2),
                    constant_values=fill)
    return a, (h, w)


SUB_BUNDLES = 1  # segment-AABB granularity inside a ray block: sub > 1
                 # tests per 32-ray strips and ORs. Hardware A/B 2026-08-19
                 # (388k rays, 2526 chunks): sub=1 47.8 ms, sub=8 47.9,
                 # sub=32 48.1 — strip boxes are as fat as the tile box
                 # (the spread comes from the shared tmin/tmax interval
                 # range, not geometry across the tile), so the default
                 # stays 1. The knob remains for divergent-ray callers.
                 # Exactness either way: a triangle inside a chunk AABB
                 # cannot intersect a segment whose strip box misses that
                 # AABB, so dropped visits are identity merges.


def build_chunk_lists(aabb, origins, dirs, tmin, tmax, sub: int | None = None,
                      rx=None, ry=None):
    """Per-ray-block compacted overlapping-chunk lists (the 'TLAS walk',
    vectorized in XLA): aabb [8+, n_chunks] (rows 0-2 min, 3-5 max; rows
    6-11, when present with rx/ry, are the SCREEN cull block — see
    chunk_screen_rows). Returns (lists [nb, n_chunks] int32 padded with 0,
    counts [nb]). sub: sub-bundles per block for the overlap test (see
    SUB_BUNDLES). rx/ry: per-ray SD-texel coordinates (signed grid) — with
    a shared-origin pinhole fan the chunk's projected screen footprint and
    its origin-distance range cull far tighter than the world-space box
    test (the bundle box fattens with t-range x cone angle)."""
    sub = SUB_BUNDLES if sub is None else sub
    assert RB % sub == 0
    r = origins.shape[0]
    rp = r + ((-r) % RB)
    nb = rp // RB
    ns = nb * sub
    n_chunks = aabb.shape[1]

    def blk(a, fill=0.0):
        return jnp.pad(a, (0, rp - r), constant_values=fill) \
            .reshape(ns, RB // sub)

    tmin_b, tmax_b = blk(tmin), blk(tmax, fill=-1.0)
    valid = tmax_b > tmin_b

    los, his = [], []
    for c in range(3):
        o, d = blk(origins[:, c]), blk(dirs[:, c])
        a = o + d * tmin_b
        b = o + d * tmax_b
        lo = jnp.where(valid, jnp.minimum(a, b), jnp.inf).min(axis=1)
        hi = jnp.where(valid, jnp.maximum(a, b), -jnp.inf).max(axis=1)
        los.append(lo)
        his.append(hi)

    overlap_s = jnp.ones((ns, n_chunks), bool)
    for c in range(3):
        overlap_s &= (aabb[c][None, :] <= his[c][:, None]) \
            & (aabb[3 + c][None, :] >= los[c][:, None])

    if rx is not None and aabb.shape[0] >= 12:
        def rng(a):
            ab = blk(a)
            lo = jnp.where(valid, ab, jnp.inf).min(axis=1)
            hi = jnp.where(valid, ab, -jnp.inf).max(axis=1)
            return lo, hi

        bx0, bx1 = rng(rx)
        by0, by1 = rng(ry)
        bt0 = jnp.where(valid, tmin_b, jnp.inf).min(axis=1)
        bt1 = jnp.where(valid, tmax_b, -jnp.inf).max(axis=1)
        # rows: 6 x0, 7 y0, 8 dmin (min-unioned) | 9 x1, 10 y1, 11 dmax
        overlap_s &= (aabb[6][None, :] <= bx1[:, None]) \
            & (aabb[9][None, :] >= bx0[:, None]) \
            & (aabb[7][None, :] <= by1[:, None]) \
            & (aabb[10][None, :] >= by0[:, None]) \
            & (aabb[8][None, :] <= bt1[:, None]) \
            & (aabb[11][None, :] >= bt0[:, None])

    overlap = overlap_s.reshape(nb, sub, n_chunks).any(axis=1)

    counts = overlap.sum(axis=1).astype(jnp.int32)
    # scatter-free compaction: top_k of (n_chunks - idx | 0) yields the
    # overlapping chunk ids in ascending order without the [nb, n_chunks]
    # scatter (measured 28 ms at 1518x2526 on v5e — half the SD cost).
    # LIST_CAP bounds the per-block list; blocks overlapping more chunks
    # than that would drop hits, so it stays generously above the observed
    # maxima (150 @ SunTemple-full, morton-sorted chunks) and we fall back
    # to the exact scatter path if the cap could bind.
    if n_chunks > LIST_CAP * 2:
        keys = jnp.where(overlap,
                         jnp.int32(n_chunks)
                         - jnp.arange(n_chunks, dtype=jnp.int32)[None, :],
                         0)
        vals, _ = jax.lax.top_k(keys, LIST_CAP)        # descending
        lists = jnp.where(vals > 0, jnp.int32(n_chunks) - vals, 0)
        # counts returned UNCLAMPED: blocks overlapping more than LIST_CAP
        # chunks must not silently drop hits — the kernel streams ALL
        # chunks for such blocks (identity list fallback)
        return lists, counts
    rank = jnp.cumsum(overlap.astype(jnp.int32), axis=1) - 1
    rows = jnp.broadcast_to(jnp.arange(nb)[:, None], (nb, n_chunks))
    cols = jnp.where(overlap, rank, n_chunks)
    lists = jnp.zeros((nb, n_chunks + 1), jnp.int32).at[rows, cols].set(
        jnp.broadcast_to(jnp.arange(n_chunks, dtype=jnp.int32)[None, :],
                         (nb, n_chunks)), mode="drop")[:, :n_chunks]
    return lists, counts


@functools.partial(jax.jit, static_argnames=("num_samples", "cull_back",
                                             "early_exit", "mode",
                                             "max_count", "alpha",
                                             "group", "nslot", "hit_gate",
                                             "classic", "sub", "tail_bound",
                                             "ray_gate"))
def sd_trace_pallas_stream(tri_packed, aabb, origins, dirs, tmin, tmax,
                           vz_scale, near, far, *, num_samples: int = 4,
                           cull_back: bool = True, early_exit: bool = False,
                           mode: str = "default", max_count: int | None = None,
                           alpha: float = 0.2, group: int | None = None,
                           nslot: int | None = None, hit_gate: bool = True,
                           classic: bool = False, sub: int | None = None,
                           tail_bound: bool = True, ray_gate: bool = False,
                           rx=None, ry=None):
    """Streaming variant of sd_trace_pallas: tri_packed [n_chunks, PACK_ROWS,
    TC] stays in HBM; each ray block DMA-streams only the chunks whose AABB
    overlaps its segment bundle. Same reservoir semantics and packed-int32
    output as sd_trace_pallas.

    group: morton-consecutive chunks per list entry / DMA (superchunk; see
    SD_GROUP). nslot: DMA pipeline depth. Defaults = module constants.
    classic: tri_packed holds PACK_ROWS_CLASSIC raw rows (pack_for_stream_
    classic) and rays may have PER-RAY origins — the any-hit contract.
    rx/ry: per-ray signed SD-texel coordinates — enables the pinhole-fan
    screen cull when aabb carries chunk_screen_rows (rows 6-11)."""
    group = SD_GROUP if group is None else group
    nslot = NSLOT if nslot is None else nslot
    pack_rows = PACK_ROWS_CLASSIC if classic else PACK_ROWS
    r = origins.shape[0]
    rp = r + ((-r) % RB)
    nb = rp // RB
    n_chunks = aabb.shape[1]
    k = num_samples

    if group > 1:
        gpad = (-n_chunks) % group
        if gpad:
            # padding chunks are all-zero rows: det == 0 rejects every lane
            tri_packed = jnp.pad(tri_packed, ((0, gpad), (0, 0), (0, 0)))
            # empty AABB (min=+inf, max=-inf) never overlaps a segment;
            # screen rows 6:9/9:12 union with min/max, so pad +inf/-inf too
            nrow = aabb.shape[0]
            pad_cols = jnp.concatenate(
                [jnp.full((3, gpad), jnp.inf), jnp.full((3, gpad), -jnp.inf),
                 jnp.full((min(3, nrow - 6), gpad), jnp.inf),
                 jnp.full((max(nrow - 9, 0), gpad), -jnp.inf)], axis=0)
            aabb = jnp.concatenate([aabb, pad_cols], axis=1)
        n_super = aabb.shape[1] // group
        sg = aabb.reshape(aabb.shape[0], n_super, group)
        parts = [sg[:3].min(-1), sg[3:6].max(-1)]
        if aabb.shape[0] >= 12:
            parts += [sg[6:9].min(-1), sg[9:12].max(-1)]
        else:
            parts += [sg[6:].max(-1)]
        aabb = jnp.concatenate(parts, axis=0)
        tri_packed = tri_packed.reshape(n_super, group * pack_rows, TC)
        n_chunks = n_super

    lists, counts = build_chunk_lists(aabb, origins, dirs, tmin, tmax,
                                      sub=sub, rx=rx, ry=ry)
    lw = lists.shape[1]
    lp = lw + ((-lw) % 8)
    lists = jnp.pad(lists, ((0, 0), (0, lp - lw)))

    def col(a, pad_value=0.0):
        a = jnp.pad(a, (0, rp - r), constant_values=pad_value)
        return a.reshape(nb, 1, RB)

    inv_range = 1.0 / (far - near)
    za = vz_scale * inv_range
    zb = jnp.broadcast_to(near * inv_range, (r,))
    cols = [col(origins[:, 0]), col(origins[:, 1]), col(origins[:, 2]),
            col(dirs[:, 0]), col(dirs[:, 1]), col(dirs[:, 2]),
            col(tmin), col(tmax, pad_value=-1.0),
            col(za), col(zb)]

    kernel = functools.partial(_sd_stream_kernel, k, 1e-9, cull_back,
                               early_exit, n_chunks, mode, max_count, alpha,
                               group, nslot, hit_gate, classic, tail_bound,
                               ray_gate)
    count_spec = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                              memory_space=pltpu.SMEM)
    list_spec = pl.BlockSpec((1, 1, lp), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM)
    aabb_spec = pl.BlockSpec((1, aabb.shape[0], n_chunks),
                             lambda i: (0, 0, 0), memory_space=pltpu.SMEM)
    ray_spec = pl.BlockSpec((1, 1, RB), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec((1, 1, RB), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[count_spec, list_spec, aabb_spec] + [ray_spec] * 10
        + [tri_spec],
        out_specs=tuple([out_spec] * k),
        out_shape=tuple(jax.ShapeDtypeStruct((nb, 1, RB), jnp.int32)
                        for _ in range(k)),
        scratch_shapes=[pltpu.VMEM((nslot, group * pack_rows, TC),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA((nslot,))],
    )(counts[:, None, None], lists[:, None, :], aabb[None], *cols,
      tri_packed)
    return jnp.stack([o.reshape(rp) for o in outs], axis=1)[:r]


def chunk_screen_rows(aabb, origin, cam_u, cam_v, cam_w, dim_w, dim_h):
    """Screen-footprint + origin-distance rows for the pinhole-fan cull
    (build_chunk_lists rows 6-11): for each chunk AABB, the rect of signed
    SD-texel coords its projection can touch and its [dmin, dmax] euclidean
    distance range from the shared origin.

    Exact-conservative: a linear-fractional screen coordinate attains its
    extrema over a convex box at the CORNERS (given every corner is
    strictly in front, r.w > 0 — otherwise the rect is set infinite), the
    texel that samples a point at screen position p*dim is in
    [p*dim - 1, p*dim] (sub-texel jitter in [0, 1], Jitter.slangh:27), and
    any hit point inside the box lies at euclidean distance in [dmin, dmax]
    from the origin (SD rays are unit-direction, so ray t IS distance).
    Margins: 0.5 texel + relative slack swamp fp rounding of the corner
    projections.

    Returns [6, n_chunks]: (x0, y0, dmin, x1, y1, dmax)."""
    nc = aabb.shape[1]
    lo, hi = aabb[0:3], aabb[3:6]                    # [3, nc]
    o = jnp.reshape(origin, (3, 1))
    uu = jnp.sum(cam_u * cam_u)
    vv = jnp.sum(cam_v * cam_v)
    ww = jnp.sum(cam_w * cam_w)

    px0 = jnp.full((nc,), jnp.inf)
    px1 = jnp.full((nc,), -jnp.inf)
    py0 = jnp.full((nc,), jnp.inf)
    py1 = jnp.full((nc,), -jnp.inf)
    wmin = jnp.full((nc,), jnp.inf)
    for m in range(8):
        corner = jnp.stack([jnp.where((m >> c) & 1, hi[c], lo[c])
                            for c in range(3)])      # [3, nc]
        rel = corner - o
        a = (rel[0] * cam_u[0] + rel[1] * cam_u[1] + rel[2] * cam_u[2]) / uu
        b = (rel[0] * cam_v[0] + rel[1] * cam_v[1] + rel[2] * cam_v[2]) / vv
        w = (rel[0] * cam_w[0] + rel[1] * cam_w[1] + rel[2] * cam_w[2]) / ww
        wmin = jnp.minimum(wmin, w)
        ws = jnp.maximum(w, 1e-12)
        ndc_x = a / ws
        ndc_y = b / ws
        sx = (ndc_x + 1.0) * 0.5 * dim_w             # p.x * dim_w
        sy = (1.0 - ndc_y) * 0.5 * dim_h
        px0 = jnp.minimum(px0, sx)
        px1 = jnp.maximum(px1, sx)
        py0 = jnp.minimum(py0, sy)
        py1 = jnp.maximum(py1, sy)

    big = jnp.float32(3e38)
    front = wmin > 1e-9
    x0 = jnp.where(front, px0 - 1.5, -big)
    x1 = jnp.where(front, px1 + 0.5, big)
    y0 = jnp.where(front, py0 - 1.5, -big)
    y1 = jnp.where(front, py1 + 0.5, big)

    # euclidean distance range from the origin to the box
    gap = jnp.maximum(jnp.maximum(lo - o, o - hi), 0.0)
    dmin = jnp.sqrt(jnp.sum(gap * gap, axis=0))
    far = jnp.maximum(jnp.abs(lo - o), jnp.abs(hi - o))
    dmax = jnp.sqrt(jnp.sum(far * far, axis=0))
    dmin = dmin * (1.0 - 1e-5)
    dmax = dmax * (1.0 + 1e-5) + 1e-5
    # empty (padding) chunks: min == +big in the box rows -> keep their
    # screen rows never-overlapping too
    empty = aabb[0] > 1e37
    x0 = jnp.where(empty, big, x0)
    x1 = jnp.where(empty, -big, x1)
    return jnp.stack([x0, y0, dmin, x1, y1, dmax])


def pack_for_stream(v0t, e1t, e2t, flags, origin):
    """[3,Tp] component arrays + flags + shared ray origin [3] ->
    (tri_packed [n_chunks, PACK_ROWS, TC], chunk AABBs [8, n_chunks]) for
    the streaming kernel. The packed rows are the shared-origin
    intersection rows (shared_origin_rows), so they are per-FRAME data
    (origin-dependent) — repacked under jit each frame, which XLA fuses
    into a single cheap elementwise pass over the scene arrays."""
    tp = v0t.shape[1]
    n_chunks = tp // TC
    nt, bt, ct, tpk = shared_origin_rows(v0t, e1t, e2t, origin)
    packed = jnp.concatenate([nt, bt, ct, tpk, flags], axis=0)
    tri_packed = packed.reshape(PACK_ROWS, n_chunks, TC).transpose(1, 0, 2)
    aabb = chunk_aabbs(v0t, e1t, e2t, flags)
    return tri_packed, aabb


def pack_for_stream_classic(v0t, e1t, e2t, flags):
    """Classic-row packing for per-ray-origin traces (any-hit): raw
    v0/e1/e2 + flags, [n_chunks, PACK_ROWS_CLASSIC, TC]. Origin-independent
    — packable once per scene, not per frame."""
    tp = v0t.shape[1]
    n_chunks = tp // TC
    packed = jnp.concatenate([v0t, e1t, e2t, flags], axis=0)
    tri_packed = packed.reshape(PACK_ROWS_CLASSIC, n_chunks, TC) \
        .transpose(1, 0, 2)
    return tri_packed, chunk_aabbs(v0t, e1t, e2t, flags)


def prep_triangles_packed(scene, alpha_test: bool = True, origin=None):
    """Pack triangles for the streaming kernel: tri_packed [n_chunks,
    PACK_ROWS, TC] (shared-origin rows + accept-backface/reject flags) in
    HBM order + chunk AABBs [8, n_chunks] (jit-traceable). origin defaults
    to the scene camera position (the SD trace contract)."""
    if origin is None:
        origin = scene.camera.pos_w
    return pack_for_stream(*prep_triangles(scene, alpha_test),
                           jnp.asarray(origin))


def chunk_aabbs(v0t, e1t, e2t, flags):
    """Chunk AABBs [8, n_chunks] (6 rows used); rejected (padding/alpha-fail)
    triangles don't extend the bounds."""
    tp = v0t.shape[1]
    n_chunks = tp // TC
    v0r = v0t.T.reshape(n_chunks, TC, 3)
    e1r = e1t.T.reshape(n_chunks, TC, 3)
    e2r = e2t.T.reshape(n_chunks, TC, 3)
    rej = (flags[1].reshape(n_chunks, TC, 1) > 0.0)
    corners = jnp.stack([v0r, v0r + e1r, v0r + e2r], axis=2)  # [nc,TC,3,3]
    big = jnp.float32(3e38)
    cmin = jnp.where(rej[:, :, None], big, corners).min((1, 2))
    cmax = jnp.where(rej[:, :, None], -big, corners).max((1, 2))
    aabb = jnp.zeros((8, n_chunks))
    return aabb.at[0:3].set(cmin.T).at[3:6].set(cmax.T)


def prep_triangles(scene, alpha_test: bool = True):
    """Pack triangles for the kernel (jit-traceable): component-major padded
    arrays [3, Tp] + flags [3, Tp] (accept-backface, reject, alpha coverage
    mask as a float-held 16-bit bitmap). Padding slots are rejected
    in-kernel; alpha-tested hits test their barycentric cell against the
    baked mask (scene.tri_alpha_mask — the TPU stand-in for the reference's
    hashed-alpha any-hit, StochasticDepthMapRT.rt.slang:31-37)."""
    pos = scene.positions
    t = pos.shape[0]
    tp = t + ((-t) % TC)
    mid = scene.material_id
    dbl = scene.mat_double_sided[mid]
    is_alpha = scene.mat_alpha_mode[mid] == 1
    acc = (dbl | is_alpha).astype(jnp.float32)
    if alpha_test:
        mask = jnp.where(is_alpha, scene.tri_alpha_mask, 0xFFFF)
    else:
        mask = jnp.full((t,), 0xFFFF, jnp.int32)
    reject = jnp.zeros((t,), jnp.float32)

    def padT(a, value=0.0):
        return jnp.pad(a, ((0, tp - t),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=value)

    v0 = padT(pos[:, 0]).T
    e1 = padT(pos[:, 1] - pos[:, 0]).T
    e2 = padT(pos[:, 2] - pos[:, 0]).T
    flags = jnp.stack([padT(acc), padT(reject, value=1.0),
                       padT(mask.astype(jnp.float32))], axis=0)
    return v0, e1, e2, flags


def decode_packed(packed, near, far, normalize=True, mode="default"):
    """packed int32 reservoir -> depths (see ops/rt.py packing; the bit
    layout depends on the insertion mode)."""
    if mode == "kbuffer":
        d = jnp.where(packed == INVALID, 1.0,
                      (packed // 32768).astype(jnp.float32) / 65535.0)
    elif mode == "coverage":
        d = jnp.where(packed == INVALID, 1.0,
                      packed.astype(jnp.float32) / 65535.0)
    else:
        d = jnp.where(packed == INVALID, 1.0,
                      (packed % 65536).astype(jnp.float32) / 65535.0)
    if normalize:
        return d
    return jnp.where(packed == INVALID, far, d * (far - near) + near)


def any_hit_pallas(scene, origins, dirs, tmin, tmax, alpha_test: bool = True):
    """Boolean shadow-ray occlusion through the streaming kernel (k=1,
    classic rows): hit = the 1-slot reservoir caught anything. Both faces
    block (RayShadow semantics, RayShadow.ps.slang:131-186 — no cull flags
    on shadow rays).

    Shadow/visibility rays have PER-RAY origins, so this always routes
    through the classic-origin streaming tier (the shared-origin collapse
    the SD kernels use would evaluate every ray from origins[0] — wrong
    geometry for all but one pixel)."""
    v0t, e1t, e2t, flags = prep_triangles(scene, alpha_test)
    flags = flags.at[0].set(1.0)  # back faces block shadow rays
    vz = jnp.ones_like(tmin)      # depth output unused
    tri_packed, aabb = pack_for_stream_classic(v0t, e1t, e2t, flags)
    # near-to-far chunk order along the mean ray direction: with the
    # kernel's any-hit early exit, most blocks terminate after the
    # first few occluder chunks instead of streaming the scene
    md = jnp.mean(dirs, axis=0)
    cent = (aabb[0:3] + aabb[3:6]) * 0.5
    order = jnp.argsort(cent[0] * md[0] + cent[1] * md[1]
                        + cent[2] * md[2])
    packed = sd_trace_pallas_stream(tri_packed[order], aabb[:, order],
                                    origins, dirs, tmin, tmax, vz,
                                    0.0, 1.0, num_samples=1,
                                    cull_back=False, early_exit=True,
                                    classic=True)
    return packed[:, 0] != INVALID
