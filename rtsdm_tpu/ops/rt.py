"""TPU-native ray tracing over flattened triangle soups.

Replaces DXR TraceRay / RayQuery (reference Scene::raytrace Scene.cpp:388-406,
inline queries SVAORaster2.ps.slang:9-46, RayShadow.ps.slang:131-186).

Design: rays are a flat [R] batch; triangles are processed in static-size
chunks under `lax.scan` with Möller-Trumbore evaluated [R, CHUNK]-wide and
immediately reduced — XLA fuses the intersection math into the reduction so
the [R, CHUNK] tensor never materializes in HBM. This is the brute-force
tier; an LBVH tier (sorted morton ranges as chunks with early interval
rejection) plugs into the same reducers.

Front-face convention: det = dot(e1, cross(dir, e2)) > 0 <=> geometric normal
faces the ray origin (matches DXR CandidateTriangleFrontFace for CCW winding).

Reservoir/any-hit semantics for stochastic depth maps are implemented as
merge-based bottom-k selection (see sd_trace): statistically equivalent to
the reference's streaming reservoir insertion (StochasticDepthMapRT/
Common.slangh:137-151) — both draw a uniform k-subset of all hits — but
expressible as a vectorized top_k instead of a sequential insert.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_CHUNK = 256

CULL_NONE = 0
CULL_BACK = 1


def _pad_tris(positions, chunk):
    t = positions.shape[0]
    pad = (-t) % chunk
    if pad:
        # degenerate padding triangles never hit
        positions = jnp.concatenate(
            [positions, jnp.zeros((pad, 3, 3), positions.dtype)], axis=0)
    return positions, (t + pad) // chunk


def _mt_intersect(origins, dirs, v0, e1, e2, cull):
    """Möller-Trumbore, broadcast [R,1,3] x [1,K,3] -> [R,K] hits.

    Returns (t, valid, front, bary_uv)."""
    o = origins[:, None, :]
    d = dirs[:, None, :]
    pvec = jnp.cross(d, e2[None, :, :])
    det = jnp.sum(e1[None] * pvec, -1)
    eps = 1e-9
    if cull == CULL_BACK:
        ok = det > eps
    else:
        ok = jnp.abs(det) > eps
    inv_det = 1.0 / jnp.where(jnp.abs(det) < eps, 1.0, det)
    tvec = o - v0[None]
    u = jnp.sum(tvec * pvec, -1) * inv_det
    qvec = jnp.cross(tvec, e1[None])
    v = jnp.sum(d * qvec, -1) * inv_det
    t = jnp.sum(e2[None] * qvec, -1) * inv_det
    valid = ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    return t, valid, det > 0.0, (u, v)


@functools.partial(jax.jit, static_argnames=("chunk", "cull"))
def any_hit(scene, origins, dirs, tmin, tmax, chunk: int = DEFAULT_CHUNK,
            cull: int = CULL_NONE):
    """True where any triangle intersects (tmin, tmax). Shadow-ray kernel
    (RayShadow.ps.slang traceShadowRay)."""
    tris, n_chunks = _pad_tris(scene.positions, chunk)
    v0 = tris[:, 0]
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]

    def body(hit, idx):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, idx * chunk, chunk)
        t, valid, _, _ = _mt_intersect(origins, dirs, sl(v0), sl(e1), sl(e2), cull)
        h = jnp.any(valid & (t > tmin[:, None]) & (t < tmax[:, None]), axis=1)
        return hit | h, None

    hit0 = jnp.zeros(origins.shape[0], bool)
    hit, _ = jax.lax.scan(body, hit0, jnp.arange(n_chunks))
    return hit


@functools.partial(jax.jit, static_argnames=("chunk", "cull"))
def closest_hit(scene, origins, dirs, tmin, tmax, chunk: int = DEFAULT_CHUNK,
                cull: int = CULL_NONE):
    """Nearest intersection: returns (t, tri_id) with t=tmax & id=-1 on miss."""
    tris, n_chunks = _pad_tris(scene.positions, chunk)
    v0, e1, e2 = tris[:, 0], tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]

    def body(carry, idx):
        best_t, best_id = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, idx * chunk, chunk)
        t, valid, _, _ = _mt_intersect(origins, dirs, sl(v0), sl(e1), sl(e2), cull)
        t = jnp.where(valid & (t > tmin[:, None]) & (t < tmax[:, None]), t, jnp.inf)
        k = jnp.argmin(t, axis=1)
        tk = jnp.take_along_axis(t, k[:, None], axis=1)[:, 0]
        better = tk < best_t
        best_id = jnp.where(better, idx * chunk + k, best_id)
        best_t = jnp.where(better, tk, best_t)
        return (best_t, best_id), None

    r = origins.shape[0]
    init = (jnp.full((r,), jnp.inf), jnp.full((r,), -1, jnp.int32))
    (t, tid), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return jnp.where(tid >= 0, t, tmax), tid


def _front_accept(scene, chunk_ids, front, bary_uv, alpha_test: bool):
    """aoAnyHit's face logic (SVAO/Common.slang:679-697): front-face OR
    double-sided OR alpha-tested counts as front; alpha-masked hits test the
    baked per-triangle 4x4 coverage bitmap at their barycentric cell (the
    stand-in for textured hashed-alpha, Common.slangh:155-175).

    chunk_ids: [K] triangle ids; front/bary: [R,K] per-hit. Returns [R,K]."""
    mid = scene.material_id[chunk_ids]
    dbl = scene.mat_double_sided[mid]
    is_alpha = scene.mat_alpha_mode[mid] == 1
    ok = front | dbl[None, :] | is_alpha[None, :]
    if alpha_test:
        u, v = bary_uv
        mask = jnp.where(is_alpha, scene.tri_alpha_mask[chunk_ids], 0xFFFF)
        cell = (jnp.clip(u * 4.0, 0.0, 3.0).astype(jnp.int32)
                + 4 * jnp.clip(v * 4.0, 0.0, 3.0).astype(jnp.int32))
        bit = jax.lax.shift_right_logical(
            jnp.broadcast_to(mask[None, :], cell.shape), cell) & 1
        ok = ok & (bit > 0)
    return ok


@functools.partial(jax.jit, static_argnames=("chunk", "cull", "alpha_test",
                                              "ray_block"))
def vao_interval_query(scene, origins, dirs, tmin, tmax, t_sphere_start,
                       chunk: int = DEFAULT_CHUNK, cull: int = CULL_NONE,
                       alpha_test: bool = True, ray_block: int = 65536):
    """The VAO refinement ray (SVAO/Common.slang:699-713 + traceAORay,
    SVAORaster2.ps.slang:9-46): over front hits with t in (tmin, tmax),
      t_last_halo  = max t with t <= t_sphere_start   (halo blocker)
      t_first_in   = min t with t >  t_sphere_start   (inside-sphere hit)
    Returns (t_last_halo, t_first_in) with -inf/+inf when no such hit."""
    tris, n_chunks = _pad_tris(scene.positions, chunk)
    v0, e1, e2 = tris[:, 0], tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]
    tri_ids_all = jnp.arange(tris.shape[0]) % max(scene.positions.shape[0], 1)

    def body_block(carry, idx, o, d, tn, tx, ts):
        last_halo, first_in = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, idx * chunk, chunk)
        t, valid, front, uv = _mt_intersect(o, d, sl(v0), sl(e1), sl(e2), cull)
        in_pad = (idx * chunk + jnp.arange(chunk)) >= scene.positions.shape[0]
        ok = valid & _front_accept(scene, sl(tri_ids_all), front, uv,
                                   alpha_test) & ~in_pad[None, :]
        ok = ok & (t > tn[:, None]) & (t < tx[:, None])
        halo = ok & (t <= ts[:, None])
        inside = ok & (t > ts[:, None])
        last_halo = jnp.maximum(last_halo, jnp.max(jnp.where(halo, t, -jnp.inf), axis=1))
        first_in = jnp.minimum(first_in, jnp.min(jnp.where(inside, t, jnp.inf), axis=1))
        return (last_halo, first_in), None

    def body(carry, idx):
        return body_block(carry, idx, origins, dirs, tmin, tmax,
                          t_sphere_start)

    r = origins.shape[0]

    # Block the rays so the per-step intermediates stay [RB, chunk] instead
    # of [r, chunk] — at 1080p+guard-band r is ~6-8M rays and a single
    # full-width step would materialize tens of GB (observed OOM at
    # f32[8.4M,256,3]). lax.map over ray blocks keeps peak memory flat.
    RB = ray_block
    if r > RB:
        pad = (-r) % RB
        def pad0(a, fill=0.0):
            return jnp.concatenate([a, jnp.full((pad,) + a.shape[1:], fill,
                                                a.dtype)]) if pad else a
        ob = pad0(origins).reshape(-1, RB, 3)
        db = pad0(dirs).reshape(-1, RB, 3)
        tminb = pad0(tmin).reshape(-1, RB)
        tmaxb = pad0(tmax, -1.0).reshape(-1, RB)
        tsb = pad0(t_sphere_start).reshape(-1, RB)

        def one_block(args):
            o, d, tn, tx, ts = args
            def bodyb(carry, idx):
                return body_block(carry, idx, o, d, tn, tx, ts)
            init = (jnp.full((RB,), -jnp.inf), jnp.full((RB,), jnp.inf))
            out, _ = jax.lax.scan(bodyb, init, jnp.arange(n_chunks))
            return out

        lh, fi = jax.lax.map(one_block, (ob, db, tminb, tmaxb, tsb))
        return lh.reshape(-1)[:r], fi.reshape(-1)[:r]

    init = (jnp.full((r,), -jnp.inf), jnp.full((r,), jnp.inf))
    (last_halo, first_in), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return last_halo, first_in


_SD_INVALID = jnp.int32(2**31 - 1)


def _pack_key_depth(key, d_norm, ok):
    """Pack (selection key in [0,1), normalized depth in [0,1]) into one
    int32: 15-bit key | 16-bit depth. Min over packed values selects the
    min-key hit with its (quantized) depth attached — the trick that makes
    bottom-k selection pure elementwise+reduce (no sorts, no gathers)."""
    k15 = jnp.clip((key * 32767.0).astype(jnp.int32), 0, 32766)
    d16 = jnp.clip((d_norm * 65535.0).astype(jnp.int32), 0, 65535)
    return jnp.where(ok, k15 * 65536 + d16, _SD_INVALID)


@functools.partial(jax.jit,
                   static_argnames=("num_samples", "chunk", "cull",
                                    "alpha_test", "kbuffer", "normalize",
                                    "implementation", "max_count", "alpha"))
def sd_trace(scene, origins, dirs, tmin, tmax, *, num_samples: int = 4,
             normalize: bool = True, kbuffer: bool = False,
             chunk: int = 128, cull: int = CULL_BACK, alpha_test: bool = True,
             implementation: str = "default", max_count: int | None = None,
             alpha: float = 0.2):
    """Stochastic depth trace: one ray per SD texel, keep `num_samples` hit
    depths (reference StochasticDepthMapRT rayGen + algorithm(),
    Common.slangh:102-254). Three insertion algorithms:

      * "default" reservoir: global bottom-k by key = hash(barycentrics) — a
        uniform random k-subset of the participating hits in (tmin, tmax),
        matching the reference's streaming reservoir insertion in
        distribution (Common.slangh:137-151).
      * "coverage": each hit covers R = floor(alpha*k + rng) stratified
        slots (mask from the stratified tables, Common.slangh:117-131);
        slot s keeps the NEAREST depth among hits covering s — the
        order-independent limit of the reference's per-slot z-test loop
        (Common.slangh:196-210). Pure per-slot masked min: no bottom-k.
      * "kbuffer": key = depth — the k nearest hits (Common.slangh:211-232).

    `max_count` models the reference's MAX_COUNT traversal cap
    (Common.slangh:143, default mMaxCount=8 in StochasticDepthMapRT.h:82):
    only the first `max_count` face-accepted hits participate. The GPU cap
    follows the (unordered) BVH traversal; here the canonical order is the
    morton-sorted chunk/triangle order — equally arbitrary, deterministic,
    and matching the Pallas kernels' streaming order. Alpha-failed hits
    still count toward the cap (the reference increments `count` before its
    alpha test, Common.slangh:139 vs :160). None = uncapped. Coverage mode
    ignores the cap like the reference does.

    Implementation: per triangle chunk, the chunk's k best hits are extracted
    with k (min, mask) passes over packed int32 (key|depth) values and merged
    into the running reservoir with k more passes — everything fuses into a
    single elementwise+reduce kernel per chunk, nothing materializes in HBM
    (the earlier top_k formulation was sort-bound).

    Returns depths [R, num_samples] normalized to [0,1] by near/far when
    `normalize` (Common.slangh:113-115); missing samples hold 1.0 (or far)."""
    from ..utils.math import hash2, hash3
    from ..utils.sampling import stratified_coverage_tables

    impl = "kbuffer" if kbuffer else implementation
    cap = None if impl == "coverage" else max_count

    tris, n_chunks = _pad_tris(scene.positions, chunk)
    v0, e1, e2 = tris[:, 0], tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]
    t_count = scene.positions.shape[0]
    tri_ids_all = jnp.arange(tris.shape[0]) % max(t_count, 1)
    cam = scene.camera
    cos_w = jnp.sum(dirs * (cam.camera_w / jnp.linalg.norm(cam.camera_w)), -1)
    near, far = cam.near_z, cam.far_z

    r = origins.shape[0]
    k = num_samples
    if impl == "coverage":
        idx_np, lut_np = stratified_coverage_tables(k)
        cov_indices = jnp.asarray(idx_np.astype(np.int32))
        cov_lookup = jnp.asarray(lut_np.astype(np.int32))

    def body(carry, idx):
        packed, count = carry  # [R, k] int32 reservoir; [R] hit count
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, idx * chunk, chunk)
        t, valid, front, (u, v) = _mt_intersect(origins, dirs, sl(v0), sl(e1),
                                                sl(e2), cull)
        in_pad = (idx * chunk + jnp.arange(chunk)) >= t_count
        base = valid & ~in_pad[None, :] \
            & (t > tmin[:, None]) & (t < tmax[:, None])
        # face-accept WITHOUT alpha (counts toward the cap), then alpha
        ok_face = base & _front_accept(scene, sl(tri_ids_all), front, (u, v),
                                       False)
        ok = ok_face if not alpha_test else \
            base & _front_accept(scene, sl(tri_ids_all), front, (u, v), True)
        if cap is not None:
            ordinal = jnp.cumsum(ok_face.astype(jnp.int32), axis=1) \
                - ok_face.astype(jnp.int32)  # exclusive, within chunk
            ok = ok & ((count[:, None] + ordinal) < cap)
            count = count + jnp.sum(ok_face, axis=1)
        view_z = t * cos_w[:, None]
        d_norm = jnp.clip((view_z - near) / (far - near), 0.0, 1.0)
        d16 = jnp.clip((d_norm * 65535.0).astype(jnp.int32), 0, 65535)
        if impl == "coverage":
            rng = hash2(jnp.stack([u, v], -1))
            r_cnt = jnp.clip(jnp.floor(alpha * k + rng).astype(jnp.int32),
                             0, k)
            rng2 = hash3(jnp.stack([u, v, d_norm], -1))
            lo = cov_indices[r_cnt]
            hi = cov_indices[jnp.minimum(r_cnt + 1, k + 1)]
            sel = lo + (rng2 * (hi - lo).astype(jnp.float32)).astype(jnp.int32)
            mask = cov_lookup[jnp.clip(sel, 0, cov_lookup.shape[0] - 1)]
            mask = jnp.where(r_cnt >= k, (1 << k) - 1, mask)
            pk_d = jnp.where(ok, d16, _SD_INVALID)
            cols = []
            for s in range(k):
                covered = ((mask >> s) & 1) > 0
                m = jnp.min(jnp.where(covered, pk_d, _SD_INVALID), axis=1)
                cols.append(jnp.minimum(packed[:, s], m))
            return (jnp.stack(cols, axis=1), count), None
        if impl == "kbuffer":
            # depth-major packing with a hash tie-break in the LOW bits:
            # equal quantized depths stay distinct, so coplanar/shared-edge
            # duplicate hits survive the min-extraction like the reference's
            # k-buffer insertion sort keeps them (Common.slangh:211-232)
            h15 = jnp.clip((hash2(jnp.stack([u, v], -1))
                            * 32767.0).astype(jnp.int32), 0, 32766)
            pk = jnp.where(ok, d16 * 32768 + h15, _SD_INVALID)
        else:
            key = hash2(jnp.stack([u, v], -1))
            pk = _pack_key_depth(key, d_norm, ok)  # [R, C]

        # extract the chunk's k minima (ties collapse — harmless for hashes)
        cand = []
        for _ in range(k):
            m = jnp.min(pk, axis=1)            # [R]
            cand.append(m)
            pk = jnp.where(pk == m[:, None], _SD_INVALID, pk)
        both = jnp.concatenate([packed, jnp.stack(cand, axis=1)], axis=1)  # [R,2k]
        out = []
        for _ in range(k):
            m = jnp.min(both, axis=1)
            out.append(m)
            both = jnp.where(both == m[:, None], _SD_INVALID, both)
        return (jnp.stack(out, axis=1), count), None

    init = (jnp.full((r, k), _SD_INVALID, jnp.int32),
            jnp.zeros((r,), jnp.int32))
    (packed, _), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    if impl == "kbuffer":
        d_norm = jnp.where(packed == _SD_INVALID, 1.0,
                           (packed // 32768).astype(jnp.float32) / 65535.0)
    elif impl == "coverage":
        d_norm = jnp.where(packed == _SD_INVALID, 1.0,
                           packed.astype(jnp.float32) / 65535.0)
    else:
        d_norm = jnp.where(packed == _SD_INVALID, 1.0,
                           (packed % 65536).astype(jnp.float32) / 65535.0)
    if normalize:
        return d_norm
    return jnp.where(packed == _SD_INVALID, far,
                     d_norm * (far - near) + near)
