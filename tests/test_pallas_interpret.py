"""CPU parity coverage of the Pallas TPU kernels via interpret mode.

CI runs on CPU and previously never executed the Pallas kernel bodies
(only the on-TPU tools/pallas_parity.py did). Pallas interpret mode runs
the same kernel python (DMA copies emulated) on CPU, so the kernel LOGIC —
intersection math, reservoir insertion modes, chunk-list traversal,
closest-hit raster — is regression-tested in CI. Perf and Mosaic-lowering
behavior remain TPU-only (tools/pallas_parity.py).
"""
import contextlib
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtsdm_tpu.ops import rt_pallas as rp
from rtsdm_tpu.scene.procedural import cornell_box


@contextlib.contextmanager
def interpret_mode(*modules):
    """Patch pl.pallas_call in the given modules to interpret=True."""
    patches = []
    for m in modules:
        orig = m.pl.pallas_call

        def patched(*a, _orig=orig, **kw):
            kw["interpret"] = True
            return _orig(*a, **kw)

        patches.append(mock.patch.object(m.pl, "pallas_call", patched))
    with contextlib.ExitStack() as st:
        for p in patches:
            st.enter_context(p)
        yield


def _rays(scene, n=256, seed=7, res=256):
    cam = scene.camera
    rng = np.random.default_rng(seed)
    px = rng.uniform(0, res, (n, 2)).astype(np.float32)
    origin, dirs = cam.compute_ray_pinhole(jnp.asarray(px), (res, res),
                                           jitter=jnp.full((n, 2), 0.5))
    origins = jnp.broadcast_to(origin, (n, 3))
    tmin = jnp.asarray(rng.uniform(0.0, 2.0, n).astype(np.float32))
    tmax = tmin + jnp.asarray(rng.uniform(0.5, 6.0, n).astype(np.float32))
    cosw = jnp.sum(dirs * (cam.camera_w / jnp.linalg.norm(cam.camera_w)), -1)
    return origins, dirs, tmin, tmax, cosw


def _oracle(scene, origins, dirs, tmin, tmax):
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.pallas_parity import numpy_oracle_depths
    return numpy_oracle_depths(scene, origins, dirs,
                               np.asarray(tmin), np.asarray(tmax))


@pytest.fixture(scope="module")
def cornell_trace():
    scene = cornell_box()
    cam = scene.camera
    origins, dirs, tmin, tmax, cosw = _rays(scene)
    v0t, e1t, e2t, flags = rp.prep_triangles(scene, True)
    tri_packed, aabb = rp.prep_triangles_packed(scene, True)
    with interpret_mode(rp):
        res = np.asarray(rp.sd_trace_pallas(
            v0t, e1t, e2t, flags, origins, dirs, tmin, tmax, cosw,
            cam.near_z, cam.far_z, num_samples=4))
        stm = np.asarray(rp.sd_trace_pallas_stream(
            tri_packed, aabb, origins, dirs, tmin, tmax, cosw,
            cam.near_z, cam.far_z, num_samples=4))
    oracle = _oracle(scene, origins, dirs, tmin, tmax)
    return dict(scene=scene, res=res, stm=stm, oracle=oracle,
                args=(v0t, e1t, e2t, flags, origins, dirs, tmin, tmax, cosw))


def test_resident_vs_stream_bitexact(cornell_trace):
    # resident vs stream: identical hit SETS and identical quantized depths.
    # The 15-bit selection keys are NOT compared: they hash (u, v), and the
    # shared-origin rows are computed inside each wrapper's own jit — XLA's
    # FMA contraction can differ between the two programs by ulps, which
    # the hash avalanches into unrelated keys (depths are unaffected; when
    # hits exceed k the reservoir may then keep a different — equally
    # valid — subset, which the oracle-subset test below still bounds).
    res, stm = cornell_trace["res"], cornell_trace["stm"]
    assert ((res == rp.INVALID) == (stm == rp.INVALID)).all()
    counts = (res != rp.INVALID).sum(1)
    full = counts == res.shape[1]  # selection pressure: sets may differ
    d_res = np.where(res == rp.INVALID, -1, res % 65536)
    d_stm = np.where(stm == rp.INVALID, -1, stm % 65536)
    assert (np.sort(d_res[~full], 1) == np.sort(d_stm[~full], 1)).all()


def test_hits_subset_of_oracle_and_count(cornell_trace):
    res, oracle = cornell_trace["res"], cornell_trace["oracle"]
    d_pal = np.where(res == rp.INVALID, np.nan,
                     (res % 65536).astype(np.float64) / 65535.0)
    for i in range(res.shape[0]):
        got = np.sort(d_pal[i][~np.isnan(d_pal[i])])
        want = oracle[i]
        assert len(got) == min(4, len(want)), i
        for g in got:  # every kept depth is a real hit (16-bit quantized)
            assert np.min(np.abs(want - g)) < 2e-4 if len(want) else True


@pytest.fixture(scope="module")
def arcade_trace():
    """Multi-chunk stream fixture: 1170 tris = 10 chunks of TC=128, so
    superchunk grouping covers multiple REAL chunks per group and multiple
    superchunks per block (the Cornell fixture is exactly 1 chunk — its
    group>1 path only ever exercised the all-padding superchunk)."""
    from rtsdm_tpu.scene.procedural import arcade
    scene = arcade()
    cam = scene.camera
    origins, dirs, tmin, tmax, cosw = _rays(scene, n=512, seed=19)
    tri_packed, aabb = rp.prep_triangles_packed(scene, True)
    with interpret_mode(rp):
        stm = np.asarray(rp.sd_trace_pallas_stream(
            tri_packed, aabb, origins, dirs, tmin, tmax, cosw,
            cam.near_z, cam.far_z, num_samples=4))
    assert tri_packed.shape[0] >= 3 * 2  # >= 3 superchunks at group=2
    assert (stm != rp.INVALID).any()
    return dict(scene=scene, stm=stm,
                rays=(origins, dirs, tmin, tmax, cosw))


@pytest.mark.parametrize("fixture_name", ["cornell_trace", "arcade_trace"])
@pytest.mark.parametrize("group,nslot,hit_gate", [(2, 4, True), (4, 8, True),
                                                  (1, 4, False)])
def test_stream_group_and_gate_bitexact(request, fixture_name, group, nslot,
                                        hit_gate):
    """Superchunk grouping visits a SUPERSET of chunks (union super-AABBs
    admit false-positive visits) in the same relative order, and merging an
    all-miss chunk is the identity on the reservoir; the any(ok_face) tail
    gate skips only identity merges. Both must be bit-identical to the
    (group=1, gate-on) default. nslot only changes the DMA pipeline depth,
    never the math. Runs on both the 1-chunk Cornell fixture (all-padding
    superchunk path) and the 10-chunk Arcade fixture (multiple real chunks
    per superchunk, multiple superchunks per list)."""
    tr = request.getfixturevalue(fixture_name)
    scene = tr["scene"]
    if fixture_name == "cornell_trace":
        _, _, _, _, origins, dirs, tmin, tmax, cosw = tr["args"]
    else:
        origins, dirs, tmin, tmax, cosw = tr["rays"]
    cam = scene.camera
    tri_packed, aabb = rp.prep_triangles_packed(scene, True)
    with interpret_mode(rp):
        got = np.asarray(rp.sd_trace_pallas_stream(
            tri_packed, aabb, origins, dirs, tmin, tmax, cosw,
            cam.near_z, cam.far_z, num_samples=4, group=group, nslot=nslot,
            hit_gate=hit_gate))
    assert (got == tr["stm"]).all()


@pytest.mark.parametrize("fixture_name", ["cornell_trace", "arcade_trace"])
def test_stream_screen_cull_and_ray_gate_bitexact(request, fixture_name):
    """The pinhole-fan screen cull (chunk_screen_rows + rx/ry) and the
    in-kernel per-ray slab gate only drop visits that cannot contribute —
    the reservoir must be bit-identical to the ungated baseline."""
    tr = request.getfixturevalue(fixture_name)
    scene = tr["scene"]
    if fixture_name == "cornell_trace":
        _, _, _, _, origins, dirs, tmin, tmax, cosw = tr["args"]
    else:
        origins, dirs, tmin, tmax, cosw = tr["rays"]
    cam = scene.camera
    res = 256
    # recover the pixel coords the fixture's rays were built from:
    # _rays uses jitter=0.5, so signed = p*res - 0.5; chunk_screen_rows'
    # [-1.5, +0.5] texel margin covers the 0.5 offset
    uu = jnp.sum(cam.camera_u * cam.camera_u)
    vv = jnp.sum(cam.camera_v * cam.camera_v)
    ww = jnp.sum(cam.camera_w * cam.camera_w)
    au = jnp.sum(dirs * cam.camera_u, -1) / uu
    av = jnp.sum(dirs * cam.camera_v, -1) / vv
    aw = jnp.sum(dirs * cam.camera_w, -1) / ww
    rx = (au / aw + 1.0) * 0.5 * res - 0.5
    ry = (1.0 - av / aw) * 0.5 * res - 0.5
    tri_packed, aabb = rp.prep_triangles_packed(scene, True)
    scr = rp.chunk_screen_rows(aabb, origins[0], cam.camera_u, cam.camera_v,
                               cam.camera_w, res, res)
    aabb12 = jnp.concatenate([aabb[:6], scr], axis=0)
    with interpret_mode(rp):
        got = np.asarray(rp.sd_trace_pallas_stream(
            tri_packed, aabb12, origins, dirs, tmin, tmax, cosw,
            cam.near_z, cam.far_z, num_samples=4, rx=rx, ry=ry))
        ungated = np.asarray(rp.sd_trace_pallas_stream(
            tri_packed, aabb, origins, dirs, tmin, tmax, cosw,
            cam.near_z, cam.far_z, num_samples=4, ray_gate=False))
    assert (got == tr["stm"]).all()
    assert (ungated == tr["stm"]).all()


def test_any_hit_classic_per_ray_origins(arcade_trace):
    """any_hit_pallas routes through the classic-origin streaming tier:
    rays with PER-RAY origins (the shadow-ray / ReSTIR contract) must match
    the XLA oracle rt.any_hit — the old shared-origin routing evaluated
    every ray from origins[0]."""
    from rtsdm_tpu.ops import rt
    scene = arcade_trace["scene"]
    rng = np.random.default_rng(17)
    n = 512
    pts = np.asarray(scene.positions.reshape(-1, 3))
    smin, smax = pts.min(0), pts.max(0)
    origins = jnp.asarray(rng.uniform(smin, smax, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirs = jnp.asarray(d)
    tmin = jnp.full((n,), 1e-3, jnp.float32)
    tmax = jnp.asarray(rng.uniform(0.5, 60.0, n).astype(np.float32))
    with interpret_mode(rp):
        got = np.asarray(rp.any_hit_pallas(scene, origins, dirs, tmin, tmax,
                                           alpha_test=False))
    ref = np.asarray(rt.any_hit(scene, origins, dirs, tmin, tmax))
    assert got.any() and not got.all()
    np.testing.assert_array_equal(got, ref)


def test_kbuffer_mode_keeps_nearest(cornell_trace):
    scene = cornell_trace["scene"]
    v0t, e1t, e2t, flags, origins, dirs, tmin, tmax, cosw = \
        cornell_trace["args"]
    cam = scene.camera
    with interpret_mode(rp):
        kb = np.asarray(rp.sd_trace_pallas(
            v0t, e1t, e2t, flags, origins, dirs, tmin, tmax, cosw,
            cam.near_z, cam.far_z, num_samples=4, mode="kbuffer"))
    oracle = cornell_trace["oracle"]
    d = np.where(kb == rp.INVALID, np.nan,
                 (kb // 32768).astype(np.float64) / 65535.0)
    for i in range(kb.shape[0]):
        got = np.sort(d[i][~np.isnan(d[i])])
        want = oracle[i][:4]  # nearest-k of the sorted oracle set
        assert len(got) == len(want), i
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_max_count_cap_reduces_hits(cornell_trace):
    """With max_count=1 each ray keeps at most 1 sample, and it must be a
    real hit (the first face-accepted one in stream order)."""
    scene = cornell_trace["scene"]
    v0t, e1t, e2t, flags, origins, dirs, tmin, tmax, cosw = \
        cornell_trace["args"]
    cam = scene.camera
    with interpret_mode(rp):
        capped = np.asarray(rp.sd_trace_pallas(
            v0t, e1t, e2t, flags, origins, dirs, tmin, tmax, cosw,
            cam.near_z, cam.far_z, num_samples=4, max_count=1))
    oracle = cornell_trace["oracle"]
    d = np.where(capped == rp.INVALID, np.nan,
                 (capped % 65536).astype(np.float64) / 65535.0)
    for i in range(capped.shape[0]):
        got = d[i][~np.isnan(d[i])]
        assert len(got) <= 1
        if len(oracle[i]):
            assert len(got) == 1
            assert np.min(np.abs(oracle[i] - got[0])) < 2e-4


def test_coverage_mode_slots_nearest_of_covered(cornell_trace):
    """Coverage mode: every slot value is either empty or a real hit depth,
    and the nearest hit appears in at least one slot when any hit exists
    (alpha=0.9 -> most hits cover most slots)."""
    scene = cornell_trace["scene"]
    v0t, e1t, e2t, flags, origins, dirs, tmin, tmax, cosw = \
        cornell_trace["args"]
    cam = scene.camera
    with interpret_mode(rp):
        cov = np.asarray(rp.sd_trace_pallas(
            v0t, e1t, e2t, flags, origins, dirs, tmin, tmax, cosw,
            cam.near_z, cam.far_z, num_samples=4, mode="coverage",
            alpha=0.9))
    oracle = cornell_trace["oracle"]
    d = np.where(cov == rp.INVALID, np.nan, cov.astype(np.float64) / 65535.0)
    for i in range(cov.shape[0]):
        got = d[i][~np.isnan(d[i])]
        for g in got:
            assert np.min(np.abs(oracle[i] - g)) < 2e-4
        if len(oracle[i]) and len(got):
            assert np.min(np.abs(got - oracle[i][0])) < 2e-4


def test_raster_pallas_matches_xla_tiles():
    """The Pallas sort-middle raster agrees with the XLA rasterizer on
    covered pixels (tri_id + depth) on the Cornell box."""
    from rtsdm_tpu.ops import raster as rx
    from rtsdm_tpu.ops import raster_pallas as rpx

    scene = cornell_box()
    w = h = 128
    vp = scene.camera.view_proj_mat
    ref = jax.jit(lambda: rx.rasterize(vp, scene.positions, width=w,
                                       height=h))()
    with interpret_mode(rpx):
        got = rpx.rasterize_pallas(vp, scene.positions, width=w, height=h)
    rid, gid = np.asarray(ref["tri_id"]), np.asarray(got["tri_id"])
    rz, gz = np.asarray(ref["depth"]), np.asarray(got["depth"])
    # coverage must agree everywhere
    assert ((rid >= 0) == (gid >= 0)).mean() > 0.999
    both = (rid >= 0) & (gid >= 0)
    # depths agree; ids agree except where coplanar tie-breaks differ
    assert np.abs(rz[both] - gz[both]).max() < 1e-5
    assert (rid[both] == gid[both]).mean() > 0.99


def test_raster_stochastic_pallas_matches_xla():
    """k-slot stochastic raster, Pallas vs XLA tier. The tiers use
    different (equally valid) fragment hashes, so slot CONTENTS only agree
    where the sampling is deterministic: at alpha=1.0 every fragment
    covers every slot and each slot is the min candidate depth — exact
    parity there covers the whole fragment/interval logic. At alpha<1
    coverage (any slot hit) must still agree exactly."""
    from rtsdm_tpu.ops import raster_pallas as rpx
    from rtsdm_tpu.passes.stochastic_depth import _raster_stochastic

    scene = cornell_box()
    cam = scene.camera
    w = h = 96
    k = 4
    first = jnp.zeros((h, w), jnp.float32)
    rmin = jnp.full((h, w), 0.5, jnp.float32)
    rmax = jnp.full((h, w), cam.far_z, jnp.float32)

    def run(alpha):
        ref = np.asarray(_raster_stochastic(scene, w, h, k, alpha, first,
                                            rmin, rmax))
        with interpret_mode(rpx):
            got = np.asarray(rpx.raster_stochastic_pallas(
                cam.view_proj_no_jitter, scene.positions, cam.far_z,
                width=w, height=h, k=k, alpha=alpha,
                first_depth=first, ray_min=rmin, ray_max=rmax))
        return ref, got

    ref, got = run(1.0)
    np.testing.assert_allclose(got, ref, atol=1e-4)
    ref, got = run(0.5)
    far = float(cam.far_z)
    assert (((ref < far).any(-1)) == ((got < far).any(-1))).all()
    assert (got < far).any()


def test_fetch_attributes_matches_interpolate_oracle():
    """Deferred-materialize kernel (one-hot MXU fetch) == XLA interpolate/
    flat_fetch on a full-coverage visibility buffer."""
    from rtsdm_tpu.ops import raster_pallas as rpx
    from rtsdm_tpu.ops.raster import rasterize, interpolate, flat_fetch
    scene = cornell_box()
    w = h = 96
    vis = rasterize(scene.camera.view_proj_mat, scene.positions,
                    width=w, height=h)
    tid, bary = vis["tri_id"], vis["bary"]
    with interpret_mode(rpx):
        pos, nrm, uv, fn, mid = rpx.fetch_attributes_pallas(
            tid, bary,
            [scene.positions, scene.normals, scene.texcoords],
            [scene.face_normals(), scene.material_id])
    hit = np.asarray(tid) >= 0
    assert hit.any()
    np.testing.assert_allclose(np.asarray(pos),
                               np.asarray(interpolate(tid, bary,
                                                      scene.positions)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(nrm),
                               np.asarray(interpolate(tid, bary,
                                                      scene.normals)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(uv),
                               np.asarray(interpolate(tid, bary,
                                                      scene.texcoords)),
                               atol=1e-5)
    ref_fn = np.where(hit[..., None],
                      np.asarray(flat_fetch(tid, scene.face_normals())), 0.0)
    np.testing.assert_allclose(np.asarray(fn) * hit[..., None], ref_fn,
                               atol=1e-6)
    ref_mid = np.where(hit, np.asarray(flat_fetch(tid, scene.material_id)), 0)
    np.testing.assert_array_equal(np.asarray(mid) * hit, ref_mid)


def test_fetch_attributes_flat_only_vertex_rows():
    """nci=0 mode (raw vertex rows as flats — the RT bary path)."""
    from rtsdm_tpu.ops import raster_pallas as rpx
    from rtsdm_tpu.ops.raster import rasterize
    scene = cornell_box()
    vis = rasterize(scene.camera.view_proj_mat, scene.positions,
                    width=64, height=64)
    tid = vis["tri_id"]
    with interpret_mode(rpx):
        (v9,) = rpx.fetch_attributes_pallas(
            tid, jnp.zeros(tid.shape + (2,)), [],
            [scene.positions.reshape(-1, 9)])
    hit = np.asarray(tid) >= 0
    ref = np.asarray(scene.positions.reshape(-1, 9))[
        np.maximum(np.asarray(tid), 0)]
    np.testing.assert_allclose(np.asarray(v9)[hit], ref[hit], atol=1e-6)


def test_fused_dir_fetch_matches_fetch_direction():
    """ops/fetch_pallas.py fused all-direction fetch == per-direction
    ao_shift.fetch_direction, bit-exact, all 8 directions + dual set."""
    import rtsdm_tpu.ops.fetch_pallas as FP
    import rtsdm_tpu.ops.ao_shift as S
    import rtsdm_tpu.ops.ao as A

    rng = np.random.default_rng(3)
    h, w = 64, 128
    depth = jnp.asarray(rng.uniform(1.0, 20.0, (h, w)).astype(np.float32))
    depth2 = depth + 0.5
    radius_px = jnp.asarray(
        rng.uniform(0.5, 60.0, (h, w)).astype(np.float32))

    class Cfg:
        num_directions = 8

        def radii(self):
            return [((i % 4) + 1) / 4.0 for i in range(8)]

    levels, offs, radii = S.offset_tables(Cfg(), 64.0)
    pad = int(-(-float(levels[-1]) // 4)) + 1
    qh, qw = h // 4, w // 4
    dpp = S.pad_planes(S.deinterleave(depth), pad)
    d2pp = S.pad_planes(S.deinterleave(depth2), pad)
    rq = S.deinterleave(radius_px)

    with interpret_mode(FP):
        got1, got2 = FP.fetch_all_directions([dpp, d2pp], pad, rq,
                                             levels, offs, radii)
    for i in range(8):
        lvl_p = S.deinterleave(A.shift_level_index(levels,
                                                   radius_px * radii[i]))
        ref1 = S.fetch_direction(dpp, pad, lvl_p, offs[i], qh, qw)
        ref2 = S.fetch_direction(d2pp, pad, lvl_p, offs[i], qh, qw)
        np.testing.assert_array_equal(np.asarray(got1[i]), np.asarray(ref1))
        np.testing.assert_array_equal(np.asarray(got2[i]), np.asarray(ref2))


def test_fused_sd_fetch_matches_fetch_sd_direction():
    """fetch_sd_all_directions (divisor 4) == fetch_sd_direction, bit-exact
    on 16-bit-grid depths (the ray SD tier's native quantization — the
    kernel packs layer pairs into int32 planes; raster-tier inputs off the
    grid round by <= 0.5/65535, covered by the tolerance case below)."""
    import rtsdm_tpu.ops.fetch_pallas as FP
    import rtsdm_tpu.ops.ao_shift as S
    import rtsdm_tpu.ops.ao as A

    rng = np.random.default_rng(11)
    h, w = 64, 128
    qh, qw = h // 4, w // 4
    guard, k = 24, 4
    # normalized depths ON the 16-bit grid (what decode_packed produces)
    sd_map = jnp.asarray(
        (rng.integers(0, 65536, (qh + 2 * guard, qw + 2 * guard, k))
         .astype(np.float32) / 65535.0))
    radius_px = jnp.asarray(rng.uniform(0.5, 60.0, (h, w)).astype(np.float32))

    class Cfg:
        num_directions = 8

        def radii(self):
            return [((i % 4) + 1) / 4.0 for i in range(8)]

    levels, offs, radii = S.offset_tables(Cfg(), 64.0)
    pad = int(-(-float(levels[-1]) // 4)) + 1
    rq = S.deinterleave(radius_px)
    with interpret_mode(FP):
        got = FP.fetch_sd_all_directions(sd_map, guard, rq, levels, offs,
                                         radii, pad)
    assert got is not None
    for i in range(8):
        lvl_p = S.deinterleave(A.shift_level_index(levels,
                                                   radius_px * radii[i]))
        ref = S.fetch_sd_direction(sd_map, lvl_p, offs[i], guard, qh, qw, 4)
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(ref))

    # off-grid (raster-tier) inputs: quantization bounded by 0.5/65535
    sd_c = jnp.asarray(rng.uniform(0.0, 1.0, sd_map.shape)
                       .astype(np.float32))
    with interpret_mode(FP):
        got_c = FP.fetch_sd_all_directions(sd_c, guard, rq, levels, offs,
                                           radii, pad)
    lvl_p = S.deinterleave(A.shift_level_index(levels, radius_px * radii[0]))
    ref_c = S.fetch_sd_direction(sd_c, lvl_p, offs[0], guard, qh, qw, 4)
    assert np.abs(np.asarray(got_c[0]) - np.asarray(ref_c)).max() \
        <= 0.5 / 65535.0 + 1e-7


def test_phase2_shift_fused_matches_fallback():
    """svao_phase2_shift with the fused Pallas fetches (packed16 SD path)
    == the XLA fallback tier, bit-exact on 16-bit-grid SD maps (the ray SD
    tier's native output grid)."""
    from unittest import mock as _mock

    from rtsdm_tpu.passes import svao_shift as ph
    from rtsdm_tpu.passes.gbuffer import raster_gbuffer
    from rtsdm_tpu.passes.svao import SVAO, _normals_to_view
    from rtsdm_tpu.rendergraph.render_pass import RenderContext
    from rtsdm_tpu.utils.math import (encode_normal_2x16, normalize,
                                      transform_vector)
    import rtsdm_tpu.ops.fetch_pallas as FP

    w = h = 96
    scene = cornell_box()
    cam = scene.camera
    g = raster_gbuffer(scene, w, h)
    lin = cam.linearize_depth(g["depth"])
    nv_in = encode_normal_2x16(normalize(
        transform_vector(cam.view_mat, g["faceNormalW"])))
    p = SVAO({"secondaryDepthMode": "StochasticDepth",
              "stochasticDepthImpl": "Ray", "radius": 0.5,
              "stochMapDivisor": 4, "stochMapGuardBand": 64,
              "exponent": 2.0})
    p.set_scene(scene)
    ctx = RenderContext(width=w, height=h, scene=scene,
                        dictionary={"guardBand": 0})
    cfg = p._vao_cfg(ctx, (w, h))
    nv = _normals_to_view(ctx, nv_in)
    p1 = ph.svao_phase1_shift(cam, cfg, lin, lin, nv, 0, "SingleDepth",
                              "StochasticDepth")
    sw, sh = p._stoch_map_size((w, h))
    rng = np.random.default_rng(7)
    sd_map = jnp.asarray(np.sort(
        rng.integers(0, 65536, (sh, sw, 4)), axis=-1)
        .astype(np.float32) / 65535.0)

    ref = ph.svao_phase2_shift(cam, cfg, lin, lin, nv, p1["stencil"],
                               sd_map, "SingleDepth")
    with interpret_mode(FP), \
            _mock.patch.object(ph, "FUSED_FETCH", "on"):
        got = ph.svao_phase2_shift(cam, cfg, lin, lin, nv, p1["stencil"],
                                   sd_map, "SingleDepth")
    assert np.abs(np.asarray(ref)).max() > 0.0
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_warp_kernel_matches_xla_resample():
    """ops/warp_pallas.py == temporal._catmull_rom/_bilinear (incl. edge
    clamp + extreme out-of-bounds motion)."""
    import rtsdm_tpu.ops.warp_pallas as WP
    from rtsdm_tpu.passes.temporal import _bilinear, _catmull_rom, _grid_uv

    rng = np.random.default_rng(5)
    h, w = 160, 288  # > the small-map threshold: exercises the windowed
    tex = jnp.asarray(rng.random((h, w, 3)).astype(np.float32))
    mv = (np.stack([np.sin(np.linspace(0, 3, w))[None, :].repeat(h, 0),
                    np.cos(np.linspace(0, 2, h))[:, None].repeat(w, 1)], -1)
          * 6.0).astype(np.float32)
    uv = np.asarray(_grid_uv(h, w))
    sp = jnp.asarray((uv + mv / [w, h]) * np.asarray([w, h], np.float32))
    texp = jnp.moveaxis(tex, -1, 0)
    fb = jnp.full_like(texp, -9.0)
    with interpret_mode(WP):
        cr = WP.warp_resample_pallas(texp, sp[..., 0], sp[..., 1], fb,
                                     mode="catmull_rom")
        bl = WP.warp_resample_pallas(texp, sp[..., 0], sp[..., 1], fb,
                                     mode="bilinear")
        oob = WP.warp_resample_pallas(texp, sp[..., 0] + 500.0,
                                      sp[..., 1] - 300.0, fb,
                                      mode="catmull_rom")
    ref_cr = _catmull_rom(tex, sp)
    ref_bl = _bilinear(tex, jnp.asarray(uv + mv / [w, h]))
    sp2u = (np.asarray(sp) + [500.0, -300.0]) / [w, h] * [w, h]
    ref_oob = _catmull_rom(tex, jnp.asarray(sp2u))
    assert np.abs(np.asarray(jnp.moveaxis(cr, 0, -1)) - ref_cr).max() < 1e-4
    assert np.abs(np.asarray(jnp.moveaxis(bl, 0, -1)) - ref_bl).max() < 1e-4
    assert np.abs(np.asarray(jnp.moveaxis(oob, 0, -1)) - ref_oob).max() < 1e-4
    assert not (np.asarray(cr) == -9.0).any()  # no fallback on smooth motion


def test_warp_kernel_env_map_whole_region():
    """Small maps get a whole-map region: exact for ARBITRARY (incoherent)
    sample fields — the env-map lookup path (wrap in x, clamp in y)."""
    import rtsdm_tpu.ops.warp_pallas as WP
    from rtsdm_tpu.scene.textures import latlong_sky, sample_env

    rng = np.random.default_rng(9)
    env = jnp.asarray(latlong_sky())
    dirs = jnp.asarray(rng.normal(size=(40, 144, 3)).astype(np.float32))
    ref = np.asarray(sample_env(env, dirs))  # CPU gather path
    d = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True),
                           1e-8)
    he, we = env.shape[:2]
    v = jnp.arccos(jnp.clip(d[..., 1], -1, 1)) / jnp.pi * he - 0.5
    u = (jnp.arctan2(d[..., 2], d[..., 0]) + jnp.pi) / (2 * jnp.pi) * we - 0.5
    with interpret_mode(WP):
        got = jnp.moveaxis(WP.warp_resample_pallas(
            jnp.moveaxis(env, -1, 0), u + 0.5, v + 0.5,
            jnp.zeros((3, 40, 144)), mode="bilinear", wrap_x=True), 0, -1)
    assert np.abs(np.asarray(got) - ref).max() < 1e-5


def test_warp_kernel_page_atlas():
    """sample_pages TPU path (stacked wrap-padded page atlas through the
    whole-map warp region) == the XLA gather path."""
    from unittest import mock as _mock

    import jax as _jax

    import rtsdm_tpu.ops.warp_pallas as WP
    import rtsdm_tpu.scene.textures as TX

    rng = np.random.default_rng(13)
    n = 6
    pages = jnp.asarray(rng.random((n, TX.PAGE, TX.PAGE, 3))
                        .astype(np.float32))
    h, w = 40, 144
    uv = jnp.asarray((rng.random((h, w, 2)).astype(np.float32) - 0.3) * 4.0)
    pidx = jnp.asarray(rng.integers(-1, n, (h, w)).astype(np.int32))
    ref = np.asarray(TX.sample_pages(pages, pidx, uv))
    fake_dev = [type("D", (), {"platform": "tpu"})()]
    with interpret_mode(WP), \
            _mock.patch.object(_jax, "devices", lambda *a, **k: fake_dev):
        got = np.asarray(TX.sample_pages(pages, pidx, uv))
    assert np.abs(got - ref).max() < 1e-4


def test_warp_whole_map_criterion_is_honest():
    """whole_map_exact(h, w) must exactly bound the sizes where the warp
    kernel is fallback-free for ARBITRARY sample fields: at the largest
    allowed size an adversarial corner-to-corner field stays exact; one
    step wider and the same field lands on the fallback (the black-seam
    failure sample_env's routing guard exists to prevent)."""
    import rtsdm_tpu.ops.warp_pallas as WP

    rng = np.random.default_rng(11)

    def run(h, w):
        tex = jnp.asarray(rng.random((1, h, w)).astype(np.float32))
        # corner-to-corner spread inside every block: worst case for the
        # motion-bounded region, trivial for a whole-map region
        sx = jnp.asarray(rng.random((16, 256)).astype(np.float32)) * (w - 1)
        sy = jnp.asarray(rng.random((16, 256)).astype(np.float32)) * (h - 1)
        fb = jnp.full((1, 16, 256), -9.0, jnp.float32)
        with interpret_mode(WP):
            out = WP.warp_resample_pallas(tex, sx + 0.5, sy + 0.5, fb,
                                          mode="bilinear")
        return np.asarray(out)

    assert WP.whole_map_exact(768, 256)
    assert not (run(768, 256) == -9.0).any()

    assert not WP.whole_map_exact(64, 512)
    assert (run(64, 512) == -9.0).any()


def test_fetch_taps_same_class_matches_fetch_slices():
    """fetch_taps_same_class == passes/hbao._fetch_slices per (dir, step),
    bit-exact (the HBAO ring's fused Pallas tier)."""
    import rtsdm_tpu.ops.fetch_pallas as FP
    import rtsdm_tpu.ops.ao_shift as S
    import rtsdm_tpu.ops.ao as A
    from rtsdm_tpu.passes.hbao import HBAO_NOISE, _fetch_slices

    rng = np.random.default_rng(23)
    h, w = 128, 256
    qh, qw = h // 4, w // 4
    depth = jnp.asarray(rng.uniform(1.0, 30.0, (16, qh, qw))
                        .astype(np.float32))
    ray0 = jnp.asarray(rng.uniform(0.5, 40.0, (16, qh, qw))
                       .astype(np.float32))
    levels = A.shift_radius_levels(48.0)
    pad = int(np.ceil(levels[-1]))
    dpp = S.pad_planes(depth, pad)

    n_dirs, n_steps = 4, 3
    dir_nps = []
    for i in range(n_dirs):
        th = 2.0 * np.pi * i / n_dirs
        dir_nps.append(np.stack(
            [HBAO_NOISE[:, 0] * np.cos(th) - HBAO_NOISE[:, 1] * np.sin(th),
             HBAO_NOISE[:, 0] * np.sin(th) + HBAO_NOISE[:, 1] * np.cos(th)],
            axis=-1).astype(np.float32))
    offs_key = tuple(
        tuple(tuple((int(round(float(r) * d_np[s, 1])),
                     int(round(float(r) * d_np[s, 0])))
                    for r in levels) for s in range(16))
        for d_np in dir_nps)
    lvls = [A.shift_level_index(levels,
                                jnp.clip(ray0 * (1.0 + 0.7 * k), 1.0, 48.0))
            for k in range(n_steps)]

    with interpret_mode(FP):
        got = FP.fetch_taps_same_class([dpp], jnp.stack(lvls), pad=pad,
                                       offs_key=offs_key,
                                       taps_per_dir=n_steps)
    for i in range(n_dirs):
        offs_i = [list(offs_key[i][s]) for s in range(16)]
        for k in range(n_steps):
            ref = _fetch_slices(dpp, pad, lvls[k], offs_i, qh, qw)
            np.testing.assert_array_equal(
                np.asarray(got[0, i * n_steps + k]), np.asarray(ref))
