"""Fast on-device Pallas kernel smoke: compiles and parity-checks every
gather-elimination kernel on the CURRENT platform at small shapes.

Purpose: the interpret-mode tests (tests/test_pallas_interpret.py) prove the
kernel MATH; this proves the MOSAIC COMPILE on real hardware — dynamic-start
slices, SMEM scalar tables, pl.when-gated DMAs and revisiting semantics only
exercise on TPU. Run this FIRST after any kernel change before spending an
acceptance hour on the big benches (~2 min on a v5e).

Usage: python tools/kernel_smoke.py          # current platform (TPU default)
Exit code 0 = all kernels compile and match their XLA tier bit-exactly.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


RESULTS = []  # (name, ok, seconds) — dumped by --json


def _check(name, fn):
    t0 = time.perf_counter()
    try:
        fn()
    except Exception as e:  # noqa: BLE001 - report and keep probing
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
        RESULTS.append((name, False, round(time.perf_counter() - t0, 1)))
        return False
    dt = time.perf_counter() - t0
    print(f"ok   {name} ({dt:.1f}s)")
    RESULTS.append((name, True, round(dt, 1)))
    return True


class _Cfg:
    num_directions = 8

    def radii(self):
        return [((i % 4) + 1) / 4.0 for i in range(8)]


def smoke_fetch_fused():
    import rtsdm_tpu.ops.ao as A
    import rtsdm_tpu.ops.ao_shift as S
    import rtsdm_tpu.ops.fetch_pallas as FP

    rng = np.random.default_rng(3)
    h, w = 256, 512
    depth = jnp.asarray(rng.uniform(1.0, 20.0, (h, w)).astype(np.float32))
    radius_px = jnp.asarray(rng.uniform(0.5, 60.0, (h, w)).astype(np.float32))
    levels, offs, radii = S.offset_tables(_Cfg(), 64.0)
    pad = int(-(-float(levels[-1]) // 4)) + 1
    qh, qw = h // 4, w // 4
    dpp = S.pad_planes(S.deinterleave(depth), pad)
    rq = S.deinterleave(radius_px)
    (got,) = FP.fetch_all_directions([dpp], pad, rq, levels, offs, radii)
    for i in (0, 5):
        lvl_p = S.deinterleave(A.shift_level_index(levels,
                                                   radius_px * radii[i]))
        ref = S.fetch_direction(dpp, pad, lvl_p, offs[i], qh, qw)
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(ref))


def smoke_fetch_sd():
    import rtsdm_tpu.ops.ao as A
    import rtsdm_tpu.ops.ao_shift as S
    import rtsdm_tpu.ops.fetch_pallas as FP

    rng = np.random.default_rng(11)
    h, w = 256, 512
    qh, qw = h // 4, w // 4
    guard, k = 24, 4
    # NORMALIZED depths on the 16-bit grid — the SD map contract (the ray
    # tier's reservoir is 16-bit quantized; the packed fetch is bit-exact
    # exactly on this grid)
    sd_map = jnp.asarray(
        rng.integers(0, 65536, (qh + 2 * guard, qw + 2 * guard, k))
        .astype(np.float32) / 65535.0)
    radius_px = jnp.asarray(rng.uniform(0.5, 60.0, (h, w)).astype(np.float32))
    levels, offs, radii = S.offset_tables(_Cfg(), 64.0)
    pad = int(-(-float(levels[-1]) // 4)) + 1
    rq = S.deinterleave(radius_px)
    got = FP.fetch_sd_all_directions(sd_map, guard, rq, levels, offs,
                                     radii, pad)
    assert got is not None, "SD table fallback fired at smoke shapes"
    for i in (0, 7):
        lvl_p = S.deinterleave(A.shift_level_index(levels,
                                                   radius_px * radii[i]))
        ref = S.fetch_sd_direction(sd_map, lvl_p, offs[i], guard, qh, qw, 4)
        # 1-ulp tolerance: the packed tier's n/65535 unpack divide is
        # correctly rounded on CPU (bit-exact there) but TPU fp32 divide
        # is reciprocal-based and misses by <=1 ulp on ~0.7% of texels
        # (measured 2026-08-19, max abs 6e-8)
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(ref),
                                   rtol=0, atol=1.3e-7)


def smoke_warp():
    from rtsdm_tpu.ops.warp_pallas import warp_resample_pallas
    from rtsdm_tpu.passes.temporal import _catmull_rom, _grid_uv

    rng = np.random.default_rng(5)
    h, w = 160, 288
    tex = jnp.asarray(rng.random((h, w, 3)).astype(np.float32))
    mv = (np.stack([np.sin(np.linspace(0, 3, w))[None, :].repeat(h, 0),
                    np.cos(np.linspace(0, 2, h))[:, None].repeat(w, 1)], -1)
          * 6.0).astype(np.float32)
    uv = np.asarray(_grid_uv(h, w))
    sp = jnp.asarray((uv + mv / [w, h]) * np.asarray([w, h], np.float32))
    texp = jnp.moveaxis(tex, -1, 0)
    fb = jnp.full_like(texp, -9.0)
    got = warp_resample_pallas(texp, sp[..., 0], sp[..., 1], fb,
                               mode="catmull_rom")
    ref = _catmull_rom(tex, sp)
    err = np.abs(np.asarray(jnp.moveaxis(got, 0, -1)) - np.asarray(ref)).max()
    assert err < 1e-4, err


def smoke_fetch_taps():
    import sys as _sys
    import os as _os
    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..",
                                      "tests"))
    from test_pallas_interpret import \
        test_fetch_taps_same_class_matches_fetch_slices as t

    # run the interpret test's body with the REAL pallas_call (the
    # interpret_mode patch becomes a no-op when invoked outside pytest on
    # TPU: we re-patch it to identity)
    import unittest.mock as mock

    import test_pallas_interpret as T

    @__import__("contextlib").contextmanager
    def passthrough(*mods):
        yield

    with mock.patch.object(T, "interpret_mode", passthrough):
        t()


def smoke_fetch_attrs():
    from rtsdm_tpu.ops.raster import fetch_vertex_attributes, interpolate
    from rtsdm_tpu.ops.raster_pallas import fetch_attributes_pallas

    rng = np.random.default_rng(11)
    t, h, w = 9000, 96, 256          # t above PALLAS_RASTER_MIN_TRIS
    tri_id = jnp.asarray(
        rng.integers(-1, t, (h, w)).astype(np.int32))
    b = rng.uniform(0, 1, (h, w, 2)).astype(np.float32)
    bary = jnp.asarray(b * (b.sum(-1, keepdims=True) < 1))
    interp = [jnp.asarray(rng.random((t, 3, 3)).astype(np.float32)),
              jnp.asarray(rng.random((t, 3, 2)).astype(np.float32))]
    flats = [jnp.asarray(rng.integers(0, 7, (t,)).astype(np.int32))]
    got = fetch_attributes_pallas(tri_id, bary, interp, flats)
    for g, tab in zip(got, interp):
        ref = interpolate(tri_id, bary, tab)
        np.testing.assert_allclose(np.asarray(g), np.asarray(ref),
                                   atol=2e-6)
    fl = np.asarray(got[-1])
    ref_fl = np.where(np.asarray(tri_id) >= 0,
                      np.asarray(flats[0])[np.maximum(np.asarray(tri_id), 0)],
                      0)
    np.testing.assert_array_equal(fl.astype(np.int32), ref_fl)


def smoke_raster():
    # tessellate the box so the triangle count exceeds
    # PALLAS_RASTER_MIN_TRIS — a 36-tri scene takes the XLA binning path
    # and would leave the Pallas sort-middle kernel untested on hardware
    from rtsdm_tpu.ops.raster import PALLAS_RASTER_MIN_TRIS, rasterize
    from rtsdm_tpu.scene.procedural import cornell_box

    scene = cornell_box()
    tris = np.asarray(scene.positions)            # [T,3,3]
    for _ in range(4):                            # 4x midpoint subdivision
        a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
        ab, bc, ca = (a + b) / 2, (b + c) / 2, (c + a) / 2
        tris = np.concatenate([
            np.stack([a, ab, ca], 1), np.stack([ab, b, bc], 1),
            np.stack([ca, bc, c], 1), np.stack([ab, bc, ca], 1)])
    assert tris.shape[0] > PALLAS_RASTER_MIN_TRIS, tris.shape
    out = rasterize(scene.camera.view_proj_mat,
                    jnp.asarray(tris.astype(np.float32)),
                    width=256, height=256, cull="back")
    depth = np.asarray(out["depth"])
    cov = float((depth < 1.0).mean())
    assert cov > 0.99, f"coverage {cov}"


def smoke_sd_trace():
    import sys as _sys
    import os as _os
    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..",
                                      "tests"))
    from test_pallas_interpret import _rays

    import rtsdm_tpu.ops.rt_pallas as rp
    from rtsdm_tpu.scene.procedural import cornell_box

    scene = cornell_box()
    cam = scene.camera
    origins, dirs, tmin, tmax, cosw = _rays(scene)
    v0t, e1t, e2t, flags = rp.prep_triangles(scene, True)
    tri_packed, aabb = rp.prep_triangles_packed(scene, True)
    res = np.asarray(rp.sd_trace_pallas(
        v0t, e1t, e2t, flags, origins, dirs, tmin, tmax, cosw,
        cam.near_z, cam.far_z, num_samples=4))
    stm = np.asarray(rp.sd_trace_pallas_stream(
        tri_packed, aabb, origins, dirs, tmin, tmax, cosw,
        cam.near_z, cam.far_z, num_samples=4))
    # identical hit sets + quantized depths (keys hash ulp-divergent u,v —
    # see tests/test_pallas_interpret.py)
    assert ((res == rp.INVALID) == (stm == rp.INVALID)).all()
    counts = (res != rp.INVALID).sum(1)
    full = counts == res.shape[1]
    d_res = np.where(res == rp.INVALID, -1, res % 65536)
    d_stm = np.where(stm == rp.INVALID, -1, stm % 65536)
    assert (np.sort(d_res[~full], 1) == np.sort(d_stm[~full], 1)).all()
    assert counts.sum() > 100  # the closed box produces plenty of hits


def smoke_raster_sd():
    """k-slot stochastic raster (config 2's SD source): deterministic
    alpha=1.0 parity vs the XLA tier (different fragment hashes make
    alpha<1 slots stochastic-divergent by design; coverage still equal)."""
    import jax as _jax
    from rtsdm_tpu.ops.raster_pallas import raster_stochastic_pallas
    from rtsdm_tpu.passes.stochastic_depth import _raster_stochastic
    from rtsdm_tpu.scene.procedural import cornell_box

    scene = cornell_box()
    cam = scene.camera
    w = h = 128
    k = 4
    first = jnp.zeros((h, w), jnp.float32)
    rmin = jnp.full((h, w), 0.5, jnp.float32)
    rmax = jnp.full((h, w), cam.far_z, jnp.float32)
    got = np.asarray(_jax.block_until_ready(raster_stochastic_pallas(
        cam.view_proj_no_jitter, scene.positions, cam.far_z,
        width=w, height=h, k=k, alpha=1.0,
        first_depth=first, ray_min=rmin, ray_max=rmax)))
    ref = np.asarray(_raster_stochastic(scene, w, h, k, 1.0, first,
                                        rmin, rmax))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def smoke_any_hit_classic():
    """Classic per-ray-origin streaming tier (shadow/ReSTIR any-hit) vs the
    XLA oracle on a multi-chunk scene."""
    from rtsdm_tpu.ops import rt
    import rtsdm_tpu.ops.rt_pallas as rp
    from rtsdm_tpu.scene.procedural import arcade

    scene = arcade()
    rng = np.random.default_rng(17)
    n = 2048
    pts = np.asarray(scene.positions.reshape(-1, 3))
    smin, smax = pts.min(0), pts.max(0)
    origins = jnp.asarray(rng.uniform(smin, smax, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirs = jnp.asarray(d)
    tmin = jnp.full((n,), 1e-3, jnp.float32)
    tmax = jnp.asarray(rng.uniform(0.5, 60.0, n).astype(np.float32))
    got = np.asarray(rp.any_hit_pallas(scene, origins, dirs, tmin, tmax,
                                       alpha_test=False))
    ref = np.asarray(rt.any_hit(scene, origins, dirs, tmin, tmax))
    assert got.any() and not got.all()
    np.testing.assert_array_equal(got, ref)


def smoke_rt():
    from rtsdm_tpu.ops import rt
    from rtsdm_tpu.scene.procedural import cornell_box

    scene = cornell_box()
    cam = scene.camera
    n = 4096
    rng = np.random.default_rng(7)
    px = jnp.asarray(rng.uniform(0, 256, (n, 2)).astype(np.float32))
    o, d = cam.compute_ray_pinhole(px, (256, 256))
    o = jnp.broadcast_to(o, (n, 3))
    t, tid = rt.closest_hit(scene, o, d, jnp.full((n,), 1e-3),
                            jnp.full((n,), 1e4), chunk=256)
    hitrate = float((np.asarray(tid) >= 0).mean())
    assert hitrate > 0.99, f"hit rate {hitrate} (closed box)"


def main():
    if "--interpret" in sys.argv:
        # CPU validation of the smoke itself: run the kernels in Pallas
        # interpret mode (same patch the interpret-mode test tier uses)
        import unittest.mock as mock

        from jax.experimental import pallas as pl

        import rtsdm_tpu.ops.fetch_pallas as FP
        import rtsdm_tpu.ops.warp_pallas as WP

        orig = pl.pallas_call

        def patched(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        for mod in (FP, WP):
            mock.patch.object(mod.pl, "pallas_call", patched).start()
    print(f"platform: {jax.devices()[0].platform}")
    oks = [
        _check("fetch_all_directions (phase1 fused fetch)", smoke_fetch_fused),
        _check("fetch_sd_all_directions (phase2 SD fetch)", smoke_fetch_sd),
        _check("fetch_taps_same_class (HBAO ring fetch)", smoke_fetch_taps),
        _check("warp_resample_pallas (TAA/history warp)", smoke_warp),
        _check("fetch_attributes_pallas (G-buffer fetch)",
               smoke_fetch_attrs),
        _check("rasterize (sort-middle visibility)", smoke_raster),
        _check("raster_stochastic_pallas (k-slot SD raster)",
               smoke_raster_sd),
        _check("sd_trace_pallas[_stream] (SD reservoir trace)",
               smoke_sd_trace),
        _check("any_hit_pallas classic tier (shadow rays)",
               smoke_any_hit_classic),
        _check("rt.closest_hit (ray trace)", smoke_rt),
    ]
    print("ALL OK" if all(oks) else "FAILURES")
    if "--json" in sys.argv:
        import datetime
        import json
        path = sys.argv[sys.argv.index("--json") + 1]
        n_ok = sum(1 for _, ok, _ in RESULTS if ok)
        with open(path, "w") as f:
            json.dump({
                "tool": "tools/kernel_smoke.py",
                "date": datetime.date.today().isoformat(),
                "platform": jax.devices()[0].platform
                + f" ({jax.devices()[0].device_kind})",
                "result": ("ALL OK" if all(oks) else "FAILURES")
                + f" ({n_ok}/{len(RESULTS)} Mosaic-compiled and "
                  "parity-gated)",
                "kernels": [dict(name=n, ok=ok, seconds=s)
                            for (n, ok, s) in RESULTS]}, f, indent=1)
    return 0 if all(oks) else 1


if __name__ == "__main__":
    sys.exit(main())
