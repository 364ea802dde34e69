"""On-TPU parity + scaling harness for the stochastic-depth ray kernels.

CI runs CPU-only and never exercises the Pallas kernels (VERDICT r1 weak #7),
so this script runs on the real chip and commits its evidence as
PALLAS_PARITY.json at the repo root:

  1. parity: sd_trace_pallas (VMEM-resident) vs sd_trace_pallas_stream
     (HBM-streaming BVH tier) — bit-exact packed reservoirs — and both vs
     the XLA reference formulation ops/rt.py:sd_trace and a numpy
     Möller-Trumbore oracle (hit depth SETS must agree; reservoir selection
     keys differ between the XLA and Pallas hash paths by design, so parity
     is on kbuffer/nearest mode where selection is deterministic).
  2. scaling: stream-kernel ms on the reference-scale scene tiers — the
     evidence that SD-trace work scales with overlapping chunks, not T.

Usage: python tools/pallas_parity.py  (writes PALLAS_PARITY.json)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rtsdm_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def numpy_oracle_depths(scene, origins, dirs, tmin, tmax, cull_back=True):
    """Brute-force Möller-Trumbore: per ray, the sorted normalized view
    depths of ALL accepted hits (numpy float64)."""
    pos = np.asarray(scene.positions, np.float64)
    v0 = pos[:, 0]
    e1 = pos[:, 1] - pos[:, 0]
    e2 = pos[:, 2] - pos[:, 0]
    mid = np.asarray(scene.material_id)
    dbl = np.asarray(scene.mat_double_sided)[mid]
    is_alpha = np.asarray(scene.mat_alpha_mode)[mid] == 1
    opac = np.asarray(scene.mat_opacity)[mid]
    reject = is_alpha & (opac < 0.5)
    acc_back = dbl | is_alpha
    cam = scene.camera
    cw = np.asarray(cam.camera_w, np.float64)
    cw /= np.linalg.norm(cw)
    near, far = float(cam.near_z), float(cam.far_z)

    out = []
    o = np.asarray(origins, np.float64)
    d = np.asarray(dirs, np.float64)
    for i in range(o.shape[0]):
        p = np.cross(d[i], e2)
        det = (e1 * p).sum(-1)
        if cull_back:
            ok = det > 1e-12
        else:
            ok = (np.abs(det) > 1e-12) & ((det > 0) | acc_back)
        ok &= ~reject
        inv = 1.0 / np.where(np.abs(det) < 1e-12, 1.0, det)
        tv = o[i] - v0
        u = (tv * p).sum(-1) * inv
        q = np.cross(tv, e1)
        v = (d[i] * q).sum(-1) * inv
        t = (e2 * q).sum(-1) * inv
        ok &= (u >= 0) & (v >= 0) & (u + v <= 1.0)
        ok &= (t > tmin[i]) & (t < tmax[i])
        cosw = float(np.dot(d[i], cw))
        dn = np.clip((t[ok] * cosw - near) / (far - near), 0.0, 1.0)
        out.append(np.sort(dn))
    return out


def main():
    from rtsdm_tpu.ops import rt
    from rtsdm_tpu.ops import rt_pallas as rp
    from rtsdm_tpu.scene.procedural import cornell_box, load_scene

    report = {"device": str(jax.devices()[0]), "checks": {}}
    t_start = time.time()

    def log(msg):
        print(f"[{time.time() - t_start:7.1f}s] {msg}", flush=True)

    # ---- 1. parity on the Cornell box --------------------------------------
    log("phase 1: cornell parity")
    scene = cornell_box()
    cam = scene.camera
    n = 4096
    rng = np.random.default_rng(7)
    px = rng.uniform(0, 256, (n, 2)).astype(np.float32)
    origin, dirs = cam.compute_ray_pinhole(jnp.asarray(px), (256, 256),
                                           jitter=jnp.full((n, 2), 0.5))
    origins = jnp.broadcast_to(origin, (n, 3))
    tmin = jnp.asarray(rng.uniform(0.0, 2.0, n).astype(np.float32))
    tmax = tmin + jnp.asarray(rng.uniform(0.5, 6.0, n).astype(np.float32))
    cosw = jnp.sum(dirs * (cam.camera_w / jnp.linalg.norm(cam.camera_w)), -1)
    k = 4

    v0t, e1t, e2t, flags = rp.prep_triangles(scene, True)
    tri_packed, aabb = rp.prep_triangles_packed(scene, True)
    log("tracing (resident + stream)")
    res = np.asarray(rp.sd_trace_pallas(
        v0t, e1t, e2t, flags, origins, dirs, tmin, tmax, cosw,
        cam.near_z, cam.far_z, num_samples=k))
    stm = np.asarray(rp.sd_trace_pallas_stream(
        tri_packed, aabb, origins, dirs, tmin, tmax, cosw,
        cam.near_z, cam.far_z, num_samples=k))
    report["checks"]["resident_vs_stream_bitexact"] = bool((res == stm).all())

    # Pallas depths must be a subset of the oracle hit set (quantized 16-bit),
    # and must find min(k, hits) samples per ray; in kbuffer terms the XLA
    # path's nearest-k must match the oracle's nearest-k.
    log("numpy oracle")
    oracle = numpy_oracle_depths(scene, origins, dirs,
                                 np.asarray(tmin), np.asarray(tmax))
    d_pal = np.where(res == rp.INVALID, np.nan,
                     (res % 65536).astype(np.float64) / 65535.0)
    subset_ok, count_ok = True, True
    for i in range(n):
        got = np.sort(d_pal[i][~np.isnan(d_pal[i])])
        want = oracle[i]
        if len(got) != min(k, len(want)):
            count_ok = False
        for gv in got:
            if len(want) == 0 or np.abs(want - gv).min() > 1.5 / 65535.0:
                subset_ok = False
    report["checks"]["pallas_hits_subset_of_oracle"] = bool(subset_ok)
    report["checks"]["pallas_hit_count_matches_oracle"] = bool(count_ok)

    log("xla kbuffer")
    d_xla = np.asarray(rt.sd_trace(scene, origins, dirs, tmin, tmax,
                                   num_samples=k, kbuffer=True,
                                   cull=rt.CULL_BACK))
    kb_ok = True
    for i in range(n):
        want = oracle[i][:k]
        got = np.sort(d_xla[i])[:len(want)]
        if len(want) and np.abs(got - want).max() > 1.5 / 65535.0:
            kb_ok = False
    report["checks"]["xla_kbuffer_matches_oracle_nearest_k"] = bool(kb_ok)

    # ---- 1b. insertion-algorithm matrix (VERDICT r2 item 5) ----------------
    # Deterministic modes must match the XLA tier EXACTLY (same canonical
    # chunk order): kbuffer, kbuffer+cap, default+cap<=k. Coverage is
    # hash-dependent per tier; its structural tests live in
    # tests/test_sd_insertion.py and the endpoint (alpha=1 -> k nearest-1)
    # is checked here.
    log("insertion modes")
    for mode, mc, key in [("kbuffer", None, "mode_kbuffer_exact"),
                          ("kbuffer", 3, "mode_kbuffer_cap_exact"),
                          ("default", 3, "mode_default_cap_exact")]:
        d_x = np.sort(np.asarray(rt.sd_trace(
            scene, origins, dirs, tmin, tmax, num_samples=k,
            implementation=mode, max_count=mc, cull=rt.CULL_BACK)), 1)
        ok_mode = True
        for fn, args in ((rp.sd_trace_pallas, (v0t, e1t, e2t, flags)),
                         (rp.sd_trace_pallas_stream, (tri_packed, aabb))):
            d_p = np.sort(np.asarray(rp.decode_packed(
                fn(*args, origins, dirs, tmin, tmax, cosw, cam.near_z,
                   cam.far_z, num_samples=k, mode=mode, max_count=mc),
                cam.near_z, cam.far_z, mode=mode)), 1)
            if not np.allclose(d_x, d_p, atol=2.0 / 65535.0):
                ok_mode = False
        report["checks"][key] = bool(ok_mode)
    cov = np.asarray(rp.decode_packed(
        rp.sd_trace_pallas(v0t, e1t, e2t, flags, origins, dirs, tmin, tmax,
                           cosw, cam.near_z, cam.far_z, num_samples=k,
                           mode="coverage", alpha=1.0),
        cam.near_z, cam.far_z, mode="coverage"))
    kb1 = np.sort(np.asarray(rt.sd_trace(
        scene, origins, dirs, tmin, tmax, num_samples=k,
        implementation="kbuffer", cull=rt.CULL_BACK)), 1)[:, 0]
    # alpha=1 -> every slot z-tests every hit -> all slots = nearest hit
    cov_ok = np.allclose(cov, kb1[:, None], atol=2.0 / 65535.0)
    report["checks"]["mode_coverage_alpha1_is_nearest"] = bool(cov_ok)

    # ---- 2. scaling on reference-scale scenes ------------------------------
    def bench_scene(name):
        log(f"scaling: {name} (scene gen)")
        sc = load_scene(name, aspect=16 / 9, detail="full")
        log(f"scaling: {name} tris={sc.num_triangles} (prep+trace)")
        c = sc.camera
        w, h = 480 + 2 * 64, 270 + 2 * 64  # 1080p SD grid at divisor 4 + guard
        r = w * h
        xs = (np.arange(w) - 64).astype(np.float32)
        ys = (np.arange(h) - 64).astype(np.float32)
        pxg, pyg = np.meshgrid(xs, ys, indexing="xy")
        pix = jnp.asarray(np.stack([pxg, pyg], -1).reshape(-1, 2))
        o1, dd = c.compute_ray_pinhole(pix, (480, 270),
                                       jitter=jnp.full((r, 2), 0.5))
        # AO-interval-like short segments starting at a SMOOTH plausible
        # depth field (neighboring SD rays have correlated depths in the
        # real pipeline); rays go through the production 8x32 tile order
        depth_field = jnp.asarray(
            (12.0 + 8.0 * np.sin(pxg / 97.0)
             * np.cos(pyg / 61.0)).astype(np.float32))
        dd2 = dd.reshape(h, w, 3)
        cw2 = jnp.sum(dd2 * (c.camera_w / jnp.linalg.norm(c.camera_w)), -1)

        def tf(a, fill=0.0):
            p, _ = rp.pad_tile(a, fill)
            return rp.tile_flatten(p)

        ph, pw = h + (-h) % rp.TILE_RH, w + (-w) % rp.TILE_RW
        oo = jnp.broadcast_to(o1, (ph * pw, 3))
        t0 = tf(depth_field)
        t1 = t0 + 0.4  # 2*radius class interval
        tp, ab = rp.prep_triangles_packed(sc, True)
        tp, ab = jax.block_until_ready((tp, ab))
        args = (tp, ab, oo, tf(dd2), t0, jnp.where(t0 > 0, t1, -1.0),
                tf(cw2), c.near_z, c.far_z)
        out = rp.sd_trace_pallas_stream(*args, num_samples=4)
        jax.block_until_ready(out)
        ts = []
        for i in range(5):
            # perturb tmin/tmax per repetition: the axon runtime memoizes
            # bit-identical executions (CLAUDE.md), so repeated identical
            # calls would time cache hits, not the kernel
            eps = jnp.float32(1.0 + 1e-6 * (i + 1))
            argv = (args[0], args[1], args[2], args[3], args[4] * eps,
                    jnp.where(args[5] > 0, args[5] * eps, args[5]),
                    args[6], args[7], args[8])
            s0 = time.perf_counter()
            out = rp.sd_trace_pallas_stream(*argv, num_samples=4)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - s0)
        return dict(triangles=int(sc.num_triangles),
                    chunks=int(ab.shape[1]),
                    rays=ph * pw, ms=round(min(ts) * 1e3, 3))

    for name in ("Arcade", "SunTemple", "Bistro"):
        report["checks"][f"stream_scaling_{name}"] = bench_scene(name)

    a = report["checks"]["stream_scaling_Arcade"]
    s = report["checks"]["stream_scaling_SunTemple"]
    b = report["checks"]["stream_scaling_Bistro"]
    # sublinear: Bistro has ~19x Arcade's triangles; time must grow far slower
    report["checks"]["sublinear_in_T"] = bool(
        b["ms"] / max(a["ms"], 1e-9) < 0.5 * b["triangles"] / a["triangles"])

    ok = all(v is True or isinstance(v, dict)
             for v in report["checks"].values())
    report["ok"] = bool(ok)
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PALLAS_PARITY.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
