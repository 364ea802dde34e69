"""Fast SD-stream-kernel A/B: loads kernel inputs captured by
`tools/sd_profile.py --save-inputs X.npz` and times sd_trace_pallas_stream
variants (group/nslot sweeps) without re-paying the 10-min scene build.

Timing follows the CLAUDE.md rules: scan-amortized inside one jit with a
per-step perturbation of a consumed input (tmin), 3-run median. Also checks
each variant's packed output against the (group=1, nslot=4) baseline —
grouping visits a SUPERSET of chunks (union super-AABBs admit
false-positive visits) in the same relative order, and merging an all-miss
chunk is the identity on the reservoir, so the result must still be
bit-identical.

Usage: python tools/sd_kernel_ab.py inputs.npz --variants 1x4 1x8 2x8 4x8 4x12
"""
import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rtsdm_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

K = 8


def scan_time(step, n_runs=3):
    def body(carry, i):
        s = 1.0 + 1e-6 * i.astype(jnp.float32)
        return carry + step(s), None

    @jax.jit
    def fn(i0):
        acc, _ = jax.lax.scan(body, 0.0, i0 + jnp.arange(K))
        return acc

    jax.block_until_ready(fn(jnp.int32(0)))
    runs = []
    for r in range(n_runs):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(jnp.int32(100 * (r + 1))))
        runs.append((time.perf_counter() - t0) * 1e3 / K)
    runs.sort()
    return runs[len(runs) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("npz")
    ap.add_argument("--variants", nargs="+", default=["1x4", "1x8", "2x8",
                                                      "4x8", "4x12"],
                    help="GROUPxNSLOT pairs")
    ap.add_argument("--ks", nargs="+", type=int, default=[],
                    help="also time num_samples sweeps at group=1/nslot=4 "
                         "(bisection: extraction rounds scale with k)")
    ap.add_argument("--modes", nargs="+", default=[],
                    help="also time insertion modes at k=4 (coverage has a "
                         "min-only tail: no invalidation rounds)")
    ap.add_argument("--gates", action="store_true",
                    help="A/B the any(ok_face) tail gate")
    ap.add_argument("--subs", nargs="+", type=int, default=[],
                    help="A/B chunk-list sub-bundle granularities")
    ap.add_argument("--tails", action="store_true",
                    help="A/B the hit-count-bounded extraction tail")
    ap.add_argument("--raygates", action="store_true",
                    help="A/B the in-kernel per-ray slab gate")
    ap.add_argument("--screen", action="store_true",
                    help="A/B the pinhole screen cull (capture must carry "
                         "rx/ry + 12-row aabb)")
    ap.add_argument("--rbs", nargs="+", type=int, default=[],
                    help="A/B rays-per-block (monkeypatches rp.RB; exact-"
                         "ness may differ only through reservoir selection "
                         "order, which is block-independent -> exact)")
    a = ap.parse_args()

    from rtsdm_tpu.ops import rt_pallas as rp

    d = np.load(a.npz, allow_pickle=False)
    kw = json.loads(str(d["kw"]))
    for key in d.files:
        if key.startswith("kwarr_"):
            kw[key[len("kwarr_"):]] = jnp.asarray(d[key])
    tri, aabb = jnp.asarray(d["tri_packed"]), jnp.asarray(d["aabb"])
    origins, dirs = jnp.asarray(d["origins"]), jnp.asarray(d["dirs"])
    tmin, tmax, vz = (jnp.asarray(d["tmin"]), jnp.asarray(d["tmax"]),
                      jnp.asarray(d["vz"]))
    near, far = float(d["near"]), float(d["far"])

    def run(g, n, s, **over):
        kw2 = dict(kw, **over)
        # group/nslot are passed explicitly below: drop any captured values
        # so future saved-input files that include them replay cleanly
        kw2.pop("group", None)
        kw2.pop("nslot", None)
        return rp.sd_trace_pallas_stream(tri, aabb, origins, dirs, tmin * s,
                                         tmax * s, vz, near, far,
                                         group=g, nslot=n, **kw2)

    base = jax.block_until_ready(run(1, 4, 1.0))
    out = {"chunks": int(tri.shape[0]), "rays": int(dirs.shape[0]),
           "kw": {m: v for m, v in kw.items() if not hasattr(v, "shape")},
           "kw_arrays": [m for m in kw if hasattr(kw[m], "shape")],
           "variants": {}}
    for v in a.variants:
        g, n = (int(x) for x in v.split("x"))
        got = jax.block_until_ready(run(g, n, 1.0))
        exact = bool(jnp.array_equal(got, base))
        ms = scan_time(lambda s, g=g, n=n: run(g, n, s).sum())
        out["variants"][v] = {"ms": round(ms, 2), "exact_vs_base": exact}
        print(f"{v}: {ms:.2f} ms exact={exact}", flush=True)
    for kk in a.ks:
        ms = scan_time(lambda s, kk=kk: run(1, 4, s, num_samples=kk).sum())
        out["variants"][f"k{kk}"] = {"ms": round(ms, 2)}
        print(f"k={kk}: {ms:.2f} ms", flush=True)
    for m in a.modes:
        ms = scan_time(lambda s, m=m: run(1, 4, s, mode=m).sum())
        out["variants"][f"mode_{m}"] = {"ms": round(ms, 2)}
        print(f"mode={m}: {ms:.2f} ms", flush=True)
    if a.gates:
        for gate in (False, True):
            got = jax.block_until_ready(run(1, 4, 1.0, hit_gate=gate))
            exact = bool(jnp.array_equal(got, base))
            ms = scan_time(lambda s, gate=gate: run(1, 4, s,
                                                    hit_gate=gate).sum())
            out["variants"][f"gate_{gate}"] = {"ms": round(ms, 2),
                                               "exact_vs_base": exact}
            print(f"hit_gate={gate}: {ms:.2f} ms exact={exact}", flush=True)
    for sb in a.subs:
        got = jax.block_until_ready(run(1, 4, 1.0, sub=sb))
        exact = bool(jnp.array_equal(got, base))
        ms = scan_time(lambda s, sb=sb: run(1, 4, s, sub=sb).sum())
        out["variants"][f"sub{sb}"] = {"ms": round(ms, 2),
                                       "exact_vs_base": exact}
        print(f"sub={sb}: {ms:.2f} ms exact={exact}", flush=True)
    if a.tails:
        for tb in (False, True):
            got = jax.block_until_ready(run(1, 4, 1.0, tail_bound=tb))
            exact = bool(jnp.array_equal(got, base))
            ms = scan_time(lambda s, tb=tb: run(1, 4, s,
                                                tail_bound=tb).sum())
            out["variants"][f"tail_bound_{tb}"] = {"ms": round(ms, 2),
                                                   "exact_vs_base": exact}
            print(f"tail_bound={tb}: {ms:.2f} ms exact={exact}", flush=True)
    if a.raygates:
        for rg in (False, True):
            got = jax.block_until_ready(run(1, 4, 1.0, ray_gate=rg))
            exact = bool(jnp.array_equal(got, base))
            ms = scan_time(lambda s, rg=rg: run(1, 4, s, ray_gate=rg).sum())
            out["variants"][f"ray_gate_{rg}"] = {"ms": round(ms, 2),
                                                 "exact_vs_base": exact}
            print(f"ray_gate={rg}: {ms:.2f} ms exact={exact}", flush=True)
    for rb in a.rbs:
        rb0 = rp.RB
        rp.RB = rb
        try:
            got = jax.block_until_ready(run(1, 4, 1.0))
            exact = bool(jnp.array_equal(got, base))
            ms = scan_time(lambda s: run(1, 4, s).sum())
        finally:
            rp.RB = rb0
        out["variants"][f"rb{rb}"] = {"ms": round(ms, 2),
                                      "exact_vs_base": exact}
        print(f"RB={rb}: {ms:.2f} ms exact={exact}", flush=True)
    if a.screen:
        for sc in (False, True):
            over = {} if sc else {"rx": None, "ry": None}
            got = jax.block_until_ready(run(1, 4, 1.0, **over))
            exact = bool(jnp.array_equal(got, base))
            ms = scan_time(lambda s, over=over: run(1, 4, s, **over).sum())
            out["variants"][f"screen_{sc}"] = {"ms": round(ms, 2),
                                               "exact_vs_base": exact}
            print(f"screen={sc}: {ms:.2f} ms exact={exact}", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
