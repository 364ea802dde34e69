"""TPU-native ReSTIR direct-illumination reservoirs (the RTXDI analogue).

Reference: Source/Falcor/Rendering/RTXDI/RTXDI.h:1 (vendor SDK wrapper —
per-pixel weighted-reservoir sampling of light candidates, temporal reuse of
the previous frame's reservoirs, spatial reuse of neighbor reservoirs, one
final shadow ray). This module re-designs that pipeline for TPU:

- Reservoirs are DENSE PLANAR fields — a dict of [H,W]/[H,W,3] planes
  (sample point, emitted radiance, light normal, kind, wsum, M, phat) —
  never an AoS [H,W,12] stack (CLAUDE.md broadcast-chain rule). Carrying
  the sample's geometry in the reservoir makes every later target
  re-evaluation pure dense math: no per-pixel light-table fetch at merge
  time.
- Analytic-light candidates select from the tiny light arrays with an
  index-compare chain (num_lights is a static small int — a select chain
  beats any gather); emissive candidates ride the clustered sampler's
  one-hot MXU path (ops/lights.py sample_clustered).
- Spatial-reuse taps are STATIC clamped shifts (ops/ao.shift_axis_clamped —
  the same gather-free trick as shift-mode AO), rotated per frame.
- Temporal reuse warps the previous reservoir planes at nearest-neighbor
  positions: whole-plane XLA take on CPU, the warp kernel on TPU.

Measure convention: the RIS target p̂(y) = luminance of the UNSHADOWED
contribution C(q, y) with the geometry factor folded in per light kind
(area: Le*cos_l/d^2 in area measure; point: I/d^2; directional: E) — so a
sample's p̂ is re-evaluable at any pixel from reservoir planes alone, which
is exactly what temporal/spatial merges need. Candidate weights divide by
each candidate's own source pdf (uniform 1/n over analytic lights; the
cluster sampler's area pdf for emissives), the standard mixed-candidate RIS
of the original ReSTIR formulation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.math import luminance, normalize
from . import brdf

# pseudo-position distance for directional lights (far enough that the
# re-derived direction is parallel for any scene-scale pixel position)
_DIR_DIST = 1.0e7
_KIND_POINT = 0.0
_KIND_DIR = 1.0
_KIND_AREA = 2.0


def _hash_u32(x):
    """Wang-style integer hash (same construction as the path tracer's
    per-pixel stream rng, passes/path_tracer.py:20)."""
    x = x.astype(jnp.uint32)
    x = (x ^ jnp.uint32(61)) ^ (x >> 16)
    x = x + (x << 3)
    x = x ^ (x >> 4)
    x = x * jnp.uint32(0x27D4EB2D)
    return x ^ (x >> 15)


def _rand01(seed):
    return (_hash_u32(seed) & jnp.uint32(0xFFFFFF)).astype(jnp.float32) \
        / float(1 << 24)


def _pixel_seeds(h, w, frame, stream):
    base = jax.lax.broadcasted_iota(jnp.uint32, (h, w), 0) * jnp.uint32(9781) \
        + jax.lax.broadcasted_iota(jnp.uint32, (h, w), 1) * jnp.uint32(6271)
    return base + jnp.uint32(frame) * jnp.uint32(26699) \
        + jnp.uint32(stream) * jnp.uint32(1009)


def empty_reservoir(h, w):
    z3 = jnp.zeros((h, w, 3))
    z = jnp.zeros((h, w))
    return dict(pos=z3, le=z3, ln=z3, kind=z, wsum=z, m=z, phat=z)


def eval_target(res, si):
    """Unshadowed contribution C(q, y) of reservoir sample y at the pixels'
    shading points, and its luminance target p̂. Returns (C_rgb, phat,
    wi, dist)."""
    p, n, wo = si["p"], si["n"], si["wo"]
    to = res["pos"] - p
    dist = jnp.linalg.norm(to, axis=-1)
    wi = to / jnp.maximum(dist[..., None], 1e-6)
    f_cos = brdf.eval_lobes(si["diff_albedo"], si["f0"], si["rough"],
                            n, wo, wi)
    kind = res["kind"]
    inv_d2 = 1.0 / jnp.maximum(dist * dist, 1e-6)
    cos_l = jnp.abs(jnp.sum(res["ln"] * wi, -1))
    geom = jnp.where(kind == _KIND_DIR, 1.0,
                     jnp.where(kind == _KIND_AREA, cos_l * inv_d2, inv_d2))
    c_rgb = f_cos * res["le"] * geom[..., None]
    # dead reservoirs (m == 0) and backfacing samples contribute nothing
    c_rgb = jnp.where((res["m"] > 0.0)[..., None], c_rgb, 0.0)
    return c_rgb, luminance(c_rgb), wi, dist


def _update(res, cand, w, u):
    """Streaming reservoir update: accept candidate with prob w/(wsum+w)."""
    wsum = res["wsum"] + w
    take = u * jnp.maximum(wsum, 1e-12) < w
    out = {k: jnp.where(take[..., None] if res[k].ndim == 3 else take,
                        cand[k], res[k])
           for k in ("pos", "le", "ln", "kind", "phat")}
    out["wsum"] = wsum
    out["m"] = res["m"] + cand["m"]
    return out


def initial_candidates(scene, lc, si, frame, n_analytic_cand, n_area_cand):
    """Per-pixel RIS over analytic-light + clustered-emissive candidates.
    lc: cluster sampler (ops/lights.build_cluster_sampler) or None."""
    h, w = si["p"].shape[:2]
    res = empty_reservoir(h, w)
    res["phat"] = jnp.zeros((h, w))
    n_lights = int(scene.num_lights)
    stream = 0

    if n_lights > 0:
        from ..scene.scene import LIGHT_DIRECTIONAL
        for m in range(n_analytic_cand):
            u_pick = _rand01(_pixel_seeds(h, w, frame, stream)); stream += 1
            u_acc = _rand01(_pixel_seeds(h, w, frame, stream)); stream += 1
            li = jnp.clip((u_pick * n_lights).astype(jnp.int32),
                          0, n_lights - 1)
            # static select chain over the tiny light list
            pos = jnp.zeros((h, w, 3))
            le = jnp.zeros((h, w, 3))
            kind = jnp.zeros((h, w))
            for i in range(n_lights):
                is_i = (li == i)
                is_dir = scene.light_type[i] == LIGHT_DIRECTIONAL
                pos_i = jnp.where(is_dir,
                                  si["p"] - scene.light_dir[i] * _DIR_DIST,
                                  jnp.broadcast_to(scene.light_pos[i],
                                                   si["p"].shape))
                pos = jnp.where(is_i[..., None], pos_i, pos)
                le = jnp.where(is_i[..., None], scene.light_intensity[i], le)
                kind = jnp.where(
                    is_i, jnp.where(is_dir, _KIND_DIR, _KIND_POINT), kind)
            cand = dict(pos=pos, le=le, ln=jnp.zeros((h, w, 3)), kind=kind,
                        m=jnp.ones((h, w)))
            _, phat, _, _ = eval_target({**cand, "m": cand["m"]}, si)
            cand["phat"] = phat
            w_ris = phat * float(n_lights)  # p_src = 1/n_lights
            res = _update(res, cand, w_ris, u_acc)

    if lc is not None:
        flat_p = si["p"].reshape(-1, 3)
        from .lights import sample_clustered
        for m in range(n_area_cand):
            us = [_rand01(_pixel_seeds(h, w, frame, stream + i)).reshape(-1)
                  for i in range(5)]
            stream += 5
            wi, dist, le, pdf_w, valid, _tid = sample_clustered(
                lc, scene, flat_p, us[0], us[1], us[2], us[3])
            pos = (flat_p + wi * dist[:, None]).reshape(h, w, 3)
            le = le.reshape(h, w, 3)
            # light normal: re-derived from the sampled direction is enough
            # for the |cos| in the target; exact shading normal is not
            # needed because pdf_w already carries the true cos_l/d^2 —
            # fold the measure change into le so C stays consistent:
            # C = f_cos * le_eff * cos_l/d^2 with le_eff = Le. We store the
            # TRUE cos_l/d^2 via pdf relation instead: p_area = pdf_w *
            # cos_l/d^2, so w = lum(f_cos*Le)/pdf_w exactly (measure factors
            # cancel). For later re-evals the |dot(ln, wi)| form needs ln:
            # approximate the emitter as facing the sample ray (ln = -wi),
            # the standard reconnection simplification for flat emitters.
            ln = (-wi).reshape(h, w, 3)
            kind = jnp.full((h, w), _KIND_AREA)
            cand = dict(pos=pos, le=le, ln=ln, kind=kind,
                        m=valid.reshape(h, w).astype(jnp.float32))
            c_rgb, phat, _, _ = eval_target({**cand, "m": cand["m"]}, si)
            cand["phat"] = phat
            # w = phat / p_area; with ln=-wi, phat = lum(f_cos*Le)*cos_l/d^2
            # where cos_l == |dot(-wi, wi)| == 1 at the owning pixel, so
            # p_area reduces to pdf_w/d^2... keep it direct instead:
            # p_area(cand) = pdf_w * cos_l/d^2 with the SAME ln convention.
            d2 = jnp.maximum((dist * dist).reshape(h, w), 1e-6)
            p_area = pdf_w.reshape(h, w) / d2  # cos_l(ln=-wi, wi) == 1
            w_ris = jnp.where((cand["m"] > 0) & (p_area > 1e-12),
                              phat / jnp.maximum(p_area, 1e-12), 0.0)
            u_acc = _rand01(_pixel_seeds(h, w, frame, stream)); stream += 1
            res = _update(res, cand, w_ris, u_acc)

    return res


def merge(res, other, si, u, m_cap=None):
    """Merge `other` (a reused reservoir, already aligned to this pixel
    grid) into `res`, re-evaluating its sample's target at THIS pixel."""
    _, phat_here, _, _ = eval_target(other, si)
    m_o = other["m"] if m_cap is None else jnp.minimum(other["m"], m_cap)
    w_o = phat_here * other["w_big"] * m_o
    cand = {k: other[k] for k in ("pos", "le", "ln", "kind")}
    cand["phat"] = phat_here
    cand["m"] = m_o
    return _update(res, cand, w_o, u)


def finalize(res):
    """Unbiased contribution weight W = wsum / (M * p̂(y))."""
    w_big = res["wsum"] / jnp.maximum(res["m"] * res["phat"], 1e-12)
    res = dict(res)
    res["w_big"] = jnp.where(res["phat"] > 0.0, w_big, 0.0)
    return res


def trace_visibility(scene, p, wi, tmax, alive):
    """One any-hit shadow ray per pixel toward the reservoir sample.
    Same platform split + dead-ray masking as RayShadow
    (passes/lighting.py:68): dead rays carry tmax=-1 so they cannot bloat
    the streaming kernel's block segment AABBs."""
    h, w = tmax.shape
    # slab-clip to the scene AABB exit (directional pseudo-positions would
    # otherwise drag every block's segment AABB across the whole scene)
    smin = jnp.min(scene.positions.reshape(-1, 3), axis=0)
    smax = jnp.max(scene.positions.reshape(-1, 3), axis=0)
    inv = 1.0 / jnp.where(jnp.abs(wi) < 1e-8, 1e-8, wi)
    ta = (smin - p) * inv
    tb = (smax - p) * inv
    t_exit = jnp.min(jnp.maximum(ta, tb), axis=-1)
    tmax = jnp.minimum(tmax, jnp.maximum(t_exit, 0.0) + 1e-3)
    tmax = jnp.where(alive, tmax, -1.0)
    tmin = jnp.full((h * w,), scene.camera.near_z * 0.1)
    if jax.devices()[0].platform != "cpu":
        from . import rt_pallas as _rp
        pt, _ = _rp.pad_tile(p)
        dt, _ = _rp.pad_tile(wi)
        xt, _ = _rp.pad_tile(tmax, fill=-1.0)
        ph = h + (-h) % _rp.TILE_RH
        pw = w + (-w) % _rp.TILE_RW
        hit_t = _rp.any_hit_pallas(
            scene, _rp.tile_flatten(pt), _rp.tile_flatten(dt),
            jnp.full((ph * pw,), scene.camera.near_z * 0.1),
            _rp.tile_flatten(xt))
        hit = _rp.tile_unflatten(hit_t, ph, pw)[:h, :w]
    else:
        from . import rt
        hit = rt.any_hit(scene, p.reshape(-1, 3), wi.reshape(-1, 3),
                         tmin, tmax.reshape(-1)).reshape(h, w)
    return jnp.where(alive, jnp.where(hit, 0.0, 1.0), 0.0)


def shift2(planes, dy, dx):
    """Clamped 2D static shift of every reservoir plane (gather-free)."""
    from .ao import shift_axis_clamped

    def sh(a):
        a = shift_axis_clamped(a, 0, dy)
        return shift_axis_clamped(a, 1, dx)
    return {k: sh(v) for k, v in planes.items()}
