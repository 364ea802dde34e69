"""Emissive light sampling — the TPU-native LightBVH.

Reference: Falcor's emissive samplers (Rendering/Lights/EmissivePowerSampler.cpp
— flat power-proportional CDF; Rendering/Lights/LightBVH.h:57 +
LightBVHSampler.cpp — a bounding-volume hierarchy over emissive triangles
walked per shading point so nearby/facing lights are picked more often).

A pointer-chasing BVH walk is the wrong shape for TPU (divergent control
flow, per-lane gathers).  The re-design keeps the *statistics* of the
LightBVH — per-point spatial+orientation importance — but flattens the
hierarchy to exactly two dense levels:

  level 1  C light CLUSTERS (C <= 64).  The scene's triangles are already
           morton-sorted at build (scene.py:131-136), so consecutive
           emissive triangles are spatially coherent: clusters are equal
           runs of the emissive subset in morton order.  Each cluster keeps
           a bounding sphere, a normal cone (axis + cos half-angle, the
           LightBVH's orientation bound) and its total power.
           Per shading point the cluster importance
               I_c = P_c * facing_c / max(d_c^2, r_c^2)
           is evaluated DENSELY for all C clusters at once — an [N, C]
           elementwise block (VPU), no gathers, no traversal — and the
           cluster is picked by inverse-CDF along the C axis.

  level 2  inside the chosen cluster, a power-proportional CDF over its
           (padded) S triangle slots, exactly the EmissivePowerSampler
           collapsed per cluster.  The row of the [C, S] CDF table is
           extracted with a one-hot [N, C] @ [C, S] matmul (MXU), keeping
           the hot path gather-free; only the final vertex fetch indexes
           the triangle table (same cost the path tracer already pays).

Both the sample pdf and the MIS query pdf (pdf of NEE-sampling a given
BSDF-hit emitter from point p) are exact for this two-level scheme —
cluster importances are recomputed densely for the query point, and a
dense [T] tid->(cluster, in-cluster pdf) table closes the loop.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

_LUM = np.asarray([0.2126, 0.7152, 0.0722], np.float32)


# --------------------------------------------------------------------------
# build (host side, once per scene)
# --------------------------------------------------------------------------

def build_power_sampler(scene):
    """Flat power-proportional CDF over emissive triangles (the
    EmissivePowerSampler).  Returns None when the scene has no emitters."""
    emis = np.asarray(scene.mat_emissive)[np.asarray(scene.material_id)]
    ids = np.where(emis.sum(-1) > 0.0)[0]
    if len(ids) == 0:
        return None
    pos = np.asarray(scene.positions)[ids]
    area = 0.5 * np.linalg.norm(
        np.cross(pos[:, 1] - pos[:, 0], pos[:, 2] - pos[:, 0]), axis=-1)
    lum = emis[ids] @ _LUM
    power = np.maximum(lum * area, 1e-12)
    cdf = np.cumsum(power)
    total_p = float(cdf[-1])
    inv_area_pdf = (power / total_p) / np.maximum(area, 1e-12)
    dense = np.zeros((scene.num_triangles,), np.float32)
    dense[ids] = inv_area_pdf
    return dict(kind="power",
                ids=jnp.asarray(ids.astype(np.int32)),
                cdf=jnp.asarray((cdf / total_p).astype(np.float32)),
                area=jnp.asarray(area.astype(np.float32)),
                pdf_area=jnp.asarray(inv_area_pdf.astype(np.float32)),
                pdf_area_by_tid=jnp.asarray(dense),
                total_area=float(area.sum()))


def build_cluster_sampler(scene, max_clusters: int = 64):
    """Two-level clustered sampler (the LightBVH analogue).  Clusters are
    equal runs of the emissive subset in morton order; per cluster we store
    the bounding sphere, normal cone and power, plus a padded [C, S]
    in-cluster CDF.  Returns None when the scene has no emitters."""
    emis = np.asarray(scene.mat_emissive)[np.asarray(scene.material_id)]
    ids = np.where(emis.sum(-1) > 0.0)[0]
    e = len(ids)
    if e == 0:
        return None
    pos = np.asarray(scene.positions)[ids]                    # [E,3,3]
    e1 = pos[:, 1] - pos[:, 0]
    e2 = pos[:, 2] - pos[:, 0]
    nrm = np.cross(e1, e2)
    area2 = np.linalg.norm(nrm, axis=-1)
    area = 0.5 * area2
    nrm = nrm / np.maximum(area2[:, None], 1e-12)
    cent = pos.mean(axis=1)
    lum = emis[ids] @ _LUM
    power = np.maximum(lum * area, 1e-12)

    s = (e + min(max_clusters, e) - 1) // min(max_clusters, e)  # slots/cluster
    # re-derive the cluster count from the slot count so NO cluster is all
    # padding (e=65 with c=64,s=2 would leave 31 dead zero-power clusters,
    # reachable through float rounding at the importance-CDF tail)
    c = (e + s - 1) // s
    pad = c * s - e
    assert pad < s

    def padc(a, fill=0.0):
        return np.concatenate(
            [a, np.full((pad,) + a.shape[1:], fill, a.dtype)], 0) \
            .reshape((c, s) + a.shape[1:])

    p_cs = padc(power.astype(np.float32))                     # [C,S]
    cent_cs = padc(cent.astype(np.float32))                   # [C,S,3]
    nrm_cs = padc(nrm.astype(np.float32))
    tid_cs = padc(ids.astype(np.int32), fill=0)

    p_c = p_cs.sum(1)                                         # [C]
    w = (p_cs / np.maximum(p_c[:, None], 1e-12))[..., None]
    cc = (cent_cs * w).sum(1)                                 # power centroid
    mask = padc(np.ones((e,), np.float32)) > 0.0
    d = np.linalg.norm(cent_cs - cc[:, None], axis=-1)
    # sphere must bound the farthest triangle VERTEX, not centroid
    vrad = np.linalg.norm(
        padc(pos.astype(np.float32)).reshape(c, s * 3, 3)
        - cc[:, None], axis=-1)
    rad = np.where(np.repeat(mask, 3, axis=1), vrad, 0.0).max(1)  # [C]
    # normal cone: power-weighted mean axis + worst-case deviation
    axis = (nrm_cs * w).sum(1)
    axis /= np.maximum(np.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
    cosd = np.einsum("csk,ck->cs", nrm_cs, axis)
    cos_cone = np.where(mask, cosd, 1.0).min(1)               # [C]

    cdf_in = np.cumsum(p_cs, axis=1)
    cdf_in = cdf_in / np.maximum(cdf_in[:, -1:], 1e-12)       # [C,S]
    # in-cluster pick pdf + dense tid tables for the MIS query path
    pick = p_cs / np.maximum(p_c[:, None], 1e-12)             # [C,S]
    inv_area = 1.0 / np.maximum(padc(area.astype(np.float32)), 1e-12)
    pdf_in_area = pick * inv_area                             # pdf_area | c
    cluster_of = np.zeros((scene.num_triangles,), np.int32)
    pdfin_of = np.zeros((scene.num_triangles,), np.float32)
    cluster_of[ids] = np.repeat(np.arange(c, dtype=np.int32), s)[:e]
    pdfin_of[ids] = pdf_in_area.reshape(-1)[:e]
    return dict(kind="cluster", n_clusters=c, slot_count=s,
                tid=jnp.asarray(tid_cs),                      # [C,S]
                cdf_in=jnp.asarray(cdf_in.astype(np.float32)),
                pdf_in_area=jnp.asarray(pdf_in_area.astype(np.float32)),
                power=jnp.asarray(p_c.astype(np.float32)),    # [C]
                center=jnp.asarray(cc.astype(np.float32)),    # [C,3]
                radius=jnp.asarray(rad.astype(np.float32)),   # [C]
                cone_axis=jnp.asarray(axis.astype(np.float32)),
                cone_cos=jnp.asarray(cos_cone.astype(np.float32)),
                cluster_by_tid=jnp.asarray(cluster_of),
                pdf_in_by_tid=jnp.asarray(pdfin_of))


# --------------------------------------------------------------------------
# per-point cluster importance (dense, [N, C] — the "traversal")
# --------------------------------------------------------------------------

def _cluster_importance(lc, p):
    """[N, C] unnormalized importance of each cluster seen from points p
    (LightBVHSampler's importance heuristic: power over squared distance,
    attenuated by the normal-cone facing bound; distances inside the
    bounding sphere clamp to the sphere radius so nearby clusters don't
    blow up the estimator)."""
    to_c = lc["center"][None, :, :] - p[:, None, :]           # [N,C,3]
    d2 = jnp.sum(to_c * to_c, -1)
    r2 = lc["radius"] * lc["radius"]
    d2c = jnp.maximum(d2, jnp.maximum(r2, 1e-8))
    d = jnp.sqrt(jnp.maximum(d2, 1e-12))
    w = to_c / d[..., None]
    # facing bound: cos of (angle(axis, -w) - cone half-angle), clamped —
    # a cluster whose emitters all face away contributes ~0
    cos_ang = jnp.sum(lc["cone_axis"][None] * (-w), -1)
    sin_ang = jnp.sqrt(jnp.maximum(1.0 - cos_ang * cos_ang, 0.0))
    cos_cone = lc["cone_cos"][None]
    sin_cone = jnp.sqrt(jnp.maximum(1.0 - cos_cone * cos_cone, 0.0))
    # subtended half-angle of the bounding sphere widens the cone bound
    sin_sub = jnp.clip(lc["radius"][None] / d, 0.0, 1.0)
    cos_sub = jnp.sqrt(jnp.maximum(1.0 - sin_sub * sin_sub, 0.0))
    cos_m1 = cos_ang * cos_cone + sin_ang * sin_cone          # cos(ang-cone)
    # best-case emission cosine over the sphere: cos(ang - cone - sub),
    # i.e. the subtended angle WIDENS the cone (conservative importance)
    sin_m1 = jnp.sqrt(jnp.maximum(1.0 - cos_m1 * cos_m1, 0.0))
    facing = jnp.where(cos_ang >= cos_cone, 1.0,
                       jnp.clip(cos_m1 * cos_sub + sin_m1 * sin_sub,
                                0.0, 1.0))
    inside = d2 <= r2 * 1.0001
    facing = jnp.where(inside, 1.0, facing)
    return lc["power"][None] * facing / d2c + 1e-20


def _cluster_pdf_and_pick(lc, p, u):
    imp = _cluster_importance(lc, p)                          # [N,C]
    total = jnp.sum(imp, -1, keepdims=True)
    pdf_c = imp / total
    cdf = jnp.cumsum(pdf_c, -1)
    pick = jnp.sum((cdf < u[:, None]).astype(jnp.int32), -1)
    pick = jnp.clip(pick, 0, lc["n_clusters"] - 1)
    return pdf_c, pick


# --------------------------------------------------------------------------
# sampling + pdf query (jit-side)
# --------------------------------------------------------------------------

def sample_clustered(lc, scene, p, u1, u2, u3, u4):
    """Draw one emissive sample per point p [N,3].  Returns
    (wi, dist, Le, pdf_solid_angle, valid, tid) — the same contract as the
    flat power sampler so callers can switch samplers freely."""
    n = p.shape[0]
    pdf_c, ci = _cluster_pdf_and_pick(lc, p, u1)
    onehot = (jnp.arange(lc["n_clusters"])[None, :] == ci[:, None])
    onehot_f = onehot.astype(jnp.float32)
    # row extraction via MXU: [N,C] @ [C,S]
    row_cdf = onehot_f @ lc["cdf_in"]                         # [N,S]
    si = jnp.sum((row_cdf < u2[:, None]).astype(jnp.int32), -1)
    si = jnp.clip(si, 0, lc["slot_count"] - 1)
    # slot extraction as a second one-hot reduce (gather-free; triangle ids
    # stay exact in f32 below 2^24 — scenes are ~1M tris at most)
    sl_onehot = (jnp.arange(lc["slot_count"])[None, :]
                 == si[:, None]).astype(jnp.float32)
    tid = jnp.sum((onehot_f @ lc["tid"].astype(jnp.float32))
                  * sl_onehot, -1).astype(jnp.int32)
    pdf_in = jnp.sum((onehot_f @ lc["pdf_in_area"]) * sl_onehot, -1)
    pdf_cluster = jnp.sum(pdf_c * onehot_f, -1)

    tri = scene.positions[tid]                                # [N,3,3]
    su = jnp.sqrt(u3)
    b1 = 1.0 - su
    b2 = u4 * su
    q = (tri[:, 0] * (1.0 - b1 - b2)[:, None]
         + tri[:, 1] * b1[:, None] + tri[:, 2] * b2[:, None])
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    ln = jnp.cross(e1, e2)
    l_area = 0.5 * jnp.linalg.norm(ln, axis=-1)
    ln = ln / jnp.maximum(2.0 * l_area[:, None], 1e-8)
    to_q = q - p
    dist = jnp.linalg.norm(to_q, axis=-1)
    wi = to_q / jnp.maximum(dist[:, None], 1e-8)
    cos_l = jnp.abs(jnp.sum(ln * wi, -1))
    le = scene.mat_emissive[scene.material_id[tid]]
    pdf_w = (dist * dist) * pdf_cluster * pdf_in \
        / jnp.maximum(cos_l, 1e-8)
    # pdf_in == 0 marks a padding slot (CDF-tail rounding can select one);
    # without this guard the caller's 1/max(pdf, eps) turns the padded
    # slot's aliased triangle into a ~1e8-amplified firefly
    valid = (cos_l > 1e-4) & (dist > 1e-4) & (pdf_in > 0.0)
    return wi, dist, le, pdf_w, valid, tid


def pdf_clustered_w(lc, scene, p, wi, t, tid):
    """Solid-angle pdf of NEE-sampling triangle `tid` from point p with the
    clustered sampler (the MIS query for BSDF-path emitter hits)."""
    safe = jnp.maximum(tid, 0)
    tri = scene.positions[safe]
    e1 = tri[..., 1, :] - tri[..., 0, :]
    e2 = tri[..., 2, :] - tri[..., 0, :]
    ln = jnp.cross(e1, e2)
    a2 = jnp.linalg.norm(ln, axis=-1)
    cos_l = jnp.abs(jnp.sum(ln * wi, -1)) / jnp.maximum(a2, 1e-8)
    pdf_c_all = _cluster_importance(lc, p)
    pdf_c_all = pdf_c_all / jnp.sum(pdf_c_all, -1, keepdims=True)
    ci = lc["cluster_by_tid"][safe]
    onehot = (jnp.arange(lc["n_clusters"])[None, :]
              == ci[:, None]).astype(jnp.float32)
    pdf_cluster = jnp.sum(pdf_c_all * onehot, -1)
    pdf_area = pdf_cluster * lc["pdf_in_by_tid"][safe]
    return (t * t) * pdf_area / jnp.maximum(cos_l, 1e-8)
