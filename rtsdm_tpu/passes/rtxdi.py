"""RTXDIPass — ReSTIR direct illumination with reservoir reuse.

Reference: Source/RenderPasses/RTXDIPass/RTXDIPass.cpp:48 +
Source/Falcor/Rendering/RTXDI/RTXDI.h:1 (vendor SDK: per-pixel reservoir
resampling of light candidates with temporal + spatial reuse, one final
shadow ray). The TPU pipeline (ops/restir.py) keeps reservoirs as dense
planar fields, draws candidates via select-chains / the clustered one-hot
MXU sampler, reuses spatially through static clamped shifts, and warps the
previous frame's reservoirs with the nearest-mode resampler.

mode="Exact" keeps the pre-reservoir behavior: every analytic light shaded
with a shadow ray — the converged estimand ReSTIR approximates (useful as
the quality oracle; tests/test_restir.py compares the two).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass
from ..ops import restir


def _warp_nearest_planes(planes, prev_uv, cur_fallback):
    """Warp a dict of [H,W]/[H,W,3] planes to the previous frame's positions
    (nearest sample — reservoir fields must never blend). TPU: one planar
    warp-kernel call over the stacked channels; CPU: one shared row/col
    take."""
    keys = sorted(planes)
    chans, splits = [], []
    for k in keys:
        a = planes[k]
        if a.ndim == 2:
            chans.append(a[None])
            splits.append(1)
        else:
            chans.append(jnp.moveaxis(a, -1, 0))
            splits.append(a.shape[-1])
    stacked = jnp.concatenate(chans, 0)                      # [C,H,W]
    h, w = stacked.shape[1:]
    sx = prev_uv[..., 0] * w
    sy = prev_uv[..., 1] * h
    if jax.devices()[0].platform != "cpu":
        from ..ops.warp_pallas import warp_resample_pallas
        fb = []
        for k, s in zip(keys, splits):
            a = cur_fallback[k]
            fb.append(a[None] if a.ndim == 2 else jnp.moveaxis(a, -1, 0))
        warped = warp_resample_pallas(stacked, sx, sy,
                                      jnp.concatenate(fb, 0), mode="nearest")
    else:
        iy = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h - 1)
        ix = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w - 1)
        warped = stacked[:, iy, ix]
    out, c0 = {}, 0
    for k, s in zip(keys, splits):
        sl = warped[c0:c0 + s]
        out[k] = sl[0] if s == 1 else jnp.moveaxis(sl, 0, -1)
        c0 += s
    return out


# spiral of static spatial-reuse offsets (unit radius); scaled by
# spatialRadius. Static python ints => clamped shifts, never gathers.
_TAP_PATTERN = [(1, 0), (0, 1), (-1, 1), (1, 1), (-1, 0), (0, -1),
                (1, -1), (-1, -1)]


@register_pass("RTXDIPass")
class RTXDIPass(RenderPass):
    SCHEMA = dict(enabled=True, envMapIntensity=0.25, ambientIntensity=0.05,
                  lightIntensity=1.0, rayShadows=True, mode="ReSTIR",
                  candidatesAnalytic=4, candidatesEmissive=4, spatialTaps=4,
                  spatialRadius=8, temporalMaxM=20.0)

    def __init__(self, props=None):
        super().__init__(props)
        self._clusters = None

    def set_scene(self, scene):
        super().set_scene(scene)
        from ..ops import lights
        self._clusters = lights.build_cluster_sampler(scene) \
            if int(self.cfg["candidatesEmissive"]) > 0 else None

    def reflect(self, ctx):
        return (PassReflection().add_input("vbuffer")
                .add_input("mvec", optional=True).add_output("color"))

    def _gbuffer(self, ctx, ins):
        from .gbuffer_rt import _materialize
        vb = ins["vbuffer"]
        tid = vb[..., 0].astype(jnp.int32)
        bary = vb[..., 1:3]
        return _materialize(ctx.scene, ctx.scene.camera, tid, bary,
                            jnp.zeros(tid.shape), ctx.width, ctx.height)

    def _base_color(self, ctx, g, include_lights, visibility=None):
        from .lighting import _shade
        scene = ctx.scene
        env = jnp.broadcast_to(scene.env_radiance,
                               g["posW"].shape[:2] + (3,))
        return _shade(scene, g, visibility, env,
                      float(self.cfg["ambientIntensity"]),
                      float(self.cfg["envMapIntensity"]),
                      float(self.cfg["lightIntensity"]),
                      include_lights=include_lights)

    # --- exact estimand (pre-reservoir path, quality oracle) ---------------
    def _execute_exact(self, ctx, ins):
        g = self._gbuffer(ctx, ins)
        vis = None
        if self.cfg["rayShadows"] and int(ctx.scene.num_lights) > 0:
            from .lighting import RayShadow
            rs = RayShadow({})
            rs.set_scene(ctx.scene)
            vis = rs.execute(ctx, {"posW": g["posW"],
                                   "normalW": g["faceNormalW"]})[0][
                                       "visibility"]
        return {"color": self._base_color(ctx, g, True, vis)}, None

    # --- ReSTIR path --------------------------------------------------------
    def execute(self, ctx, ins, state=None):
        if str(self.cfg["mode"]) != "ReSTIR":
            return self._execute_exact(ctx, ins)
        from .lighting import shading_inputs
        scene = ctx.scene
        g = self._gbuffer(ctx, ins)
        si = shading_inputs(scene, g)
        h, w = si["hit"].shape
        p, n = si["p"], si["n"]
        frame = jnp.asarray(ctx.frame_index, jnp.uint32)
        depth = jnp.linalg.norm(p - scene.camera.pos_w, axis=-1)
        n_a = int(self.cfg["candidatesAnalytic"]) \
            if int(scene.num_lights) > 0 else 0
        n_e = int(self.cfg["candidatesEmissive"]) \
            if self._clusters is not None else 0
        if n_a + n_e == 0:
            return {"color": self._base_color(ctx, g, False)}, None

        res = restir.initial_candidates(scene, self._clusters, si, frame,
                                        n_a, n_e)
        res = restir.finalize(res)

        # temporal reuse: warp last frame's reservoirs, reject on
        # depth/normal disocclusion, clamp history M (RTXDI temporal bias
        # clamp), merge with the target re-evaluated at this pixel.
        if state is not None:
            uv = jnp.stack(jnp.meshgrid(
                (jnp.arange(w, dtype=jnp.float32) + 0.5) / w,
                (jnp.arange(h, dtype=jnp.float32) + 0.5) / h,
                indexing="xy"), -1)
            mvec = ins.get("mvec")
            prev_uv = uv + (mvec[..., :2] if mvec is not None
                            else jnp.zeros_like(uv))
            planes = {**state["res"], "_depth": state["depth"],
                      "_n": state["n"]}
            prev = _warp_nearest_planes(planes, prev_uv,
                                        {**res, "_depth": depth, "_n": n})
            in_prev = jnp.all((prev_uv >= 0.0) & (prev_uv < 1.0), -1)
            ok = (jnp.abs(prev["_depth"] - depth)
                  / jnp.maximum(depth, 1e-4) < 0.1) \
                & (jnp.sum(prev["_n"] * n, -1) > 0.9) & in_prev
            prev_res = {k: v for k, v in prev.items()
                        if not k.startswith("_")}
            prev_res["m"] = jnp.where(ok, prev_res["m"], 0.0)
            u = restir._rand01(restir._pixel_seeds(h, w, frame, 101))
            res = restir.merge(res, prev_res, si, u,
                               m_cap=float(self.cfg["temporalMaxM"])
                               * (n_a + n_e))
            res = restir.finalize(res)

        # spatial reuse: static clamped-shift taps, geometric rejection
        # (the biased-combine variant: rejected neighbors simply contribute
        # M=0; the depth/normal test bounds the bias like the reference's
        # normal/depth thresholds)
        radius = int(self.cfg["spatialRadius"])
        for t in range(int(self.cfg["spatialTaps"])):
            dy, dx = _TAP_PATTERN[t % len(_TAP_PATTERN)]
            oth = restir.shift2({**res, "_depth": depth, "_n": n},
                                dy * radius, dx * radius)
            ok = (jnp.abs(oth["_depth"] - depth)
                  / jnp.maximum(depth, 1e-4) < 0.1) \
                & (jnp.sum(oth["_n"] * n, -1) > 0.9)
            oth_res = {k: v for k, v in oth.items() if not k.startswith("_")}
            oth_res["m"] = jnp.where(ok, oth_res["m"], 0.0)
            u = restir._rand01(restir._pixel_seeds(h, w, frame, 211 + t))
            res = restir.merge(res, oth_res, si, u)
            res = restir.finalize(res)

        # final shade: one shadow ray to the selected sample
        c_rgb, phat, wi, dist = restir.eval_target(res, si)
        alive = si["hit"] & (phat > 0.0)
        if self.cfg["rayShadows"]:
            facing = jnp.sum(wi * n, -1) > 0.0
            tmax = jnp.where(res["kind"] == restir._KIND_AREA,
                             dist - 1e-3, dist - 0.1)
            vis = restir.trace_visibility(scene, p, wi, tmax,
                                          alive & facing)
        else:
            vis = alive.astype(jnp.float32)
        light_term = c_rgb * (res["w_big"] * vis)[..., None] \
            * float(self.cfg["lightIntensity"])
        color = self._base_color(ctx, g, False) \
            + jnp.where(si["hit"][..., None], light_term, 0.0)
        new_state = dict(res=res, depth=depth, n=n)
        return {"color": color}, new_state
