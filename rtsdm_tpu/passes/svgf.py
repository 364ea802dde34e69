"""SVGFPass — spatiotemporal variance-guided filtering.

Reference: Source/RenderPasses/SVGFPass/ (SVGFPass.cpp + SVGFReproject/
SVGFFilterMoments/SVGFAtrous .ps.slang, 1,147 LoC): demodulate albedo,
temporally reproject illumination + first/second luminance moments along
motion vectors, estimate variance (spatial fallback while history is short),
then N iterations of an edge-stopping 5x5 B3-spline a-trous wavelet filter
whose luminance weight is scaled by the filtered variance.

TPU design: the a-trous taps are STATIC shifts (gather-free, full-VPU);
only the temporal reprojection resamples at per-pixel positions (one
bilinear gather per frame, same as TemporalAO/TAA).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass
from .temporal import _bilinear, _shift

_KERNEL_1D = (3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0)  # B3-spline half-kernel


def _luma(c):
    return (c[..., 0] * 0.2126 + c[..., 1] * 0.7152 + c[..., 2] * 0.0722)


def svgf_init_state(h, w):
    return dict(illum=jnp.zeros((h, w, 3)),
                moments=jnp.zeros((h, w, 2)),
                history=jnp.zeros((h, w)),
                prev_lin=jnp.full((h, w), 1e9),
                prev_n=jnp.zeros((h, w, 3)))


def svgf_filter(illum, n, lin, mvec, state, *, iterations=4, feedback_tap=1,
                var_eps=1e-4, phi_color=10.0, phi_normal=128.0, alpha=0.05,
                moments_alpha=0.2, hist_threshold=4.0, depth_reject=0.1,
                normal_reject=0.8, skip_test_without_motion=False):
    """Spatiotemporal variance-guided filter core (SVGFReproject +
    SVGFFilterMoments + SVGFAtrous .ps.slang): temporally reproject
    illumination + luminance moments along `mvec` (uv-space motion), estimate
    variance (spatial fallback while history < hist_threshold), then
    `iterations` of the edge-stopping 5x5 B3-spline a-trous wavelet.

    Shared by SVGFPass and the NRD denoiser slot. All taps are static shifts;
    the single per-pixel resample is the temporal reprojection bilinear.
    Returns (filtered, new_state); new_state feeds the next frame.
    """
    h, w = lin.shape

    # ---- temporal reprojection (SVGFReproject.ps.slang) ----
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    uv = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1)
    prev_uv = uv + mvec
    in_prev = jnp.all((prev_uv >= 0.0) & (prev_uv < 1.0), -1)
    prev_illum = _bilinear(state["illum"], prev_uv)
    prev_mom = _bilinear(state["moments"], prev_uv)
    prev_hist = _bilinear(state["history"][..., None], prev_uv)[..., 0]
    prev_lin = _bilinear(state["prev_lin"][..., None], prev_uv)[..., 0]
    prev_n = _bilinear(state["prev_n"], prev_uv)

    # disocclusion: relative depth + normal consistency
    depth_ok = jnp.abs(prev_lin - lin) / jnp.maximum(lin, 1e-4) < depth_reject
    norm_ok = jnp.sum(prev_n * n, -1) > normal_reject
    consistent = depth_ok & norm_ok
    if skip_test_without_motion:
        # NRD enableReprojectionTestSkippingWithoutMotion: a static pixel
        # (no motion) keeps its history even when the surface tests fail.
        still = jnp.sum(mvec * mvec, -1) < 1e-12
        consistent = consistent | still
    valid = in_prev & consistent
    hist = jnp.where(valid, prev_hist + 1.0, 1.0)

    a_c = jnp.maximum(float(alpha), 1.0 / hist)
    m_alpha = jnp.maximum(float(moments_alpha), 1.0 / hist)
    l = _luma(illum)
    mom_new = jnp.stack([l, l * l], -1)
    illum_acc = jnp.where(valid[..., None],
                          prev_illum * (1 - a_c[..., None])
                          + illum * a_c[..., None], illum)
    mom_acc = jnp.where(valid[..., None],
                        prev_mom * (1 - m_alpha[..., None])
                        + mom_new * m_alpha[..., None], mom_new)
    variance = jnp.maximum(mom_acc[..., 1] - mom_acc[..., 0] ** 2, 0.0)

    # short history: spatial variance estimate (SVGFFilterMoments)
    sp_m1 = jnp.zeros((h, w))
    sp_m2 = jnp.zeros((h, w))
    cnt = 0.0
    for dy in range(-3, 4):
        for dx in range(-3, 4):
            lv = _luma(_shift(illum_acc, dy, dx))
            sp_m1 = sp_m1 + lv
            sp_m2 = sp_m2 + lv * lv
            cnt += 1.0
    sp_var = jnp.maximum(sp_m2 / cnt - (sp_m1 / cnt) ** 2, 0.0)
    variance = jnp.where(hist < float(hist_threshold), sp_var, variance)

    # ---- a-trous iterations (SVGFAtrous.ps.slang) ----
    phi_c = float(phi_color)
    phi_n = float(phi_normal)
    eps = float(var_eps)
    # depth gradient scale for the z weight
    dzdx = jnp.abs(_shift(lin[..., None], 0, 1)[..., 0] - lin)
    dzdy = jnp.abs(_shift(lin[..., None], 1, 0)[..., 0] - lin)
    zgrad = jnp.maximum(dzdx, dzdy) + 1e-4

    out = illum_acc
    var = variance
    feedback_illum = None
    for it in range(int(iterations)):
        step = 1 << it
        # 3x3 gaussian prefilter of variance for the luminance weight
        gvar = jnp.zeros((h, w))
        gw = ((1 / 16, 1 / 8, 1 / 16), (1 / 8, 1 / 4, 1 / 8),
              (1 / 16, 1 / 8, 1 / 16))
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                gvar = gvar + gw[dy + 1][dx + 1] \
                    * _shift(var[..., None], dy, dx)[..., 0]
        sigma_l = phi_c * jnp.sqrt(jnp.maximum(gvar, 0.0)) + eps
        lum_c = _luma(out)

        acc_c = jnp.zeros((h, w, 3))
        acc_v = jnp.zeros((h, w))
        acc_w = jnp.zeros((h, w))
        for dy in (-2, -1, 0, 1, 2):
            for dx in (-2, -1, 0, 1, 2):
                k = _KERNEL_1D[abs(dy)] * _KERNEL_1D[abs(dx)] * 16.0 / 9.0
                oy, ox = dy * step, dx * step
                c_q = _shift(out, oy, ox)
                v_q = _shift(var[..., None], oy, ox)[..., 0]
                l_q = _luma(c_q)
                z_q = _shift(lin[..., None], oy, ox)[..., 0]
                n_q = _shift(n, oy, ox)
                w_z = jnp.exp(-jnp.abs(z_q - lin)
                              / (zgrad * (abs(dy) + abs(dx) + 1e-4)
                                 * step + 1e-4))
                w_n = jnp.maximum(jnp.sum(n_q * n, -1), 0.0) ** phi_n
                w_l = jnp.exp(-jnp.abs(l_q - lum_c) / sigma_l)
                wt = k * w_z * w_n * w_l
                acc_c = acc_c + c_q * wt[..., None]
                acc_v = acc_v + v_q * wt * wt
                acc_w = acc_w + wt
        out = acc_c / jnp.maximum(acc_w[..., None], 1e-6)
        var = acc_v / jnp.maximum(acc_w * acc_w, 1e-6)
        if it == int(feedback_tap):
            feedback_illum = out

    new_state = dict(
        illum=feedback_illum if feedback_illum is not None else out,
        moments=mom_acc, history=hist, prev_lin=lin, prev_n=n)
    return out, new_state


@register_pass("SVGFPass")
class SVGFPass(RenderPass):
    SCHEMA = dict(Enabled=True, Iterations=4, FeedbackTap=1,
                  VarianceEpsilon=1e-4, PhiColor=10.0, PhiNormal=128.0,
                  Alpha=0.05, MomentsAlpha=0.2)

    def reflect(self, ctx):
        return (PassReflection().add_input("Color")
                .add_input("Albedo", optional=True)
                .add_input("Emission", optional=True)
                .add_input("WorldNormal").add_input("LinearZ")
                .add_input("MotionVec")
                .add_output("Filtered"))

    def init_state(self, ctx):
        return svgf_init_state(ctx.height, ctx.width)

    def execute(self, ctx, inputs, state=None):
        if not self.cfg["Enabled"]:
            return {"Filtered": inputs["Color"]}, state
        color = inputs["Color"][..., :3]
        albedo = inputs.get("Albedo")
        emission = inputs.get("Emission")
        lin = inputs["LinearZ"]
        if lin.ndim == 3:
            lin = lin[..., 0]
        n = inputs["WorldNormal"][..., :3]
        mvec = inputs["MotionVec"][..., :2]
        h, w = lin.shape
        if state is None:
            state = self.init_state(ctx)

        # demodulate: illumination = (color - emission) / albedo
        illum = color
        if emission is not None:
            illum = illum - emission[..., :3]
        if albedo is not None:
            illum = illum / jnp.maximum(albedo[..., :3], 1e-3)

        out, new_state = svgf_filter(
            illum, n, lin, mvec, state,
            iterations=int(self.cfg["Iterations"]),
            feedback_tap=int(self.cfg["FeedbackTap"]),
            var_eps=float(self.cfg["VarianceEpsilon"]),
            phi_color=float(self.cfg["PhiColor"]),
            phi_normal=float(self.cfg["PhiNormal"]),
            alpha=float(self.cfg["Alpha"]),
            moments_alpha=float(self.cfg["MomentsAlpha"]))

        # remodulate
        filtered = out
        if albedo is not None:
            filtered = filtered * jnp.maximum(albedo[..., :3], 1e-3)
        if emission is not None:
            filtered = filtered + emission[..., :3]
        return {"Filtered": filtered}, new_state
