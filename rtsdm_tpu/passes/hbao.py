"""HBAO baseline pass (reference Source/RenderPasses/HBAO/HBAO.ps.slang,
HBAO.cpp). Horizon-based AO on 4x4-deinterleaved quarter-res depth with a
per-slice random rotation, NdotV-bias kernel and quadratic distance falloff
(HBAO.ps.slang:97-122, 160-246), dual bright/dark channels.

TPU design: all 16 deinterleave slices evaluated in one vectorized program
(leading axis 16) instead of the reference's 16 draw calls (HBAO.cpp:181-190).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass
from ..utils.math import normalize, saturate, transform_vector

NUM_STEPS = 4
NUM_DIRECTIONS = 8

# 16 x (sin theta, cos theta, r1, r2) — the reference generates these from a
# fixed-seed mt19937 (HBAO.cpp:225-251); we freeze an equivalent deterministic
# table (seed 0, numpy Philox) since the exact C++ stream is stdlib-specific.
_rng = np.random.default_rng(0)
_theta = _rng.uniform(0.0, 2.0 * 3.141, 16)
HBAO_NOISE = np.stack([np.sin(_theta), np.cos(_theta),
                       _rng.uniform(0.0, 1.0, 16),
                       _rng.uniform(0.0, 1.0, 16)], axis=-1).astype(np.float32)
del _rng, _theta

DEPTH_MODE = {"SingleDepth": 0, "DualDepth": 1, "StochasticDepth": 2}


def _rotate2d(vec, theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([vec[..., 0] * c - vec[..., 1] * s,
                      vec[..., 0] * s + vec[..., 1] * c], axis=-1)


MAX_SHIFT_REACH = 48  # quarter-res texels; ray lengths clamp here on the
                      # shift path (a 48-texel reach = 192 full-res px —
                      # far past the falloff radius at any sane config)


def _fetch_slices(padded, pad, lvl, offs, qh, qw):
    """Gather-free per-slice fetch: for each of the 16 deinterleave slices,
    fetch its OWN plane at a static (dy,dx) offset chosen per pixel from a
    quantized level table. Same design as ops/ao_shift.fetch_direction but
    without cross-class remapping (HBAO samples within one slice,
    HBAO.ps.slang:165 textureLod on the slice's own texture).

    padded: [16, qh+2p, qw+2p]; lvl: [16,qh,qw] int32; offs: static
    [(dy,dx)] per slice per level. Returns [16,qh,qw]."""
    import numpy as np
    padded = jax.lax.optimization_barrier(padded)
    lvl = jax.lax.optimization_barrier(lvl)
    n_levels = len(offs[0])
    tab = np.zeros((n_levels, 16, 2), np.int32)
    for s in range(16):
        for l, (dy, dx) in enumerate(offs[s]):
            tab[l, s] = (pad + max(-pad, min(pad, dy)),
                         pad + max(-pad, min(pad, dx)))
    tab = jnp.asarray(tab)

    def body(acc, l):
        t = tab[l]
        new = [jnp.where(lvl[s] == l,
                         jax.lax.dynamic_slice(
                             padded, (s, t[s, 0], t[s, 1]), (1, qh, qw))[0],
                         acc[s])
               for s in range(16)]
        return jnp.stack(new), None

    out, _ = jax.lax.scan(body, jnp.zeros((16, qh, qw)), jnp.arange(n_levels))
    return out


@register_pass("HBAO")
class HBAO(RenderPass):
    SCHEMA = dict(radius=1.0, depthMode="SingleDepth", depthBias=0.1,
                  exponent=2.0, samplingMode="Auto")
    UI_CHOICES = dict(depthMode=["SingleDepth", "DualDepth"],
                      samplingMode=["Auto", "Shift", "Gather"])
    UI_RANGES = dict(radius=(0.01, 4.0), exponent=(1.0, 4.0))

    def reflect(self, ctx):
        return (PassReflection()
                .add_input("depth", "linear-depth (deinterleaved [16,qh,qw])")
                .add_input("depth2", "second-layer linear depth (deinterleaved)", optional=True)
                .add_input("normals", "world-space normals (full res)")
                .add_output("ambientMap", "deinterleaved RG ambient"))

    def execute(self, ctx, inputs, state=None):
        cam = ctx.scene.camera
        depth_q = inputs["depth"]                 # [16, qh, qw]
        depth2_q = inputs.get("depth2")
        mode = DEPTH_MODE[self.cfg["depthMode"]]
        if mode == 1 and depth2_q is None:
            mode = 0

        radius = jnp.float32(self.cfg["radius"])
        neg_inv_rsq = -1.0 / (radius * radius)
        ndotv_bias = jnp.float32(self.cfg["depthBias"])
        power = jnp.float32(self.cfg["exponent"])

        res = jnp.array([ctx.width, ctx.height], jnp.float32)
        inv_res = 1.0 / res
        _, qh, qw = depth_q.shape
        rand = jnp.asarray(HBAO_NOISE)            # [16,4]

        # full-res uv of each deinterleaved pixel (HBAO.ps.slang:137-138)
        s_idx = jnp.arange(16, dtype=jnp.int32)
        qoff = jnp.stack([s_idx % 4, s_idx // 4], -1).astype(jnp.float32)  # [16,2]
        qx = jnp.arange(qw, dtype=jnp.float32)
        qy = jnp.arange(qh, dtype=jnp.float32)
        shape = (16, qh, qw)
        px = jnp.broadcast_to(qx[None, None, :] * 4.0 + qoff[:, None, None, 0] + 0.5, shape)
        py = jnp.broadcast_to(qy[None, :, None] * 4.0 + qoff[:, None, None, 1] + 0.5, shape)
        uv = jnp.stack([px * inv_res[0], py * inv_res[1]], axis=-1)  # [16,qh,qw,2]

        lin_z = depth_q
        view_pos = cam.uv_to_view_space(uv, lin_z)

        # view-space normal from the full-res world normal, sampled at uv.
        # When the normal buffer matches the render res the fetch IS the 4x4
        # deinterleave (pure reshapes) — the gather only survives on
        # mismatched sizes.
        normal_w = inputs["normals"][..., :3]
        nh, nw = normal_w.shape[:2]
        if (nh, nw) == (ctx.height, ctx.width) and nh % 4 == 0 and nw % 4 == 0:
            from ..ops.ao_shift import deinterleave
            n_w = deinterleave(normal_w)[:, :qh, :qw]
        else:
            ny = jnp.clip((uv[..., 1] * nh).astype(jnp.int32), 0, nh - 1)
            nx = jnp.clip((uv[..., 0] * nw).astype(jnp.int32), 0, nw - 1)
            n_w = normal_w[ny, nx]
        n_v = normalize(transform_vector(cam.view_mat, n_w))
        flip = jnp.sum(view_pos * n_v, -1, keepdims=True) > 0.0
        n_v = jnp.where(flip, -n_v, n_v)

        # radius in full-res pixels (HBAO.ps.slang:87-93)
        radius_uv = cam.view_space_radius_to_uv_radius(lin_z, radius)
        radius_px = 0.5 * (radius_uv[..., 0] * res[0] + radius_uv[..., 1] * res[1])

        step_px = (radius_px / 4.0) / (NUM_STEPS + 1)
        alpha = 2.0 * 3.141 / NUM_DIRECTIONS

        def compute_ao(sample_pos):
            v = sample_pos - view_pos
            vdotv = jnp.sum(v * v, -1)
            ndotv = jnp.sum(n_v * v, -1) / jnp.sqrt(jnp.maximum(vdotv, 1e-12))
            angle = saturate(ndotv - ndotv_bias)
            fall_x = saturate(vdotv * neg_inv_rsq + 1.0)
            return jnp.stack([angle * fall_x, angle], -1), angle, fall_x

        def sample_depth(tex, sq_xy):
            sx = jnp.clip(sq_xy[..., 0], 0, qw - 1)
            sy = jnp.clip(sq_xy[..., 1], 0, qh - 1)
            slice_ix = jnp.broadcast_to(s_idx[:, None, None], sx.shape)
            return tex[slice_ix, sy, sx]

        base_q = jnp.stack([jnp.broadcast_to(qx[None, None, :], lin_z.shape),
                            jnp.broadcast_to(qy[None, :, None], lin_z.shape)], -1)

        sm = self.cfg["samplingMode"]
        use_shift = (sm == "Shift" or
                     (sm == "Auto"
                      and jax.devices()[0].platform not in ("cpu",)))

        def sample_pair(i, k, ray_px, direction_np=None, direction=None,
                        shift_ctx=None):
            """One (direction, step) tap -> (z1, z2-or-None, s_uv)."""
            if shift_ctx is None:                       # exact gather path
                off = jnp.round(ray_px[..., None]
                                * direction[:, None, None, :])
                sq = (base_q + off).astype(jnp.int32)
                s_uv = uv + off * 4.0 * inv_res
                z1 = sample_depth(depth_q, sq)
                z2 = sample_depth(depth2_q, sq) if mode == 1 else None
                return z1, z2, s_uv
            # gather-free path: quantize |off| onto the static level table,
            # fetch via per-slice static slices (TPU has no hardware gather —
            # the 32 per-pixel fetches of this ring cost more than the rest
            # of the pass combined; same design as ops/ao_shift.py)
            from ..ops import ao as A
            from ..ops.ao_shift import level_radius
            levels, dq_pad, d2_pad, pad = shift_ctx
            m = jnp.clip(ray_px, 1.0, float(MAX_SHIFT_REACH))
            lvl = A.shift_level_index(levels, m)
            offs = [[(int(round(float(r) * direction_np[s, 1])),
                      int(round(float(r) * direction_np[s, 0])))
                     for r in levels] for s in range(16)]
            z1 = _fetch_slices(dq_pad, pad, lvl, offs, qh, qw)
            z2 = (_fetch_slices(d2_pad, pad, lvl, offs, qh, qw)
                  if mode == 1 else None)
            r_q = level_radius(levels, lvl)
            d_b = jnp.asarray(direction_np)[:, None, None, :]
            off_eff = jnp.round(r_q[..., None] * d_b)  # == the table entry
            s_uv = uv + off_eff * 4.0 * inv_res
            return z1, z2, s_uv

        shift_ctx = None
        fetched = None
        dir_nps = []
        for i in range(NUM_DIRECTIONS):
            theta = alpha * float(i)
            c_np, s_np = np.cos(theta), np.sin(theta)
            dir_nps.append(np.stack(
                [HBAO_NOISE[:, 0] * c_np - HBAO_NOISE[:, 1] * s_np,
                 HBAO_NOISE[:, 0] * s_np + HBAO_NOISE[:, 1] * c_np],
                axis=-1).astype(np.float32))           # static [16,2]
        if use_shift:
            from ..ops import ao as A
            from ..ops.ao_shift import pad_planes
            levels = A.shift_radius_levels(float(MAX_SHIFT_REACH))
            pad = int(np.ceil(levels[-1]))
            dq_pad = pad_planes(depth_q, pad)
            d2_pad = pad_planes(depth2_q, pad) if mode == 1 else None
            shift_ctx = (levels, dq_pad, d2_pad, pad)
            import os
            if (jax.devices()[0].platform not in ("cpu",)
                    and not os.environ.get("RTSDM_HBAO_NO_PALLAS")):
                # one fused Pallas fetch for ALL dirs x steps: the XLA
                # _fetch_slices loop is dirs*steps*16*levels tiny select
                # ops — measured 57.7 ms of config 1's 66 ms at 256x256
                from ..ops.ao_shift import level_radius
                from ..ops.fetch_pallas import fetch_taps_same_class
                lvl_steps = []
                r_q_steps = []
                rp = rand[:, 2][:, None, None] * step_px + 1.0
                for k in range(NUM_STEPS):
                    m = jnp.clip(rp, 1.0, float(MAX_SHIFT_REACH))
                    lvl_k = A.shift_level_index(levels, m)
                    lvl_steps.append(lvl_k)
                    r_q_steps.append(level_radius(levels, lvl_k))
                    rp = rp + step_px
                offs_key = tuple(
                    tuple(tuple((int(round(float(r) * d_np[s, 1])),
                                 int(round(float(r) * d_np[s, 0])))
                                for r in levels) for s in range(16))
                    for d_np in dir_nps)
                sets = [dq_pad] + ([d2_pad] if mode == 1 else [])
                fetched = fetch_taps_same_class(
                    sets, jnp.stack(lvl_steps), pad=pad, offs_key=offs_key,
                    taps_per_dir=NUM_STEPS)

        ao = jnp.zeros(lin_z.shape + (2,), jnp.float32)
        for i in range(NUM_DIRECTIONS):
            direction_np = dir_nps[i]
            direction = jnp.asarray(direction_np)
            ray_px = rand[:, 2][:, None, None] * step_px + 1.0
            for k in range(NUM_STEPS):
                if fetched is not None:
                    z1 = fetched[0, i * NUM_STEPS + k]
                    z2 = (fetched[1, i * NUM_STEPS + k] if mode == 1
                          else None)
                    d_b = direction[:, None, None, :]
                    s_uv = uv + jnp.round(
                        r_q_steps[k][..., None] * d_b) * 4.0 * inv_res
                else:
                    z1, z2, s_uv = sample_pair(i, k, ray_px,
                                               direction_np=direction_np,
                                               direction=direction,
                                               shift_ctx=shift_ctx)
                s1 = cam.uv_to_view_space(s_uv, z1)
                ao1, angle, fall_x = compute_ao(s1)
                if mode == 1:
                    # resample the second layer where the first is past the
                    # radius but in the positive hemisphere (RecomputeAO,
                    # HBAO.ps.slang:122-132,190-202)
                    need = (angle > 0.0) & (fall_x <= 0.0)
                    s2 = cam.uv_to_view_space(s_uv, z2)
                    ao2, _, _ = compute_ao(s2)
                    ao1 = jnp.where(need[..., None], jnp.maximum(ao1, ao2), ao1)
                ao = ao + ao1
                ray_px = ray_px + step_px

        ao = ao / (NUM_DIRECTIONS * NUM_STEPS)
        out = saturate(1.0 - ao * 2.0) ** power

        # early outs (HBAO.ps.slang:140-157): background or sub-pixel radius
        passthru = (lin_z >= cam.far_z) | (radius_px < 1.0)
        out = jnp.where(passthru[..., None], 1.0, out)
        return {"ambientMap": out}, None
