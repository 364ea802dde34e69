"""Stochastic depth-map passes.

StochasticDepthMapRT — the paper's contribution: k-layer stochastic depth by
tracing ONE ray per SD-map texel with any-hit reservoir insertion
(reference Source/RenderPasses/StochasticDepthMapRT/: rayGen
StochasticDepthMapRT.rt.slang:63-105, ray setup Common.slangh:65-92,
insertion algorithm() Common.slangh:102-254, host StochasticDepthMapRT.cpp).

StochasticDepthMap — the raster baseline (Vermeer+Brull): k-layer depth via
stochastic per-fragment coverage masks into an MSAA target
(reference Source/RenderPasses/StochasticDepthMap/StochasticDepth.ps.slang).
TPU version: a k-slot z-tested raster where each fragment picks slots from a
hash-driven coverage mask.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rt
from ..ops.raster import CULL_MODES, _bin_triangles, _setup_triangles
from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass
from ..utils.math import hash2, hash3, normalize
from ..utils.sampling import jitter_grid, stratified_coverage_tables

IMPLEMENTATIONS = {"default": 0, "coverage": 1, "reservoir": 2, "kbuffer": 3}


def _bilinear_sample(tex, uv):
    """Linear-filtered sample of [H,W] at uv (the ref downsamples full-res
    linearZ to SD res with a linear sampler, Common.slangh:6,75)."""
    h, w = tex.shape
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    a = tex[y0, x0] * (1 - fx) + tex[y0, x1] * fx
    b = tex[y1, x0] * (1 - fx) + tex[y1, x1] * fx
    return a * (1 - fy) + b * fy


def _downsample_linear(tex, divisor: int, dim_w: int, dim_h: int):
    """Gather-free equivalent of _bilinear_sample on the REGULAR SD grid:
    SD texel (sx, sy) samples full-res uv ((sx+0.5)/dim_w, ...), which lands
    at fixed fractional offsets per divisor — an average of strided slices
    (per-texel bilinear gathers cost ~1e8/s on TPU; this is ~15 ms saved at
    387k SD texels, CLAUDE.md gather rule). Exact for divisor in {1,2,4}."""
    h, w = tex.shape
    if divisor == 1:
        return tex[:dim_h, :dim_w]
    o = divisor // 2  # sample point = divisor*s + o - 0.5 -> texels o-1, o
    t = tex[:dim_h * divisor, :dim_w * divisor]
    rows0 = t[o - 1::divisor][:dim_h]
    rows1 = t[o::divisor][:dim_h]
    r = (rows0 + rows1) * 0.5
    return (r[:, o - 1::divisor][:, :dim_w] + r[:, o::divisor][:, :dim_w]) * 0.5


@register_pass("StochasticDepthMapRT")
class StochasticDepthMapRT(RenderPass):
    """Output 'stochasticDepth': [sdH, sdW, SampleCount] normalized view
    depths, 1.0 where empty. SD resolution (incl. guard band) is inferred
    from the rayMin/rayMax inputs."""

    # MaxCount: 0 = uncapped (see passes/svao.py stochMaxCount note — the
    # reference's MAX_COUNT=8 default is a GPU-traversal perf knob that
    # COSTS on TPU; the cap is fully implemented for parity when set)
    SCHEMA = dict(SampleCount=4, CullMode="Back", AlphaTest=True,
                  Implementation="default", Alpha=0.2, RayInterval=True,
                  normalize=True, StoreNormals=False, Jitter=True,
                  GuardBand=0, MaxCount=0, linearize=False, depthFormat=None,
                  chunk=128, usePallas=True,
                  # 'auto': stream triangle chunks HBM->VMEM by DMA (the BVH
                  # tier, ops/rt_pallas.sd_trace_pallas_stream) once the scene
                  # exceeds what comfortably stays VMEM-resident
                  pallasStream="auto")

    def reflect(self, ctx):
        return (PassReflection().add_input("linearZ").add_input("rayMin")
                .add_input("rayMax").add_output("stochasticDepth"))

    def execute(self, ctx, inputs, state=None):
        cam = ctx.scene.camera
        ray_min = inputs["rayMin"]
        ray_max = inputs["rayMax"]
        sd_h, sd_w = ray_max.shape
        guard = int(self.cfg["GuardBand"])
        dim_w, dim_h = sd_w - 2 * guard, sd_h - 2 * guard
        k = int(self.cfg["SampleCount"])

        # ray per texel (Common.slangh:65-92)
        px = jnp.arange(sd_w, dtype=jnp.int32)
        py = jnp.arange(sd_h, dtype=jnp.int32)
        pxg, pyg = jnp.meshgrid(px, py, indexing="xy")
        signed = jnp.stack([pxg - guard, pyg - guard], -1).astype(jnp.float32)
        jit = jitter_grid(sd_h, sd_w, bool(self.cfg["Jitter"]))
        origin, dirs = cam.compute_ray_pinhole(signed, (dim_w, dim_h), jitter=jit)

        cos_w = jnp.sum(dirs * (cam.camera_w / jnp.linalg.norm(cam.camera_w)), -1)
        inv_cos = 1.0 / cos_w
        tmax = cam.far_z * inv_cos

        inside = ((signed[..., 0] >= 0) & (signed[..., 0] < dim_w)
                  & (signed[..., 1] >= 0) & (signed[..., 1] < dim_h))
        frame_uv = (signed + 0.5) / jnp.asarray([dim_w, dim_h], jnp.float32)
        divisor = inputs["linearZ"].shape[1] // max(dim_w, 1)
        if divisor in (1, 2, 4) \
                and inputs["linearZ"].shape[1] == dim_w * divisor \
                and inputs["linearZ"].shape[0] == dim_h * divisor:
            # regular-grid fast path: strided-slice average, placed into the
            # guard-banded grid (outside texels take depth 0 either way)
            interior = _downsample_linear(inputs["linearZ"], divisor,
                                          dim_w, dim_h)
            depth = jnp.pad(interior, ((guard, sd_h - dim_h - guard),
                                       (guard, sd_w - dim_w - guard)))
        else:
            depth = jnp.where(inside, _bilinear_sample(
                inputs["linearZ"], jnp.clip(frame_uv, 0.0, 1.0)), 0.0)
        eps = 0.1 * cam.near_z
        tmin = depth * inv_cos + eps  # start behind first known hit

        if self.cfg["RayInterval"]:
            # the reference treats a raw value of 0 as "not written"
            # (Common.slangh:80-89); rayMin clear = FLT_MAX kills unrequested
            # texels via max()
            tmin = jnp.where(ray_min != 0.0, jnp.maximum(ray_min, tmin), tmin)
            tmax = jnp.where(ray_max != 0.0, jnp.minimum(ray_max, tmax), tmax)

        impl = self.cfg["Implementation"]
        if isinstance(impl, int):
            impl = {0: "default", 1: "coverage", 2: "reservoir", 3: "kbuffer"}[impl]
        if impl == "reservoir":
            impl = "default"  # the reference's enum alias
        mc = self.cfg["MaxCount"]
        max_count = int(mc) if mc else None  # 0/None = uncapped
        if impl == "coverage":
            max_count = None  # coverage ignores MAX_COUNT (Common.slangh:117)
        alpha = float(self.cfg["Alpha"])
        from ..ops import rt_pallas as rp
        use_pallas = (bool(self.cfg["usePallas"])
                      and not (impl == "coverage" and k > rp.COVERAGE_MAX_K)
                      and jax.devices()[0].platform != "cpu")
        if use_pallas:
            stream = self.cfg["pallasStream"]
            if stream == "auto":
                stream = ctx.scene.num_triangles > 65536
            if stream:
                tri_packed, aabb = rp.prep_triangles_packed(
                    ctx.scene, bool(self.cfg["AlphaTest"]))
                # pinhole-fan screen cull: chunk footprint rect in SD-texel
                # coords + origin-distance range (chunk_screen_rows) — far
                # tighter than the world box test for a shared-origin fan
                scr = rp.chunk_screen_rows(aabb, origin, cam.camera_u,
                                           cam.camera_v, cam.camera_w,
                                           dim_w, dim_h)
                aabb = jnp.concatenate([aabb[:6], scr], axis=0)

                # 8x32-tile ray order: each kernel block covers a compact
                # texel tile -> tight segment AABBs -> few chunk visits
                def tf(x2d, fill=0.0):
                    p, _ = rp.pad_tile(x2d, fill)
                    return rp.tile_flatten(p)

                ph = sd_h + (-sd_h) % rp.TILE_RH
                pw = sd_w + (-sd_w) % rp.TILE_RW
                packed = rp.sd_trace_pallas_stream(
                    tri_packed, aabb,
                    jnp.broadcast_to(origin, (ph * pw, 3)),
                    tf(dirs), tf(tmin), tf(tmax, fill=-1.0), tf(cos_w),
                    cam.near_z, cam.far_z, num_samples=k,
                    cull_back=(self.cfg["CullMode"] == "Back"),
                    mode=impl, max_count=max_count, alpha=alpha,
                    rx=tf(signed[..., 0]), ry=tf(signed[..., 1]))
                packed = rp.tile_unflatten(packed, ph, pw)[
                    :sd_h, :sd_w].reshape(-1, k)
            else:
                v0t, e1t, e2t, flags = rp.prep_triangles(
                    ctx.scene, bool(self.cfg["AlphaTest"]))
                packed = rp.sd_trace_pallas(
                    v0t, e1t, e2t, flags,
                    jnp.broadcast_to(origin, (sd_h * sd_w, 3)),
                    dirs.reshape(-1, 3), tmin.reshape(-1), tmax.reshape(-1),
                    cos_w.reshape(-1), cam.near_z, cam.far_z,
                    num_samples=k,
                    cull_back=(self.cfg["CullMode"] == "Back"),
                    mode=impl, max_count=max_count, alpha=alpha)
            depths = rp.decode_packed(packed, cam.near_z, cam.far_z,
                                      bool(self.cfg["normalize"]), mode=impl)
        else:
            depths = rt.sd_trace(
                ctx.scene, origin[None, :].repeat(sd_h * sd_w, 0),
                dirs.reshape(-1, 3), tmin.reshape(-1), tmax.reshape(-1),
                num_samples=k, normalize=bool(self.cfg["normalize"]),
                implementation=impl, max_count=max_count, alpha=alpha,
                chunk=int(self.cfg["chunk"]),
                cull=rt.CULL_BACK if self.cfg["CullMode"] == "Back" else rt.CULL_NONE,
                alpha_test=bool(self.cfg["AlphaTest"]))
        sd = depths.reshape(sd_h, sd_w, k)
        ctx.debug_print("sdrt.stochasticDepth", sd)
        ctx.debug_print("sdrt.rayMin", ray_min)
        ctx.debug_print("sdrt.rayMax", ray_max)
        return {"stochasticDepth": sd}, None


@register_pass("StochasticDepthMap")
class StochasticDepthMap(RenderPass):
    """Raster stochastic depth (reference StochasticDepthMap/
    StochasticDepth.ps.slang): rasterize all geometry over the SD grid; each
    fragment beyond the first depth layer writes into a pseudo-random subset
    of the k sample slots (alpha-weighted stratified coverage mask,
    ps.slang:101-118), z-tested per slot. Depths stored linearized to [0,1]
    like the RT variant (host 'linearize' option)."""

    SCHEMA = dict(SampleCount=4, CullMode="Back", AlphaTest=True,
                  Implementation="default", Alpha=0.375, RayInterval=True,
                  linearize=True, depthFormat=None, maxPerTile=256,
                  divisor=1)

    def reflect(self, ctx):
        return (PassReflection().add_input("depthMap")
                .add_input("rayMin", optional=True)
                .add_input("rayMax", optional=True)
                .add_output("stochasticDepth"))

    def execute(self, ctx, inputs, state=None):
        cam = ctx.scene.camera
        ray_max = inputs.get("rayMax")
        if ray_max is not None:
            sd_h, sd_w = ray_max.shape
        else:
            d = int(self.cfg["divisor"])
            sd_h, sd_w = -(-ctx.height // d), -(-ctx.width // d)
        k = int(self.cfg["SampleCount"])
        alpha = float(self.cfg["Alpha"])

        lin_full = cam.linearize_depth(inputs["depthMap"])
        div0 = lin_full.shape[1] // max(sd_w, 1)
        if div0 in (1, 2, 4) and lin_full.shape[1] == sd_w * div0 \
                and lin_full.shape[0] == sd_h * div0:
            first_lin = _downsample_linear(lin_full, div0, sd_w, sd_h)
        else:
            first_lin = _bilinear_sample(lin_full, _uv_grid(sd_h, sd_w))

        depths = _raster_stochastic(
            ctx.scene, sd_w, sd_h, k, alpha,
            first_depth=first_lin,
            ray_min=inputs.get("rayMin") if self.cfg["RayInterval"] else None,
            ray_max=ray_max if self.cfg["RayInterval"] else None,
            cull=self.cfg["CullMode"].lower(),
            max_per_tile=int(self.cfg["maxPerTile"]))
        if self.cfg["linearize"]:
            depths = jnp.clip((depths - cam.near_z) / (cam.far_z - cam.near_z),
                              0.0, 1.0)
        return {"stochasticDepth": depths}, None


def _uv_grid(h, w):
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    return jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)


def _raster_stochastic(scene, width, height, k, alpha, first_depth=None,
                       ray_min=None, ray_max=None, cull="back",
                       max_per_tile=256):
    """k-slot stochastic raster. Returns LINEAR view depths [H,W,k]
    (far where empty). Fragment logic follows StochasticDepth.ps.slang:
      - discard fragments at/under the first depth layer (:65-70)
      - discard outside the rayMin/rayMax interval (:75-85)
      - coverage: R = floor(alpha*k + rng) stratified slots (:101-118)
    """
    import jax

    from ..ops.raster import TILE_H, TILE_W

    cam = scene.camera
    if (scene.num_triangles > 8192
            and jax.devices()[0].platform not in ("cpu",)):
        # at-scale tier: the XLA binning scatter below is the whole-frame
        # bottleneck (ops/raster_pallas.py header, measured numbers)
        from ..ops.raster_pallas import raster_stochastic_pallas
        return raster_stochastic_pallas(
            cam.view_proj_no_jitter, scene.positions, cam.far_z,
            width=width, height=height, k=k, alpha=alpha,
            first_depth=first_depth, ray_min=ray_min, ray_max=ray_max,
            cull=cull)
    coef, bbox, valid = _setup_triangles(
        cam.view_proj_no_jitter, scene.positions, width, height,
        jnp.float32(0), jnp.float32(0), CULL_MODES[cull])
    lists, _ = _bin_triangles(bbox, valid, width, height, max_per_tile)

    nty, ntx, mpt = lists.shape
    flat = lists.reshape(-1, mpt)
    nt = flat.shape[0]
    tile_coef = coef[jnp.maximum(flat, 0)]
    tile_valid = flat >= 0

    ty = jnp.arange(nt, dtype=jnp.int32) // ntx
    tx = jnp.arange(nt, dtype=jnp.int32) % ntx
    yy = (ty[:, None, None] * TILE_H + jnp.arange(TILE_H)[None, :, None]).astype(jnp.float32) + 0.5
    xx = (tx[:, None, None] * TILE_W + jnp.arange(TILE_W)[None, None, :]).astype(jnp.float32) + 0.5
    yy = jnp.broadcast_to(yy, (nt, TILE_H, TILE_W))
    xx = jnp.broadcast_to(xx, (nt, TILE_H, TILE_W))

    def tile_of(img, fill):
        if img is None:
            return None
        pad_h, pad_w = nty * TILE_H - img.shape[0], ntx * TILE_W - img.shape[1]
        f = jnp.pad(img, ((0, pad_h), (0, pad_w)), constant_values=fill)
        return (f.reshape(nty, TILE_H, ntx, TILE_W)
                .transpose(0, 2, 1, 3).reshape(nt, TILE_H, TILE_W))

    first_t = tile_of(first_depth, 0.0)
    rmin_t = tile_of(ray_min, 0.0)
    rmax_t = tile_of(ray_max, 0.0)

    # stratified coverage tables (StochasticDepthMapRT.cpp:79-124)
    indices_np, lookup_np = stratified_coverage_tables(k)
    indices = jnp.asarray(indices_np.astype(np.int32))
    lookup = jnp.asarray(lookup_np.astype(np.int32))

    def body(carry, slot):
        z = carry  # [NT, k, TH, TW] linear view depth
        c = slot["coef"]
        ok = slot["valid"]
        tid = slot["tid"].astype(jnp.float32)

        def edge(row):
            return (c[:, row, 0][:, None, None] * xx
                    + c[:, row, 1][:, None, None] * yy
                    + c[:, row, 2][:, None, None])

        e0, e1, e2 = edge(0), edge(1), edge(2)
        zn, wd = edge(3), edge(4)
        esum = jnp.where(e0 + e1 + e2 == 0.0, 1.0, e0 + e1 + e2)
        view_depth = wd / esum
        inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (wd > 0) & ok[:, None, None]
        zndc = zn / jnp.where(wd == 0.0, 1.0, wd)
        inside = inside & (zndc >= 0.0) & (zndc <= 1.0)
        if first_t is not None:
            inside = inside & (view_depth > first_t + 0.01)
        if rmin_t is not None:
            inside = inside & jnp.where(rmin_t != 0.0, view_depth >= rmin_t, True)
        if rmax_t is not None:
            # ray interval doubles as the request mask (rayMax==0 => no request)
            inside = inside & (rmax_t != 0.0) & (view_depth <= rmax_t)

        # per-fragment rng from pixel + triangle (the raster variant hashes
        # SV_Position + primitive id)
        tidb = jnp.broadcast_to(tid[:, None, None], xx.shape)
        rng = hash3(jnp.stack([xx, yy, tidb], -1))
        r_cnt = jnp.clip(jnp.floor(alpha * k + rng).astype(jnp.int32), 0, k)
        rng2 = hash3(jnp.stack([yy, tidb + 17.0, xx], -1))
        lo = indices[r_cnt]
        hi = indices[jnp.minimum(r_cnt + 1, k)]
        sel = (lo + (rng2 * (hi - lo)).astype(jnp.int32))
        mask = lookup[jnp.clip(sel, 0, lookup.shape[0] - 1)]
        mask = jnp.where(r_cnt >= k, (1 << k) - 1, mask)

        for s in range(k):
            take = inside & ((mask >> s) & 1).astype(bool) & (view_depth < z[:, s])
            z = z.at[:, s].set(jnp.where(take, view_depth, z[:, s]))
        return z, None

    far = scene.camera.far_z
    init = jnp.full((nt, k, TILE_H, TILE_W), far, jnp.float32)
    slots = {"coef": jnp.moveaxis(tile_coef, 1, 0),
             "valid": jnp.moveaxis(tile_valid, 1, 0),
             "tid": jnp.moveaxis(jnp.maximum(flat, 0), 1, 0)}
    z, _ = jax.lax.scan(body, init, slots)

    z = z.reshape(nty, ntx, k, TILE_H, TILE_W)
    z = jnp.moveaxis(z, 2, 4)  # [nty, ntx, TH, TW, k]
    z = jnp.moveaxis(z, 2, 1).reshape(nty * TILE_H, ntx * TILE_W, k)
    return z[:height, :width]
