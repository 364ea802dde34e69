"""Texture system — TPU-native replacement for the reference's material
texture bindings (ref Source/Falcor/Scene/Material/StandardMaterial.cpp,
MaterialSystem.cpp: per-material texture handles + sampler objects).

Design (TPU-first, not a translation):
  * All material textures are baked AT SCENE BUILD into one fixed-size page
    stack ``[N_PAGES, PAGE, PAGE, 3]`` float32; a material carries an int32
    page index (-1 = untextured). Fixed page size keeps every shape static
    under jit and turns sampling into a single flat gather.
  * Sampling happens ONCE per pixel in materialization/shading passes
    (G-buffer shading, env lookup, path-tracer hit shading) — NEVER inside
    ray-traversal hot loops. Per CLAUDE.md a per-pixel gather costs ~20 ms
    at 2M px on TPU; that is acceptable for a once-per-frame shading pass
    and ruinous inside a per-chunk traversal loop. In-traversal alpha uses
    the baked per-triangle coverage bitmaps instead (scene.tri_alpha_mask).
  * The environment map is a separate lat-long ``[He, We, 3]`` texture
    (ref Scene/Lights/EnvMap.cpp) sampled by direction.

Mip selection: pages are stored with a 2-level chain baked side by side is
overkill at PAGE=64; instead callers sample the single level — the
reference's ray-cone TexLOD (TexLODHelpers.slang) collapses to the baked
4x4 alpha bitmaps for traversal and full-res pages for shading.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

PAGE = 64  # texels per page side; 64*64*3*4B = 48 KiB per page


# ---------------------------------------------------------------------------
# host-side baking
# ---------------------------------------------------------------------------

def _resize_area(img: np.ndarray, size: int) -> np.ndarray:
    """Area-average / bilinear resize of [h,w,3] float to [size,size,3]
    (host-side, scene build only)."""
    h, w = img.shape[:2]
    if h == size and w == size:
        return img.astype(np.float32)
    ys = (np.arange(size) + 0.5) * h / size - 0.5
    xs = (np.arange(size) + 0.5) * w / size - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    im = img.astype(np.float32)
    top = im[y0][:, x0] * (1 - fx) + im[y0][:, x1] * fx
    bot = im[y1][:, x0] * (1 - fx) + im[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy
    if h > 2 * size and w > 2 * size:  # crude area prefilter for big shrinks
        k = max(h // size, w // size)
        kh, kw = (h // k) * k, (w // k) * k
        box = im[:kh, :kw].reshape(kh // k, k, kw // k, k, 3).mean((1, 3))
        return _resize_area(box, size)
    return out


def build_texture_pages(images) -> np.ndarray | None:
    """Bake a list of [h,w,3]-ish host images (float 0..1 or uint8) into the
    fixed page stack [N, PAGE, PAGE, 3] float32. Returns None for []."""
    if not images:
        return None
    pages = []
    for img in images:
        a = np.asarray(img)
        if a.dtype == np.uint8:
            a = a.astype(np.float32) / 255.0
        if a.ndim == 2:
            a = np.repeat(a[..., None], 3, axis=-1)
        if a.shape[-1] == 4:
            a = a[..., :3]
        pages.append(_resize_area(a.astype(np.float32), PAGE))
    return np.stack(pages, axis=0)


def checkerboard(c0=(0.9, 0.9, 0.9), c1=(0.2, 0.2, 0.2), tiles=8):
    """Procedural checker page (scene-build helper)."""
    yy, xx = np.meshgrid(np.arange(PAGE), np.arange(PAGE), indexing="ij")
    m = (((yy * tiles // PAGE) + (xx * tiles // PAGE)) % 2).astype(np.float32)
    return (np.asarray(c0, np.float32) * (1 - m[..., None])
            + np.asarray(c1, np.float32) * m[..., None])


def noise_texture(seed=0, base=(1.0, 1.0, 1.0), amp=0.4):
    """Value-noise page: smooth LUMINANCE variation around ``base`` (facade/
    dirt stand-in). Single-channel noise so the material's base color tints
    it instead of independent RGB blotches."""
    rng = np.random.default_rng(seed)
    coarse = rng.random((8, 8, 1), np.float32)
    fine = _resize_area(np.repeat(coarse, 3, -1), PAGE)[..., :1]
    return np.clip(np.asarray(base, np.float32)[None, None]
                   * (1.0 + amp * (fine - 0.5)), 0.0, 1.0)


def latlong_sky(he=64, we=128, horizon=(0.8, 0.75, 0.7), zenith=(0.25, 0.45, 0.8),
                sun_dir=(0.35, 0.8, 0.3), sun_intensity=12.0, sun_sharp=400.0):
    """Analytic sky baked to a lat-long env texture [he,we,3]
    (ref Scene/Lights/EnvMap.cpp lat-long layout; the probe itself is
    procedural because media files don't ship)."""
    theta = (np.arange(he) + 0.5) / he * np.pi           # 0..pi from +Y
    phi = (np.arange(we) + 0.5) / we * 2.0 * np.pi - np.pi
    st = np.sin(theta)[:, None]
    d = np.stack([st * np.cos(phi)[None, :],
                  np.cos(theta)[:, None] * np.ones((1, we)),
                  st * np.sin(phi)[None, :]], axis=-1)
    up = np.clip(d[..., 1], -1.0, 1.0)
    t = (up * 0.5 + 0.5)[..., None]
    sky = np.asarray(horizon, np.float32) * (1 - t) + np.asarray(zenith, np.float32) * t
    s = np.asarray(sun_dir, np.float32)
    s = s / np.linalg.norm(s)
    cos_sun = np.clip((d * s).sum(-1), 0.0, 1.0)
    sun = sun_intensity * np.exp(sun_sharp * (cos_sun - 1.0))[..., None]
    return (sky + sun * np.array([1.0, 0.95, 0.85], np.float32)).astype(np.float32)


# ---------------------------------------------------------------------------
# device-side sampling (shading passes only — see module docstring)
# ---------------------------------------------------------------------------

def sample_pages(pages, page_idx, uv, mode="bilinear", fallback=1.0):
    """Sample the page stack at ``uv`` (wrap addressing).

    pages:    [N, PAGE, PAGE, 3]
    page_idx: [...]) int32 page per sample, -1 = untextured -> ``fallback``
    uv:       [..., 2] float
    Returns [..., 3]. One flat gather per texel fetched (1 nearest /
    4 bilinear)."""
    import jax as _jax
    n = pages.shape[0]
    from ..ops.warp_pallas import whole_map_exact
    if (mode == "bilinear" and uv.ndim == 3 and uv.shape[0] >= 8
            and uv.shape[1] >= 128 and whole_map_exact(n * (PAGE + 2),
                                                       PAGE + 2)
            and _jax.devices()[0].platform not in ("cpu",)):
        # TPU: stack the wrap-padded pages into one tall atlas and sample
        # through the warp kernel's whole-map region (exact, gather-free;
        # the XLA form is 4 gathers/pixel, ~100 ms at 1080p). Wrap
        # addressing folds into the page pad; taps never cross pages.
        from ..ops.warp_pallas import warp_resample_pallas
        pp = jnp.pad(pages, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="wrap")
        atlas = jnp.moveaxis(pp, -1, 0).reshape(3, n * (PAGE + 2), PAGE + 2)
        pi_s = jnp.clip(page_idx, 0, n - 1).astype(jnp.int32)
        xl = jnp.remainder(uv[..., 0] * PAGE - 0.5, PAGE)
        yl = jnp.remainder(uv[..., 1] * PAGE - 0.5, PAGE)
        out = warp_resample_pallas(
            atlas, xl + 1.5,
            yl + 1.5 + pi_s.astype(jnp.float32) * (PAGE + 2),
            jnp.ones((3,) + uv.shape[:2]), mode="bilinear")
        out = jnp.moveaxis(out, 0, -1)
        return jnp.where((page_idx >= 0)[..., None], out,
                         jnp.float32(fallback))
    flat = pages.reshape(n * PAGE * PAGE, 3)
    pi = jnp.clip(page_idx, 0, n - 1).astype(jnp.int32)
    u = uv[..., 0] * PAGE - 0.5
    v = uv[..., 1] * PAGE - 0.5

    def fetch(tx, ty):
        tx = jnp.remainder(tx, PAGE)
        ty = jnp.remainder(ty, PAGE)
        return jnp.take(flat, (pi * (PAGE * PAGE) + ty * PAGE + tx)
                        .reshape(-1), axis=0).reshape(uv.shape[:-1] + (3,))

    if mode == "nearest":
        out = fetch(jnp.floor(u + 0.5).astype(jnp.int32),
                    jnp.floor(v + 0.5).astype(jnp.int32))
    else:
        x0 = jnp.floor(u).astype(jnp.int32)
        y0 = jnp.floor(v).astype(jnp.int32)
        fx = (u - x0.astype(jnp.float32))[..., None]
        fy = (v - y0.astype(jnp.float32))[..., None]
        out = ((fetch(x0, y0) * (1 - fx) + fetch(x0 + 1, y0) * fx) * (1 - fy)
               + (fetch(x0, y0 + 1) * (1 - fx) + fetch(x0 + 1, y0 + 1) * fx) * fy)
    has_tex = (page_idx >= 0)[..., None]
    return jnp.where(has_tex, out, jnp.full_like(out, fallback))


def sample_env(env_map, dirs):
    """Lat-long environment lookup by direction [...,3] (EnvMap.cpp
    dirToUv): theta from +Y, phi around Y. Bilinear, wrap in phi / clamp in
    theta. Returns [..., 3].

    On TPU with a screen-shaped direction field this routes to the warp
    kernel (ops/warp_pallas.py): the map is small enough that each block's
    DMA region covers it whole, so the kernel is an exact sampler — the
    XLA form is 4 per-pixel gathers (~80-160 ms/frame at 1080p, twice per
    shaded frame)."""
    import jax as _jax
    he, we = env_map.shape[0], env_map.shape[1]
    d = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(d[..., 2], d[..., 0])
    v = theta / jnp.pi * he - 0.5
    u = (phi + jnp.pi) / (2.0 * jnp.pi) * we - 0.5
    from ..ops.warp_pallas import whole_map_exact
    if (dirs.ndim == 3 and dirs.shape[0] >= 8 and dirs.shape[1] >= 128
            and whole_map_exact(he, we)
            and _jax.devices()[0].platform not in ("cpu",)):
        # exact only when the kernel's DMA region covers the WHOLE map; for
        # wider maps a seam-straddling block's tap spread exceeds the
        # motion-bounded region and would land on the zero fallback (black
        # seam band) — those take the XLA gather path instead
        from ..ops.warp_pallas import warp_resample_pallas
        tex = jnp.moveaxis(env_map, -1, 0)
        out = warp_resample_pallas(tex, u + 0.5, v + 0.5,
                                   jnp.zeros((3,) + dirs.shape[:2]),
                                   mode="bilinear", wrap_x=True)
        return jnp.moveaxis(out, 0, -1)
    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.floor(v).astype(jnp.int32)
    fx = (u - x0.astype(jnp.float32))[..., None]
    fy = (v - y0.astype(jnp.float32))[..., None]
    flat = env_map.reshape(he * we, 3)

    def fetch(x, y):
        x = jnp.remainder(x, we)
        y = jnp.clip(y, 0, he - 1)
        return jnp.take(flat, (y * we + x).reshape(-1), axis=0) \
            .reshape(d.shape[:-1] + (3,))

    return ((fetch(x0, y0) * (1 - fx) + fetch(x0 + 1, y0) * fx) * (1 - fy)
            + (fetch(x0, y0 + 1) * (1 - fx) + fetch(x0 + 1, y0 + 1) * fx) * fy)


def bake_alpha_bitmap(alpha_img, texcoords, threshold=0.5):
    """Bake per-triangle 4x4 barycentric alpha-coverage bitmaps from an
    alpha texture — the build-time half of the traversal alpha test
    (ref StochasticDepthMapRT.rt.slang:31-37 textured hashed-alpha; here
    the texture lookup moves to scene build so traversal stays gather-free).

    alpha_img: [h,w] float host alpha texture
    texcoords: [T,3,2] per-triangle uv
    Returns [T] int32 bitmaps (bit j = cell floor(u*4)+4*floor(v*4) opaque).
    """
    a = np.asarray(alpha_img, np.float32)
    h, w = a.shape[:2]
    tc = np.asarray(texcoords, np.float32)
    t = tc.shape[0]
    # sample the 16 cell centers in barycentric space per triangle
    cu = (np.arange(4) + 0.5) / 4.0
    gu, gv = np.meshgrid(cu, cu, indexing="xy")
    b1 = gu.reshape(-1)           # 16
    b2 = gv.reshape(-1)
    keep = b1 + b2 <= 1.0         # cells outside the triangle stay opaque
    uv = (tc[:, None, 0, :] * (1.0 - b1 - b2)[None, :, None]
          + tc[:, None, 1, :] * b1[None, :, None]
          + tc[:, None, 2, :] * b2[None, :, None])      # [T,16,2]
    x = np.clip((np.mod(uv[..., 0], 1.0) * w).astype(np.int64), 0, w - 1)
    y = np.clip((np.mod(uv[..., 1], 1.0) * h).astype(np.int64), 0, h - 1)
    opaque = a[y, x] >= threshold                        # [T,16]
    opaque = opaque | ~keep[None, :]
    bits = (opaque.astype(np.int64) << np.arange(16)[None, :]).sum(-1)
    return bits.astype(np.int32)
