"""Image comparison metrics (reference Source/Tools/ImageCompare/
ImageCompare.cpp:257-260: mse/rmse/mae/mape + FLIP; plus SSIM for the
north-star target)."""
from __future__ import annotations

import jax.numpy as jnp


def mse(a, b):
    return jnp.mean((a - b) ** 2)


def rmse(a, b):
    return jnp.sqrt(mse(a, b))


def mae(a, b):
    return jnp.mean(jnp.abs(a - b))


def mape(a, b, eps=1e-2):
    return jnp.mean(jnp.abs(a - b) / (jnp.abs(b) + eps))


def _gauss_kernel(radius=5, sigma=1.5):
    import numpy as np
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur(x, radius=5, sigma=1.5):
    from ..ops.ao import shift_axis_clamped
    k = _gauss_kernel(radius, sigma)
    for axis in (0, 1):
        acc = jnp.zeros_like(x)
        for i, w in enumerate(k):
            acc = acc + float(w) * shift_axis_clamped(x, axis, i - radius)
        x = acc
    return x


def ssim(a, b, c1=0.01 ** 2, c2=0.03 ** 2):
    """Mean SSIM over [H,W] or [H,W,C] images in [0,1] (Gaussian 11x11)."""
    a = a if a.ndim == 2 else a[..., :3].mean(-1)
    b = b if b.ndim == 2 else b[..., :3].mean(-1)
    mu_a = _blur(a)
    mu_b = _blur(b)
    var_a = _blur(a * a) - mu_a * mu_a
    var_b = _blur(b * b) - mu_b * mu_b
    cov = _blur(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2))
    return jnp.mean(s)


# ---------------------------------------------------------------------------
# FLIP (the published LDR metric: Andersson et al., HPG 2020), matching the
# reference's FLIPPass.cs.slang:96-247 / flip.hlsli. The per-pixel
# neighborhood loops become whole-image convolutions with precomputed
# kernels: CSF spatial filters (A/RG/BY, sums of two Gaussians), Gaussian
# 1st-derivative (edge) and 2nd-derivative (point) feature detectors with
# the reference's positive/negative normalization.
# ---------------------------------------------------------------------------

_QC, _PC, _PT, _W, _QF = 0.7, 0.4, 0.95, 0.082, 0.5  # FLIPPass.cs.slang:60-64

# Rec.709 <-> XYZ (D65)
import numpy as _np

_RGB2XYZ = _np.array([[0.4124, 0.3576, 0.1805],
                      [0.2126, 0.7152, 0.0722],
                      [0.0193, 0.1192, 0.9505]], _np.float64)
_XYZ2RGB = _np.linalg.inv(_RGB2XYZ)
_D65 = _np.array([0.950428545, 1.0, 1.088900371], _np.float64)


def _rgb_to_ycxcz(c):
    xyz = jnp.einsum("ij,...j->...i", jnp.asarray(_RGB2XYZ, jnp.float32), c)
    xyz = xyz / jnp.asarray(_D65, jnp.float32)
    y = 116.0 * xyz[..., 1] - 16.0
    cx = 500.0 * (xyz[..., 0] - xyz[..., 1])
    cz = 200.0 * (xyz[..., 1] - xyz[..., 2])
    return jnp.stack([y, cx, cz], -1)


def _ycxcz_to_rgb(c):
    y = (c[..., 0] + 16.0) / 116.0
    x = y + c[..., 1] / 500.0
    z = y - c[..., 2] / 200.0
    xyz = jnp.stack([x, y, z], -1) * jnp.asarray(_D65, jnp.float32)
    return jnp.einsum("ij,...j->...i", jnp.asarray(_XYZ2RGB, jnp.float32), xyz)


def _rgb_to_cielab(c):
    xyz = jnp.einsum("ij,...j->...i", jnp.asarray(_RGB2XYZ, jnp.float32), c)
    t = xyz / jnp.asarray(_D65, jnp.float32)
    d = 6.0 / 29.0
    f = jnp.where(t > d ** 3, jnp.cbrt(jnp.maximum(t, 1e-12)),
                  t / (3.0 * d * d) + 4.0 / 29.0)
    l = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return jnp.stack([l, a, b], -1)


def _hunt(lab):
    h = 0.01 * lab[..., 0:1]
    return jnp.concatenate([lab[..., 0:1], h * lab[..., 1:]], -1)


def _hyab(a, b):
    d = a - b
    return jnp.abs(d[..., 0]) + jnp.sqrt(d[..., 1] ** 2 + d[..., 2] ** 2
                                         + 1e-20)


def _flip_kernels(ppd: float):
    """Static kernels for a pixels-per-degree value (numpy)."""
    radius = int(_np.ceil(3.0 * _np.sqrt(0.04 / (2.0 * _np.pi ** 2)) * ppd))
    xs = _np.arange(-radius, radius + 1, dtype=_np.float64)
    gx, gy = _np.meshgrid(xs, xs, indexing="xy")

    # CSF filters: weight = sum of Gaussians in spatial distance
    def csf(ab):
        a1, a2, b1, b2 = ab
        d2 = -((gx / ppd) ** 2 + (gy / ppd) ** 2) * _np.pi ** 2
        w = (a1 * _np.sqrt(_np.pi / b1) * _np.exp(d2 / b1)
             + a2 * _np.sqrt(_np.pi / b2) * _np.exp(d2 / b2))
        return w / w.sum()

    k_a = csf((1.0, 0.0, 0.0047, 1e-5))
    k_rg = csf((1.0, 0.0, 0.0053, 1e-5))
    k_by = csf((34.1, 13.5, 0.04, 0.025))

    # feature detectors (FLIPPass.cs.slang:156-231)
    sig = 0.5 * _W * ppd
    g = _np.exp(-(gx ** 2 + gy ** 2) / (2.0 * sig * sig))
    point_x = (gx ** 2 / (sig * sig) - 1.0) * g
    point_y = (gy ** 2 / (sig * sig) - 1.0) * g
    pos_sum = point_x[point_x >= 0].sum()
    neg_sum = -point_x[point_x < 0].sum()
    point_x = _np.where(point_x >= 0, point_x / pos_sum, point_x / neg_sum)
    point_y = _np.where(point_y >= 0, point_y / pos_sum, point_y / neg_sum)
    edge_x = -gx * g
    edge_y = -gy * g
    e_sum = edge_x[edge_x >= 0].sum()
    edge_x, edge_y = edge_x / e_sum, edge_y / e_sum
    return [k.astype(_np.float32)
            for k in (k_a, k_rg, k_by, point_x, point_y, edge_x, edge_y)]


def _conv2d_same(img, kernel):
    """[H,W] (x) [kh,kw] with edge-clamp padding (the shader clamps
    neighborhood reads to the image, FLIPPass.cs.slang:172-176)."""
    import jax
    r = kernel.shape[0] // 2
    p = jnp.pad(img, ((r, r), (r, r)), mode="edge")
    out = jax.lax.conv_general_dilated(
        p[None, None], jnp.asarray(kernel)[None, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out[0, 0]


def flip_error(a, b, monitor_width_pixels=3840, monitor_width_meters=0.7,
               monitor_distance=0.7):
    """Per-pixel LDR-FLIP error map (the published metric; reference
    FLIPPass.cs.slang LDRFLIP). Inputs: linear RGB [H,W,3] (or [H,W],
    broadcast to gray) in [0,1]."""
    a3 = a if a.ndim == 3 else a[..., None].repeat(3, -1)
    b3 = b if b.ndim == 3 else b[..., None].repeat(3, -1)
    a3 = jnp.clip(a3[..., :3], 0.0, 1.0)
    b3 = jnp.clip(b3[..., :3], 0.0, 1.0)
    ppd = monitor_distance * (monitor_width_pixels / monitor_width_meters) \
        * (_np.pi / 180.0)
    k_a, k_rg, k_by, p_x, p_y, e_x, e_y = _flip_kernels(ppd)

    ref_y = _rgb_to_ycxcz(b3)
    tst_y = _rgb_to_ycxcz(a3)

    # ---- color pipeline: CSF filter per opponent channel ----
    def csf_filter(img):
        return jnp.stack([_conv2d_same(img[..., 0], k_a),
                          _conv2d_same(img[..., 1], k_rg),
                          _conv2d_same(img[..., 2], k_by)], -1)

    ref_f = jnp.clip(_ycxcz_to_rgb(csf_filter(ref_y)), 0.0, 1.0)
    tst_f = jnp.clip(_ycxcz_to_rgb(csf_filter(tst_y)), 0.0, 1.0)
    color_diff = _hyab(_hunt(_rgb_to_cielab(ref_f)),
                       _hunt(_rgb_to_cielab(tst_f)))

    # ---- feature pipeline on normalized luminance ----
    def grads(img_y):
        lum = (img_y + 16.0) / 116.0
        pg = jnp.sqrt(_conv2d_same(lum, p_x) ** 2
                      + _conv2d_same(lum, p_y) ** 2 + 1e-20)
        eg = jnp.sqrt(_conv2d_same(lum, e_x) ** 2
                      + _conv2d_same(lum, e_y) ** 2 + 1e-20)
        return pg, eg

    ref_pg, ref_eg = grads(ref_y[..., 0])
    tst_pg, tst_eg = grads(tst_y[..., 0])
    feature_diff = jnp.maximum(jnp.abs(ref_pg - tst_pg),
                               jnp.abs(ref_eg - tst_eg)) * (0.5 ** 0.5)
    feature_diff = feature_diff ** _QF

    # ---- error redistribution (FLIPPass.cs.slang:115-133) ----
    green = _hunt(_rgb_to_cielab(jnp.asarray([[0.0, 1.0, 0.0]])))
    blue = _hunt(_rgb_to_cielab(jnp.asarray([[0.0, 0.0, 1.0]])))
    max_dist = _hyab(green, blue)[0] ** _QC
    err = color_diff ** _QC
    cutoff = _PC * max_dist
    err = jnp.where(err < cutoff, err * (_PT / cutoff),
                    _PT + (err - cutoff) / (max_dist - cutoff) * (1.0 - _PT))
    return jnp.clip(err, 0.0, 1.0) ** (1.0 - feature_diff)


def compare(a, b, metric="mse"):
    fns = {"mse": mse, "rmse": rmse, "mae": mae, "mape": mape, "ssim": ssim,
           "flip": lambda x, y: jnp.mean(flip_error(x, y))}
    return float(fns[metric](jnp.asarray(a, jnp.float32),
                             jnp.asarray(b, jnp.float32)))
