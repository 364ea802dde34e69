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


def flip_error(a, b):
    """Lightweight FLIP-style perceptual error: color difference after a
    contrast-sensitivity blur + feature (edge) difference. A simplified
    stand-in for the reference's full FLIP (FLIPPass.h:37)."""
    a3 = a if a.ndim == 3 else a[..., None].repeat(3, -1)
    b3 = b if b.ndim == 3 else b[..., None].repeat(3, -1)
    a_f = _blur(a3[..., :3].mean(-1), radius=2, sigma=1.0)
    b_f = _blur(b3[..., :3].mean(-1), radius=2, sigma=1.0)
    color_diff = jnp.sqrt(jnp.sum((a3[..., :3] - b3[..., :3]) ** 2, -1) / 3.0)

    def edges(x):
        from ..ops.ao import shift_axis_clamped
        gx = shift_axis_clamped(x, 1, 1) - shift_axis_clamped(x, 1, -1)
        gy = shift_axis_clamped(x, 0, 1) - shift_axis_clamped(x, 0, -1)
        return jnp.sqrt(gx * gx + gy * gy)

    feat_diff = jnp.abs(edges(a_f) - edges(b_f))
    err = 1.0 - (1.0 - jnp.clip(color_diff, 0, 1)) * (1.0 - jnp.clip(feat_diff, 0, 1))
    return err


def compare(a, b, metric="mse"):
    fns = {"mse": mse, "rmse": rmse, "mae": mae, "mape": mape, "ssim": ssim,
           "flip": lambda x, y: jnp.mean(flip_error(x, y))}
    return float(fns[metric](jnp.asarray(a, jnp.float32),
                             jnp.asarray(b, jnp.float32)))
