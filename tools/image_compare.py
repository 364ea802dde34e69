"""ImageCompare CLI — the reference's standalone comparison tool
(/root/reference/Source/Tools/ImageCompare/ImageCompare.cpp:257-439):
compare two images under a chosen metric, print the error to stdout,
exit 0 iff error <= threshold, optionally write a viridis heat map.

Usage:
    python tools/image_compare.py A.(png|exr|npy) B.(png|exr|npy)
        [-m mse|rmse|mae|mape|flip] [-t threshold] [-a] [-H heatmap.png]

Differences from the reference, by design: .npy inputs are accepted (the
golden tier stores raw float arrays); SSIM is offered as an extra metric.
"""
import argparse
import math
import sys

import numpy as np


def load_image(path):
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    from rtsdm_tpu.utils.image_io import load_image as _li
    return np.asarray(_li(path), np.float32)


_VIRIDIS = np.asarray([
    [0.267, 0.005, 0.329], [0.283, 0.141, 0.458], [0.254, 0.265, 0.530],
    [0.207, 0.372, 0.553], [0.164, 0.471, 0.558], [0.128, 0.567, 0.551],
    [0.135, 0.659, 0.518], [0.267, 0.749, 0.441], [0.478, 0.821, 0.318],
    [0.741, 0.873, 0.150], [0.993, 0.906, 0.144]], np.float32)


def heat_map(err):
    lo, hi = float(err.min()), float(err.max())
    t = np.clip((err - lo) / max(hi - lo, 1e-5), 0.0, 1.0)
    x = t * (len(_VIRIDIS) - 1)
    i = np.clip(x.astype(np.int32), 0, len(_VIRIDIS) - 2)
    f = (x - i)[..., None]
    return _VIRIDIS[i] * (1 - f) + _VIRIDIS[i + 1] * f


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("image1")
    ap.add_argument("image2")
    ap.add_argument("-m", "--metric", default="mse",
                    choices=["mse", "rmse", "mae", "mape", "flip", "ssim"])
    ap.add_argument("-t", "--threshold", type=float, default=0.0)
    ap.add_argument("-a", "--alpha", action="store_true",
                    help="include the alpha channel in the comparison")
    ap.add_argument("-H", "--heat-map", default=None,
                    help="write a false-color error map (png)")
    a = ap.parse_args(argv)

    try:
        ia, ib = load_image(a.image1), load_image(a.image2)
    except Exception as e:
        print(f"Cannot load image ({e}).", file=sys.stderr)
        return 1
    if ia.shape[:2] != ib.shape[:2]:
        print("Cannot compare images with different resolutions.",
              file=sys.stderr)
        return 1
    nc = 4 if (a.alpha and ia.ndim == 3 and ia.shape[-1] >= 4) else 3
    if ia.ndim == 2:
        ia, ib = ia[..., None], ib[..., None]
    ia, ib = ia[..., :nc], ib[..., :nc]
    if ia.shape[-1] != ib.shape[-1]:
        c = min(ia.shape[-1], ib.shape[-1])
        ia, ib = ia[..., :c], ib[..., :c]

    # host tool: run the metric math on CPU (the axon TPU backend costs a
    # ~30 ms tunnel round-trip per op and needn't be up for comparisons)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from rtsdm_tpu.utils import compare as C

    ja, jb = jnp.asarray(ia), jnp.asarray(ib)
    err_map = None
    if a.metric == "mse":
        err_map = ((ia - ib) ** 2).mean(-1)
        error = float(err_map.mean())
    elif a.metric == "rmse":
        err_map = ((ia - ib) ** 2).mean(-1)
        error = math.sqrt(float(err_map.mean()))
    elif a.metric == "mae":
        err_map = np.abs(ia - ib).mean(-1)
        error = float(err_map.mean())
    elif a.metric == "mape":
        err_map = (np.abs(ia - ib) / (np.abs(ib) + 1e-2)).mean(-1) * 100.0
        error = float(err_map.mean())
    elif a.metric == "flip":
        if ja.ndim == 3 and ja.shape[-1] >= 3:
            err_map = np.asarray(C.flip_error(ja[..., :3], jb[..., :3]))
        else:
            g = jnp.concatenate([ja] * 3, -1)
            h = jnp.concatenate([jb] * 3, -1)
            err_map = np.asarray(C.flip_error(g, h))
        error = float(err_map.mean())
    else:  # ssim (extra; reported as 1 - ssim so <= threshold still means ok)
        error = 1.0 - float(C.ssim(ja.mean(-1), jb.mean(-1)))

    if a.heat_map and err_map is not None:
        from rtsdm_tpu.utils.image_io import save_image
        save_image(a.heat_map, heat_map(err_map))

    print(error)
    if math.isnan(error) or math.isinf(error):
        return 1
    return 0 if error <= a.threshold else 1


if __name__ == "__main__":
    sys.exit(main())
