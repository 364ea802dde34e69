"""Texture system + image I/O tests (scene/textures.py, utils/image_io.py).

Reference parity targets: material texture sampling
(Scene/Material/MaterialSystem.cpp), lat-long env map
(Scene/Lights/EnvMap.cpp dirToUv), EXR/PNG capture (Utils/Image/ImageIO.cpp).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from rtsdm_tpu.scene.textures import (PAGE, build_texture_pages, checkerboard,
                                      latlong_sky, sample_env, sample_pages)


def test_sample_pages_nearest_matches_numpy_oracle():
    rng = np.random.default_rng(7)
    pages = rng.random((3, PAGE, PAGE, 3)).astype(np.float32)
    uv = rng.random((17, 2)).astype(np.float32)
    pidx = rng.integers(0, 3, 17).astype(np.int32)
    out = np.asarray(sample_pages(jnp.asarray(pages), jnp.asarray(pidx),
                                  jnp.asarray(uv), mode="nearest"))
    tx = np.floor(uv[:, 0] * PAGE - 0.5 + 0.5).astype(np.int64) % PAGE
    ty = np.floor(uv[:, 1] * PAGE - 0.5 + 0.5).astype(np.int64) % PAGE
    ref = pages[pidx, ty, tx]
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_sample_pages_bilinear_interpolates_and_wraps():
    # constant page -> bilinear returns the constant everywhere (incl. wrap)
    pages = np.full((1, PAGE, PAGE, 3), 0.625, np.float32)
    uv = jnp.asarray([[0.0, 0.0], [0.999, 0.999], [0.5, 0.25], [-0.3, 1.7]])
    out = np.asarray(sample_pages(jnp.asarray(pages),
                                  jnp.zeros((4,), jnp.int32), uv))
    np.testing.assert_allclose(out, 0.625, atol=1e-6)
    # linear ramp in u reproduces mid-texel values exactly
    ramp = np.broadcast_to(np.linspace(0, 1, PAGE, dtype=np.float32)[None, :, None],
                           (PAGE, PAGE, 3)).copy()[None]
    u = (np.arange(4) * 8 + 0.5) / PAGE
    uv2 = jnp.asarray(np.stack([u, np.full(4, 0.5)], -1), jnp.float32)
    out2 = np.asarray(sample_pages(jnp.asarray(ramp),
                                   jnp.zeros((4,), jnp.int32), uv2))
    np.testing.assert_allclose(out2[:, 0], np.arange(4) * 8 / (PAGE - 1),
                               atol=1.0 / PAGE)


def test_sample_pages_untextured_fallback():
    pages = np.zeros((1, PAGE, PAGE, 3), np.float32)
    out = np.asarray(sample_pages(jnp.asarray(pages),
                                  jnp.full((5,), -1, jnp.int32),
                                  jnp.zeros((5, 2)), fallback=1.0))
    np.testing.assert_allclose(out, 1.0)


def test_build_texture_pages_resizes_and_normalizes():
    imgs = [np.full((128, 256, 3), 128, np.uint8),
            checkerboard(tiles=4)]
    pages = build_texture_pages(imgs)
    assert pages.shape == (2, PAGE, PAGE, 3)
    assert abs(float(pages[0].mean()) - 128 / 255.0) < 1e-3
    assert build_texture_pages([]) is None


def test_env_latlong_direction_mapping():
    env = latlong_sky(he=32, we=64)
    # +Y looks at the zenith row, -Y at the bottom row
    up = np.asarray(sample_env(jnp.asarray(env), jnp.asarray([[0.0, 1.0, 0.0]])))
    dn = np.asarray(sample_env(jnp.asarray(env), jnp.asarray([[0.0, -1.0, 0.0]])))
    assert up[0] @ np.ones(3) != pytest.approx(dn[0] @ np.ones(3))
    # zenith bluer than nadir for the analytic sky
    assert up[0, 2] > dn[0, 2]
    # phi wrap: phi=+pi and -pi sample the same column
    e = jnp.asarray(env)
    a = np.asarray(sample_env(e, jnp.asarray([[-1.0, 0.0, -1e-6]])))
    b = np.asarray(sample_env(e, jnp.asarray([[-1.0, 0.0, 1e-6]])))
    np.testing.assert_allclose(a, b, atol=1e-2)


def test_textured_scene_shading_differs():
    from rtsdm_tpu.passes.lighting import _shade
    from rtsdm_tpu.scene.procedural import load_scene
    from rtsdm_tpu.passes.gbuffer import raster_gbuffer
    scene = load_scene("Arcade", aspect=1.0)
    assert scene.tex_pages is not None and scene.env_map is not None
    g = raster_gbuffer(scene, 64, 64, max_per_tile=512)
    env = jnp.zeros((64, 64, 3))
    col_tex = _shade(scene, g, None, env, 1.0, 0.0, 0.0)
    g2 = dict(g)
    g2["texC"] = None
    col_flat = _shade(scene, g2, None, env, 1.0, 0.0, 0.0)
    # texture modulation changes shading measurably but boundedly
    d = float(jnp.abs(col_tex - col_flat).mean())
    assert 0.001 < d < 0.5


def test_scene_hit_uv_roundtrip():
    from rtsdm_tpu.scene.procedural import load_scene
    scene = load_scene("Arcade", aspect=1.0)
    tid = jnp.asarray([0, 5, 17], jnp.int32)
    tri = scene.positions[tid]
    b1 = jnp.asarray([0.2, 0.5, 0.1])
    b2 = jnp.asarray([0.3, 0.25, 0.6])
    p = (tri[:, 0] * (1 - b1 - b2)[:, None] + tri[:, 1] * b1[:, None]
         + tri[:, 2] * b2[:, None])
    uv = scene.hit_uv(tid, p)
    tc = scene.texcoords[tid]
    ref = (tc[:, 0] * (1 - b1 - b2)[:, None] + tc[:, 1] * b1[:, None]
           + tc[:, 2] * b2[:, None])
    np.testing.assert_allclose(np.asarray(uv), np.asarray(ref), atol=1e-4)


def test_scene_cache_roundtrips_textures(tmp_path):
    from rtsdm_tpu.scene import cache
    from rtsdm_tpu.scene.procedural import load_scene
    scene = load_scene("Arcade", aspect=1.0)
    p = str(tmp_path / "arcade.npz")
    cache.save(scene, p)
    back = cache.load(p)
    assert back.tex_pages is not None
    np.testing.assert_allclose(np.asarray(back.tex_pages),
                               np.asarray(scene.tex_pages), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(back.mat_tex),
                                  np.asarray(scene.mat_tex))
    np.testing.assert_allclose(np.asarray(back.env_map),
                               np.asarray(scene.env_map), atol=1e-6)


def test_exr_roundtrip(tmp_path):
    from rtsdm_tpu.utils.image_io import load_exr, save_exr
    rng = np.random.default_rng(3)
    hdr = (rng.random((13, 21, 3)).astype(np.float32) * 37.0)
    p = str(tmp_path / "t.exr")
    save_exr(p, hdr)
    back = load_exr(p)
    np.testing.assert_allclose(back, hdr, atol=1e-6)
    # half precision + single channel
    save_exr(p, hdr[..., 0], half=True)
    back1 = load_exr(p)
    np.testing.assert_allclose(back1[..., 0], hdr[..., 0], rtol=1e-3,
                               atol=1e-2)
    # 4-channel
    rgba = np.concatenate([hdr, hdr[..., :1]], -1)
    save_exr(p, rgba)
    np.testing.assert_allclose(load_exr(p), rgba, atol=1e-6)


def test_png_roundtrip_and_dispatch(tmp_path):
    from rtsdm_tpu.utils.image_io import load_image, save_image
    img = np.linspace(0, 1, 8 * 8 * 3, dtype=np.float32).reshape(8, 8, 3)
    p = str(tmp_path / "t.png")
    save_image(p, img)
    back = load_image(p)
    np.testing.assert_allclose(back, img, atol=1.0 / 255)
    pe = str(tmp_path / "t.exr")
    save_image(pe, img * 11.0)
    np.testing.assert_allclose(load_image(pe), img * 11.0, atol=1e-6)


def test_frame_capture_exr_format(tmp_path):
    from rtsdm_tpu.core.frame_capture import FrameCapture

    class _G:
        name = "G"

    class _Clock:
        frame = 0

    class _R:
        _last_outputs = {"P.out": np.full((4, 4, 3), 2.5, np.float32)}
        active_graph = _G()
        clock = _Clock()

    fc = FrameCapture()
    fc.outputDir = str(tmp_path)
    fc.format = "exr"
    fc._attach(_R())
    files = fc.capture()
    assert files and files[0].endswith(".exr")
    from rtsdm_tpu.utils.image_io import load_exr
    np.testing.assert_allclose(load_exr(files[0]), 2.5, atol=1e-6)
