"""DebugPasses comparison tooling (reference ComparisonPass.h:36,
SplitScreenPass, SideBySidePass, ColorMapPass.ps.slang)."""
import jax.numpy as jnp
import numpy as np

from rtsdm_tpu.rendergraph.render_pass import RenderContext, create_pass


def _ctx(w=32, h=16):
    return RenderContext(width=w, height=h)


def test_split_screen_left_right_and_divider():
    left = jnp.zeros((16, 32, 3))
    right = jnp.ones((16, 32, 3))
    p = create_pass("SplitScreenPass", dict(splitLocation=0.5, dividerSize=1))
    out, _ = p.execute(_ctx(), {"leftInput": left, "rightInput": right})
    o = np.asarray(out["output"])
    assert np.all(o[:, :14] == 0.0)      # left side shows left image
    assert np.all(o[:, 18:] == 1.0)      # right side shows right image
    # divider: 2*dividerSize+1 px band is neither pure 0 nor pure 1
    band = o[:, 15:17]
    assert not np.all(band == 0.0) and not np.all(band == 1.0)


def test_split_screen_swap_sides():
    left = jnp.zeros((16, 32, 3))
    right = jnp.ones((16, 32, 3))
    p = create_pass("SplitScreenPass", dict(splitLocation=0.5, dividerSize=0,
                                            swapSides=True))
    out, _ = p.execute(_ctx(), {"leftInput": left, "rightInput": right})
    o = np.asarray(out["output"])
    assert np.all(o[:, :14] == 1.0)


def test_side_by_side_same_window():
    # ramp image: both halves must show the SAME region of their source
    ramp = jnp.broadcast_to(jnp.arange(32.0)[None, :, None], (16, 32, 3))
    p = create_pass("SideBySidePass", dict(splitLocation=0.0))
    out, _ = p.execute(_ctx(), {"leftInput": ramp, "rightInput": ramp * 2})
    o = np.asarray(out["output"])
    assert o.shape == (16, 32, 3)
    np.testing.assert_allclose(o[:, 16:] / 2.0, o[:, :16])


def test_color_map_grey_and_range():
    img = jnp.linspace(0, 2, 64).reshape(8, 8)
    p = create_pass("ColorMapPass", dict(colorMap="Grey", autoRange=False,
                                         minValue=0.0, maxValue=2.0))
    out, _ = p.execute(_ctx(), {"input": img})
    o = np.asarray(out["output"])
    np.testing.assert_allclose(o[..., 0], np.asarray(img) / 2.0, atol=1e-6)


def test_color_map_polynomials_endpoints():
    # Viridis family: endpoints should land near the known colors
    from rtsdm_tpu.passes.comparison import apply_color_map
    t = jnp.asarray([0.0, 1.0])
    vir = np.asarray(apply_color_map(t, "Viridis"))
    assert np.allclose(vir[0], [0.267, 0.005, 0.329], atol=0.05)  # dark purple
    assert vir[1, 0] > 0.8 and vir[1, 1] > 0.8 and vir[1, 2] < 0.3  # yellow
    for name in ("Jet", "Plasma", "Magma", "Inferno"):
        o = np.asarray(apply_color_map(jnp.linspace(0, 1, 16), name))
        assert o.shape == (16, 3) and o.min() >= 0.0 and o.max() <= 1.0
