"""Unit tests for utils/math.py, utils/sampling.py, core/clock.py,
core/profiler.py — the Utils.Math / Utils.Sampling / Utils.Timing rows of
the component inventory (reference Source/Tools/FalcorTest has dedicated
unit-test files per util family, e.g. Tests/Utils/MathHelpersTests.cpp)."""
import numpy as np
import pytest

import jax.numpy as jnp

from rtsdm_tpu.core.clock import Clock
from rtsdm_tpu.core.profiler import Profiler
from rtsdm_tpu.utils import math as um
from rtsdm_tpu.utils import sampling as us


# --- matrices --------------------------------------------------------------

def test_look_at_perspective_roundtrip():
    view = um.look_at(jnp.asarray([0.0, 0.0, 3.0]),
                      jnp.asarray([0.0, 0.0, 0.0]),
                      jnp.asarray([0.0, 1.0, 0.0]))
    # eye maps to the view-space origin (homogeneous [0,0,0,1])
    e = um.transform_point(view, jnp.asarray([0.0, 0.0, 3.0]))
    np.testing.assert_allclose(np.asarray(e), [0, 0, 0, 1], atol=1e-6)
    proj = um.perspective(jnp.pi / 2, 1.0, 0.1, 100.0)
    p = jnp.asarray([0.3, -0.2, 0.5])
    clip = um.transform_point(proj @ view, p)
    back_h = um.transform_point(um.inverse(proj @ view), clip[:3] / clip[3])
    np.testing.assert_allclose(np.asarray(back_h[:3] / back_h[3]),
                               np.asarray(p), atol=1e-4)


def test_inverse_matches_numpy():
    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32)
                    + 4 * np.eye(4, dtype=np.float32))
    np.testing.assert_allclose(np.asarray(um.inverse(m)),
                               np.linalg.inv(np.asarray(m)),
                               rtol=2e-4, atol=2e-5)


# --- octahedral normal packing (decodeNormal2x8, SVAO/Common.slang:98) -----

@pytest.mark.parametrize("bits", [8, 16])
def test_normal_pack_roundtrip(bits):
    rng = np.random.default_rng(1)
    n = rng.normal(size=(256, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.asarray(n)
    enc = um.encode_normal_2x8 if bits == 8 else um.encode_normal_2x16
    dec = um.decode_normal_2x8 if bits == 8 else um.decode_normal_2x16
    back = np.asarray(dec(enc(n)))
    dots = np.sum(back * np.asarray(n), -1)
    # 8-bit octa worst-case ~1 deg, 16-bit far tighter
    assert dots.min() > (0.9995 if bits == 8 else 0.999999)


def test_oct_mapping_covers_sphere_poles():
    for v in ([0, 0, 1], [0, 0, -1], [1, 0, 0], [0, -1, 0]):
        n = jnp.asarray([v], jnp.float32)
        back = um.oct_snorm_to_ndir(um.ndir_to_oct_snorm(n))
        np.testing.assert_allclose(np.asarray(back)[0], v, atol=1e-6)


# --- color spaces ----------------------------------------------------------

def test_ycgco_roundtrip_and_luma():
    rng = np.random.default_rng(2)
    c = jnp.asarray(rng.random((64, 3)).astype(np.float32))
    back = um.ycgco_to_rgb(um.rgb_to_ycgco(c))
    np.testing.assert_allclose(np.asarray(back), np.asarray(c), atol=1e-6)
    np.testing.assert_allclose(
        float(um.luminance(jnp.asarray([1.0, 1.0, 1.0]))), 1.0, atol=1e-5)


# --- sample generators ------------------------------------------------------

def test_van_der_corput_low_discrepancy():
    seq = np.asarray([us.van_der_corput(i) for i in range(1, 129)])
    assert ((seq > 0) & (seq < 1)).all()
    # radical inverse: first 4 values of base 2
    np.testing.assert_allclose(seq[:4], [0.5, 0.25, 0.75, 0.125])
    # stratification: every 1/8 bucket hit equally at n=128
    hist, _ = np.histogram(seq, bins=8, range=(0, 1))
    assert hist.min() == hist.max() == 16


@pytest.mark.parametrize("nd,kernel", [(8, us.AO_KERNEL_VAO),
                                       (16, us.AO_KERNEL_VAO),
                                       (32, us.AO_KERNEL_VAO),
                                       (8, us.AO_KERNEL_HBAO)])
def test_sample_radius_table(nd, kernel):
    """Radii regenerated from the generator math (GenPoints.py:22-27):
    in (0,1], sorted pattern per the reference's radical-inverse layout."""
    tab = us.sample_radius_table(nd, kernel)
    assert tab.shape == (nd,)
    assert (tab > 0).all() and (tab <= 1.0 + 1e-6).all()


def test_stratified_coverage_tables():
    indices, lookup = us.stratified_coverage_tables(4)
    # group R holds exactly the 4-bit masks with popcount R (alpha-weighted
    # binomial LUT, StochasticDepth.ps.slang:101-118)
    assert len(lookup) == 16 and indices[-1] == 16
    for r in range(5):
        group = lookup[indices[r]:indices[r + 1]]
        assert all(bin(int(m)).count("1") == r for m in group)
        import math
        assert len(group) == math.comb(4, r)


# --- clock & profiler --------------------------------------------------------

def test_clock_determinism():
    c = Clock(framerate=30)
    assert c.time == 0.0 and c.frame == 0
    c.tick()
    assert c.frame == 1 and abs(c.time - 1 / 30) < 1e-9
    c.pause()
    f = c.frame
    c.tick()
    assert c.frame == f  # paused clock doesn't advance
    c.play()
    c.frame = 90
    assert abs(c.time - 3.0) < 1e-9  # frame assignment re-derives time


def test_profiler_event_tree():
    p = Profiler(enabled=True)
    with p.event("frame"):
        with p.event("svao"):
            pass
        with p.event("blur"):
            pass
    flat = p.flat_averages()
    assert "frame" in flat and "frame/svao" in flat and "frame/blur" in flat
    assert all(v >= 0 for v in flat.values())
    # disabled profiler is zero-overhead and records nothing
    p2 = Profiler(enabled=False)
    with p2.event("x"):
        pass
    assert p2.flat_averages() == {}


def test_jitter_grid_matches_random_jitter():
    """jitter_grid (tiled 4x4 table) is bit-exact vs the per-texel gather
    formulation, including a traced row offset."""
    import jax
    h, w = 13, 22
    pxg, pyg = np.meshgrid(np.arange(w), np.arange(h))
    ref = np.asarray(us.random_jitter(jnp.asarray(pxg), jnp.asarray(pyg)))
    np.testing.assert_array_equal(np.asarray(us.jitter_grid(h, w)), ref)
    # offset grid, static y0
    ref2 = np.asarray(us.random_jitter(jnp.asarray(pxg + 2),
                                       jnp.asarray(pyg + 7)))
    np.testing.assert_array_equal(
        np.asarray(us.jitter_grid(h, w, x0=2, y0=7)), ref2)
    # traced y0 (the sharded band path)
    got = jax.jit(lambda y0: us.jitter_grid(h, w, x0=2, y0=y0))(jnp.int32(7))
    np.testing.assert_array_equal(np.asarray(got), ref2)
    # disabled -> centered
    assert float(us.jitter_grid(3, 3, enabled=False).std()) == 0.0


def test_algorithm_primitives():
    """Utils.Algorithm analogues (ops/algorithm.py): reduction / exclusive
    prefix sum / bitonic key-payload sort / segment sum semantics match the
    reference primitives (ParallelReduction.h:46, PrefixSum.h:44,
    BitonicSort.h:41)."""
    from rtsdm_tpu.ops import algorithm as alg
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.integers(0, 100, (4, 16)).astype(np.float32))
    lo, hi = alg.parallel_reduction(x, "minmax", axis=1)
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(x).min(1))
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(x).max(1))
    # exclusive scan: out[0]=0, out[i]=sum(x[:i])
    ps = np.asarray(alg.prefix_sum(x, axis=1))
    ref = np.cumsum(np.asarray(x), 1) - np.asarray(x)
    np.testing.assert_allclose(ps, ref)
    keys = jnp.asarray(rng.integers(0, 1000, (64,)).astype(np.int32))
    vals = jnp.arange(64, dtype=jnp.int32)
    k, v = alg.bitonic_sort(keys, vals, descending=True)
    order = np.argsort(-np.asarray(keys), kind="stable")
    np.testing.assert_array_equal(np.asarray(k), np.asarray(keys)[order])
    assert (np.asarray(keys)[np.asarray(v)] == np.asarray(k)).all()
    seg = alg.segment_sum(jnp.ones((8,)), jnp.asarray([0, 0, 1, 3, 3, 3, 1, 0]),
                          num_segments=4)
    np.testing.assert_array_equal(np.asarray(seg), [3, 2, 0, 3])


def test_sample_pattern_offsets():
    """Camera sample patterns (reference Utils/SampleGenerators): DX8 table
    values, Halton = radical inverse - 0.5, stratified covers all bins, and
    the pattern actually jitters the G-buffer raster per frame."""
    dx = us.sample_pattern_offsets("DirectX", 8)
    assert dx.shape == (8, 2)
    np.testing.assert_allclose(dx[0], [1 / 16, -3 / 16])
    hal = us.sample_pattern_offsets("Halton", 16)
    np.testing.assert_allclose(hal[0], [0.0, 1 / 3 - 0.5], atol=1e-6)
    assert (np.abs(hal) <= 0.5).all()
    st = us.sample_pattern_offsets("Stratified", 16)
    assert st.shape == (16, 2) and (np.abs(st) <= 0.5).all()
    assert us.sample_pattern_offsets("Center", 4).shape == (1, 2)
    with pytest.raises(ValueError):
        us.sample_pattern_offsets("Nope", 4)


def test_pattern_jitter_moves_gbuffer():
    """samplePattern != Center shifts the rasterized depth sub-pixel per
    frame (the previously-dead config now drives camera jitter)."""
    from rtsdm_tpu.passes.gbuffer import GBufferRaster
    from rtsdm_tpu.rendergraph.render_pass import RenderContext
    from rtsdm_tpu.scene.procedural import cornell_box
    scene = cornell_box()
    outs = {}
    for fi in (0, 1):
        p = GBufferRaster(dict(samplePattern="Halton", sampleCount=8))
        ctx = RenderContext(width=48, height=48, scene=scene, frame_index=fi)
        outs[fi], _ = p.execute(ctx, {})
    assert not np.allclose(np.asarray(outs[0]["depth"]),
                           np.asarray(outs[1]["depth"]))
    # Center is frame-invariant
    p = GBufferRaster({})
    a = p.execute(RenderContext(width=48, height=48, scene=scene,
                                frame_index=0), {})[0]
    b = p.execute(RenderContext(width=48, height=48, scene=scene,
                                frame_index=1), {})[0]
    np.testing.assert_array_equal(np.asarray(a["depth"]),
                                  np.asarray(b["depth"]))


def test_zmipmaps_thresholded_harmonic_mean():
    """ZMipmaps downsample semantics (Mip.ps.slang:13-38): far-plane texels
    drop out, threshold rejects foreground relative to the quad max, output
    is the perspective-correct harmonic mean."""
    from rtsdm_tpu.passes.pipeline_misc import ZMipmaps
    from rtsdm_tpu.rendergraph.render_pass import RenderContext
    from rtsdm_tpu.scene.procedural import cornell_box
    scene = cornell_box()
    far = float(scene.camera.far_z)
    z = np.full((4, 4), far, np.float32)
    z[0, 0] = 10.0
    z[0, 1] = 9.5      # within threshold*ref of 10 -> averaged
    z[1, 0] = 1.0      # below threshold*10 -> rejected
    p = ZMipmaps(dict(mipLevels=2, threshold=0.9, adaptiveThreshold=False))
    ctx = RenderContext(width=4, height=4, scene=scene)
    out, _ = p.execute(ctx, {"linearZ": jnp.asarray(z)})
    np.testing.assert_array_equal(np.asarray(out["linearZMip"]), z)
    m0 = np.asarray(out["mips"][0])
    assert m0.shape == (2, 2)
    np.testing.assert_allclose(m0[0, 0], 2.0 / (1 / 10.0 + 1 / 9.5),
                               rtol=1e-6)
    assert m0[1, 1] == far                       # all-far quad stays far


def test_pytorch_tensor_bridge():
    """TestPyTorchPass (reference TestPasses/TestPyTorchPass.cpp:88-186):
    tensors round-trip between the JAX compute path and torch via DLpack,
    pattern data[k][j][i] = linear index + offset."""
    import torch
    from rtsdm_tpu.passes.test_passes import TestPyTorchPass
    p = TestPyTorchPass({})
    dim, offset = (3, 4, 5), 7
    t = p.generateData(dim, offset)
    assert isinstance(t, torch.Tensor) and tuple(t.shape) == dim
    assert float(t[1, 2, 3]) == (1 * 4 + 2) * 5 + 3 + 7
    # torch -> verify (exact round trip)
    assert p.verifyData(dim, offset, t)
    # wrong offset / mutated data fail verification
    assert not p.verifyData(dim, offset + 1, t)
    t2 = t.clone()
    t2[0, 0, 0] += 1.0
    assert not p.verifyData(dim, offset, t2)
    # torch-built tensor verifies too (reference testTensorToFalcor)
    data = torch.zeros(dim, dtype=torch.float32)
    for k in range(dim[0]):
        for j in range(dim[1]):
            for i in range(dim[2]):
                data[k][j][i] = (k * dim[1] + j) * dim[2] + i + 9
    assert p.verifyData(dim, 9, data)
