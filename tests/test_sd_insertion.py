"""SD insertion-algorithm matrix (VERDICT r2 item 5): coverage-mask
stratified insertion, kbuffer, and the MAX_COUNT traversal cap must be real
in the XLA tier (the oracle for the Pallas kernels; tools/pallas_parity.py
checks the kernels against this tier on TPU).

Reference: StochasticDepthMapRT/Common.slangh:102-254 (algorithm()),
StochasticDepthMapRT.h:78-82 (defaults)."""
import jax.numpy as jnp
import numpy as np
import pytest

from rtsdm_tpu.ops import rt
from rtsdm_tpu.scene.camera import Camera
from rtsdm_tpu.scene.scene import make_scene

N_LAYERS = 8
NEAR, FAR = 0.1, 20.0


@pytest.fixture(scope="module")
def slabs():
    """Every ray from the origin crosses N_LAYERS parallel slabs, triangle
    index == depth order (morton_sort=False keeps the canonical/traversal
    order equal to the layer order)."""
    tris = []
    for i in range(N_LAYERS):
        z = -1.0 - i * 0.5
        tris.append([[-50.0, -50.0, z], [50.0, -50.0, z], [0.0, 75.0, z]])
    cam = Camera.create(position=(0, 0, 2), target=(0, 0, -1),
                        near_z=NEAR, far_z=FAR)
    scene = make_scene("slabs", np.asarray(tris, np.float32), camera=cam,
                       morton_sort=False)
    n_rays = 512
    rng = np.random.default_rng(11)
    dirs = np.zeros((n_rays, 3), np.float32)
    dirs[:, 0] = rng.uniform(-0.25, 0.25, n_rays)
    dirs[:, 1] = rng.uniform(-0.25, 0.25, n_rays)
    dirs[:, 2] = -1.0
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 2.0]), (n_rays, 3))
    return scene, origins, jnp.asarray(dirs), dirs


def _layer_depths(dirs_np):
    """Normalized view depth of each slab layer per ray [R, N_LAYERS]."""
    cosw = np.abs(dirs_np[:, 2])
    t_hit = (2.0 - (-1.0 - np.arange(N_LAYERS) * 0.5)) / cosw[:, None]
    return (t_hit * cosw[:, None] - NEAR) / (FAR - NEAR)


def _trace(scene, origins, dirs, **kw):
    n = origins.shape[0]
    return np.asarray(rt.sd_trace(
        scene, origins, dirs, jnp.zeros(n), jnp.full((n,), 19.0),
        cull=rt.CULL_NONE, **kw))


def test_coverage_alpha_one_fills_every_slot_with_nearest(slabs):
    """alpha=1 => R=k for every hit => every slot z-tests every hit => all
    slots hold the nearest depth (deterministic endpoint of the coverage
    algorithm, Common.slangh:117-131 with full masks)."""
    scene, origins, dirs, dirs_np = slabs
    d = _trace(scene, origins, dirs, num_samples=4,
               implementation="coverage", alpha=1.0)
    z = _layer_depths(dirs_np)
    assert np.allclose(d, z[:, :1], atol=2e-4), "slots != nearest layer"


def test_coverage_alpha_zero_is_empty(slabs):
    """alpha=0 => R=floor(rng)<1 => mask 0 for every hit => SD map empty."""
    scene, origins, dirs, _ = slabs
    d = _trace(scene, origins, dirs, num_samples=4,
               implementation="coverage", alpha=0.0)
    assert (d == 1.0).all()


def test_coverage_slot_fill_rate_tracks_alpha(slabs):
    """With alpha=0.5 and 8 layers, a slot stays empty only if none of the 8
    hits covered it: P(empty) ~ (1 - 0.5)^8 < 0.4%. Also every written slot
    must equal SOME layer depth (no invented depths), and slot fill must be
    stratified: per-hit covered-slot count R in {floor(.5k+rng)} = {2,3}."""
    scene, origins, dirs, dirs_np = slabs
    k = 4
    d = _trace(scene, origins, dirs, num_samples=k,
               implementation="coverage", alpha=0.5)
    z = _layer_depths(dirs_np)
    filled = d < 1.0
    assert filled.mean() > 0.99
    err = np.abs(z[:, None, :] - d[:, :, None]).min(-1)
    assert (err[filled] < 2e-4).all(), "written slot depth matches no layer"
    # nearest-covering-hit: slots can't all be the farthest layer
    assert (np.abs(d - z[:, :1]) < 2e-4).any(axis=1).mean() > 0.7


def test_max_count_caps_at_first_hits_in_canonical_order(slabs):
    """max_count=2: only the first two layers (canonical order == triangle
    order == depth order here) may appear in the reservoir
    (MAX_COUNT, Common.slangh:143)."""
    scene, origins, dirs, dirs_np = slabs
    d = _trace(scene, origins, dirs, num_samples=4, max_count=2)
    z = _layer_depths(dirs_np)
    filled = d < 1.0
    assert filled.sum(1).max() <= 2
    err = np.abs(z[:, None, :2] - d[:, :, None]).min(-1)
    assert (err[filled] < 2e-4).all(), "capped reservoir holds a layer > 2"
    # both of the first two layers present (k=4 >= cap=2 keeps all)
    assert (filled.sum(1) == 2).all()


def test_max_count_kbuffer(slabs):
    """kbuffer + max_count=3 => the 3 nearest of the first 3 canonical hits
    (= layers 0..2), sorted ascending."""
    scene, origins, dirs, dirs_np = slabs
    d = _trace(scene, origins, dirs, num_samples=4,
               implementation="kbuffer", max_count=3)
    z = _layer_depths(dirs_np)
    assert np.allclose(d[:, :3], z[:, :3], atol=2e-4)
    assert (d[:, 3] == 1.0).all()


def test_max_count_none_matches_uncapped_default(slabs):
    """max_count=None must be bit-identical to the r2 uncapped behavior."""
    scene, origins, dirs, _ = slabs
    d0 = _trace(scene, origins, dirs, num_samples=4)
    d1 = _trace(scene, origins, dirs, num_samples=4, max_count=None)
    assert (d0 == d1).all()


def test_pass_routes_implementation_matrix():
    """The StochasticDepthMapRT pass must produce DIFFERENT maps for
    coverage vs default vs kbuffer (r2 verdict: 'coverage' silently fell
    through to default) and identical shapes."""
    from rtsdm_tpu.passes.stochastic_depth import StochasticDepthMapRT
    from rtsdm_tpu.rendergraph.render_pass import RenderContext
    from rtsdm_tpu.scene.procedural import cornell_box

    scene = cornell_box()
    h = w = 64
    ctx = RenderContext(width=w, height=h, scene=scene, frame_index=0,
                        time=0.0, dictionary={})
    lin = jnp.full((h, w), 0.4)
    rmin = jnp.full((h, w), 0.5)
    rmax = jnp.full((h, w), 9.0)
    outs = {}
    for impl in ("default", "coverage", "kbuffer"):
        p = StochasticDepthMapRT(dict(Implementation=impl,
                                      usePallas=False, Jitter=False))
        out, _ = p.execute(ctx, {"linearZ": lin, "rayMin": rmin,
                                 "rayMax": rmax})
        sd = np.asarray(out["stochasticDepth"])
        assert sd.shape == (h, w, 4)
        assert np.isfinite(sd).all()
        outs[impl] = sd
    assert not np.array_equal(outs["default"], outs["coverage"])
    assert not np.array_equal(outs["default"], outs["kbuffer"])
    # kbuffer is ascending
    assert (np.diff(outs["kbuffer"], axis=-1) >= -1e-6).all()
