"""Render-graph runtime + HBAO config-1 pipeline tests (small sizes, CPU)."""
import numpy as np
import pytest

from rtsdm_tpu.mogwai import Renderer, run_script
from rtsdm_tpu.rendergraph.graph import RenderGraph
from rtsdm_tpu.rendergraph.render_pass import (PassReflection, RenderPass,
                                               RenderContext, register_pass)


@register_pass("_TestProducer")
class _Producer(RenderPass):
    def execute(self, ctx, inputs, state=None):
        import jax.numpy as jnp
        return {"out": jnp.ones((4, 4))}, None


@register_pass("_TestDoubler")
class _Doubler(RenderPass):
    def execute(self, ctx, inputs, state=None):
        return {"out": inputs["in"] * 2}, None


def test_topo_order_and_execution():
    g = RenderGraph("t")
    g.create_pass("B", "_TestDoubler")
    g.create_pass("A", "_TestProducer")
    g.add_edge("A.out", "B.in")
    g.mark_output("B.out")
    marked, _, _ = g.execute(RenderContext(width=4, height=4))
    assert float(marked["B.out"][0, 0]) == 2.0


def test_cycle_detection():
    g = RenderGraph("c")
    g.create_pass("A", "_TestDoubler")
    g.create_pass("B", "_TestDoubler")
    g.add_edge("A.out", "B.in")
    g.add_edge("B.out", "A.in")
    with pytest.raises(RuntimeError, match="cycle"):
        g.execute(RenderContext(width=4, height=4))


def test_hbao_graph_end_to_end():
    """BASELINE config 1 shape: HBAO graph, Cornell box (small res on CPU)."""
    # eager (per-op jit): whole-graph XLA compile is minutes on the 1-core CPU
    # test runner; the TPU path exercises use_jit=True via bench.py
    m = Renderer(width=96, height=96, use_jit=False)
    run_script("scripts/HBAO.py", m)
    # shrink guard band + raster tile lists for the tiny test resolution
    m.active_graph.get_pass("GuardBand").cfg["guardBand"] = 8
    for pname in ("GBufferRaster", "DepthPeeling", "ForwardLighting"):
        m.active_graph.get_pass(pname).cfg["maxPerTile"] = 64
    m.loadScene("CornellBox")
    m.clock.pause()
    out = m.renderFrame()
    amb = np.asarray(out["Ambient.out"])
    dif = np.asarray(out["Diffuse.out"])
    assert amb.shape == (96, 96, 4) and dif.shape == (96, 96, 4)
    assert np.isfinite(amb).all() and np.isfinite(dif).all()
    # AO must darken corners/contact regions but keep open areas bright
    assert amb[..., 0].min() < 0.85, "no occlusion found"
    assert amb[..., 0].max() > 0.97, "everything occluded"
    assert 0.5 < amb[..., 0].mean() <= 1.0
    # second frame reuses the compiled fn and state
    out2 = m.renderFrame()
    assert np.allclose(np.asarray(out2["Ambient.out"]), amb)
