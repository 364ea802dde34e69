"""Executes bench_configs.run_config itself at toy scale on CPU.

The round-2 postmortem: BENCH_CONFIGS.json shipped red because the
benchmark *harness* (not the graphs) had drifted against mogwai internals
(`'Renderer' object has no attribute '_scene_comp'`). tests/test_config_traces
only traces the graphs; this file runs the actual harness code — the
lax.scan steady-state loop, state donation, camera-path stacking — so any
renamed Renderer internal fails here on CPU before a TPU run is attempted.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench_configs import run_config  # noqa: E402


def test_run_config_static_smoke():
    r = run_config(dict(name="smoke_static", script="scripts/HBAO.py",
                        scene="CornellBox", width=64, height=64,
                        outputs=["Ambient.out"]), frames=2)
    assert "error" not in r, r
    assert r["frame_ms"] > 0 and r["triangles"] == 36
    assert len(r["frame_ms_runs"]) == 3


def test_run_config_animated_smoke():
    """Config-5 shape: camera path + geometry animation through the scan."""
    r = run_config(dict(name="smoke_anim", script="scripts/SVAO_small.py",
                        scene="CornellBox", width=64, height=64, animate=True,
                        outputs=["ShadedTAA.colorOut"]), frames=2)
    assert "error" not in r, r
    assert r["frame_ms"] > 0
