"""Golden-image test runner.

Reference: tests/testing/run_image_tests.py — each test builds a graph,
renders deterministic frames via the paused Clock, captures marked outputs
(FrameCapture) and compares against reference images with an MSE tolerance
(ImageCompare; config tests/testing/core/config.py:11-14).

A test file is a python module defining:
  IMAGE_TEST = {"tolerance": 1e-4, "frames": [1], "scene": "CornellBox",
                "width": 96, "height": 96, "guard_band": 8, ...}
  SCRIPT = "scripts/HBAO.py"     (or GRAPH = callable -> RenderGraph)
  OUTPUTS = ["Ambient.out"]      (optional: subset of marked outputs)

Run: python -m rtsdm_tpu.testing.run_image_tests [--generate] [--refs DIR]
"""
from __future__ import annotations

import importlib.util
import json
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DEFAULT_TESTS = os.path.join(REPO, "tests", "image_tests")
DEFAULT_REFS = os.path.join(REPO, "tests", "image_refs")


def _load_module(path):
    spec = importlib.util.spec_from_file_location(
        os.path.basename(path)[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def discover(tests_dir=DEFAULT_TESTS):
    out = []
    for root, _, files in os.walk(tests_dir):
        for f in sorted(files):
            if f.startswith("test_") and f.endswith(".py"):
                out.append(os.path.join(root, f))
    return out


def run_test(path, refs_dir=DEFAULT_REFS, generate=False):
    """Returns dict(name, status, errors={output: mse})."""
    from ..mogwai import Renderer, run_script
    from ..utils.compare import compare

    mod = _load_module(path)
    cfg = dict(getattr(mod, "IMAGE_TEST", {}))
    name = os.path.splitext(os.path.basename(path))[0]
    tol = float(cfg.get("tolerance", 1e-4))
    frames = cfg.get("frames", [1])
    w, h = int(cfg.get("width", 96)), int(cfg.get("height", 96))

    m = Renderer(width=w, height=h, use_jit=bool(cfg.get("jit", False)))
    if hasattr(mod, "GRAPH"):
        m.addGraph(mod.GRAPH())
    else:
        run_script(os.path.join(REPO, mod.SCRIPT), m)
    if "guard_band" in cfg:
        for p in m.active_graph.passes.values():
            if p.pass_type == "GuardBand":
                p.cfg["guardBand"] = int(cfg["guard_band"])
    for pname, props in cfg.get("pass_overrides", {}).items():
        m.active_graph.get_pass(pname).cfg.update(props)
    m.loadScene(cfg.get("scene", "CornellBox"))
    m.clock.pause()

    captures = {}
    for f in range(max(frames) + 1):
        m.clock.frame = f
        out = m.renderFrame()
        if f in frames:
            for k, v in out.items():
                if "OUTPUTS" in dir(mod) and k not in mod.OUTPUTS:
                    continue
                captures[f"{k}.{f}"] = np.asarray(v, np.float32)

    errors = {}
    status = "pass"
    if not captures:
        # OUTPUTS filtered everything away (typo'd name) — fail loudly
        return dict(name=name, status="fail",
                    errors={"<no outputs captured>": 1.0}, tolerance=tol)
    os.makedirs(refs_dir, exist_ok=True)
    for key, img in captures.items():
        ref_path = os.path.join(refs_dir, f"{name}.{key}.npy")
        if generate or not os.path.exists(ref_path):
            np.save(ref_path, img.astype(np.float16))
            errors[key] = 0.0
            status = "generated" if generate or status == "generated" else "missing_ref"
            continue
        ref = np.load(ref_path).astype(np.float32)
        err = compare(img, ref, "mse")
        errors[key] = err
        if err > tol:
            status = "fail"
    return dict(name=name, status=status, errors=errors, tolerance=tol)


def run_all(tests_dir=DEFAULT_TESTS, refs_dir=DEFAULT_REFS, generate=False):
    results = [run_test(t, refs_dir, generate) for t in discover(tests_dir)]
    report = {"results": results,
              "failed": [r["name"] for r in results if r["status"] == "fail"]}
    return report


def _png_b64(img):
    """[H,W(,C)] float -> base64 PNG (for the self-contained HTML report)."""
    import base64
    import io

    from PIL import Image
    a = np.asarray(img, np.float32)
    if a.ndim == 3 and a.shape[-1] > 3:
        a = a[..., :3]
    if a.ndim == 2:
        a = np.stack([a] * 3, -1)
    a = np.clip(a, 0.0, 1.0)
    buf = io.BytesIO()
    Image.fromarray((a * 255).astype(np.uint8)).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def write_report(report, out_dir, refs_dir=DEFAULT_REFS):
    """JSON + self-contained HTML report with reference thumbnails — the
    reference tier's viewer (tests/testing/view_image_tests.py emits the
    same test/status/error table with images)."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    rows = []
    for r in report["results"]:
        cells = []
        for key, err in sorted(r.get("errors", {}).items()):
            ref_path = os.path.join(refs_dir, f"{r['name']}.{key}.npy")
            thumb = ""
            if os.path.exists(ref_path):
                try:
                    thumb = ("<img src='data:image/png;base64,%s' "
                             "style='max-width:160px'/>" %
                             _png_b64(np.load(ref_path).astype(np.float32)))
                except Exception:
                    thumb = ""
            cells.append(f"<td>{key}<br>mse={err:.2e}<br>{thumb}</td>")
        color = {"pass": "#cfc", "fail": "#fcc"}.get(r["status"], "#ffc")
        rows.append(f"<tr style='background:{color}'><td>{r['name']}<br>"
                    f"<b>{r['status']}</b><br>tol={r['tolerance']:.1e}</td>"
                    + "".join(cells) + "</tr>")
    html = ("<html><head><title>rtsdm_tpu image tests</title></head><body>"
            f"<h1>Image tests — {len(report['results'])} tests, "
            f"{len(report['failed'])} failed</h1>"
            "<table border=1 cellpadding=4>" + "".join(rows)
            + "</table></body></html>")
    with open(os.path.join(out_dir, "report.html"), "w") as f:
        f.write(html)


def main(argv=None):
    import argparse

    # goldens are CPU-canonical: the pytest tier compares on the virtual CPU
    # mesh (tests/conftest.py), so references must be generated there too —
    # TPU numerics differ slightly and the axon default would also hang this
    # tool whenever the tunnel is down (CLAUDE.md gotchas)
    import jax
    jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--tests-dir", default=DEFAULT_TESTS)
    ap.add_argument("--refs", default=DEFAULT_REFS)
    ap.add_argument("--generate", action="store_true")
    ap.add_argument("--report", default=None,
                    help="directory for report.json + report.html")
    a = ap.parse_args(argv)
    report = run_all(a.tests_dir, a.refs, a.generate)
    if a.report:
        write_report(report, a.report, a.refs)
    print(json.dumps(report, indent=2))
    return 1 if report["failed"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
