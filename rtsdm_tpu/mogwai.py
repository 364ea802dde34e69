"""Mogwai: the script-driven renderer harness.

Reference: Source/Mogwai/ — `m` object script API (MogwaiScripting.cpp:127-179
binds m.loadScene/addGraph/renderFrame/clock/profiler/frameCapture), frame
loop (SampleApp.cpp:471-540), windowless Testbed (Core/Testbed.h:75).

TPU-native: renderFrame runs the whole graph as ONE jitted function
(scene, state, frame, time) -> (outputs, state) — the RenderGraphExe pass
loop is fused by XLA instead of dispatched per pass. Guard band handling
follows the reference's manual protocol (GuardBand.cpp:74-100): the frame
buffer grows by 2*guardBand and the camera FOV is widened so the interior
matches the requested image.
"""
from __future__ import annotations

import math
import os
import runpy
import sys

import jax
import numpy as np

from . import falcor  # noqa: F401  (installs `falcor` module + registers passes)
from .core.clock import Clock
from .core.frame_capture import FrameCapture
from .core.profiler import Profiler
from .rendergraph.graph import RenderGraph
from .rendergraph.render_pass import RenderContext
from .scene.procedural import load_scene
from .scene.camera import Camera
from .utils.structs import replace


class TimingCapture:
    """Writes the frame time per frame to a file (reference Mogwai extension
    Extensions/Profiler/TimingCapture.h:34)."""

    def __init__(self, renderer):
        self._renderer = renderer
        self._path = None
        self._file = None

    def captureFrameTime(self, path):
        self._path = path
        self._file = open(path, "w") if path else None

    def _record(self, ms):
        if self._file:
            self._file.write(f"{ms:.4f}\n")
            self._file.flush()


class PixelDebug:
    """Select a pixel; passes' ctx.debug_print() intermediates at that pixel
    surface here after each frame (reference Utils/Debug/PixelDebug.h:65 —
    the shader-print mechanism, TPU-shaped: one in-jit dynamic_slice per
    logged value instead of a UAV log buffer)."""

    def __init__(self, renderer):
        self._renderer = renderer
        self.pixel = None    # (x, y) or None = disabled
        self.last = {}       # {"i:name": float/array} from the last frame

    def select(self, x: int, y: int):
        self.pixel = (int(x), int(y))
        self._renderer._frame_fn = None  # rebuild with debug taps

    def disable(self):
        self.pixel = None
        self._renderer._frame_fn = None


class Renderer:
    """The `m` object."""

    def __init__(self, width: int = 1920, height: int = 1080, use_jit: bool = True):
        self.width = width
        self.height = height
        self.use_jit = use_jit
        self.clock = Clock()
        self.profiler = Profiler(enabled=False)
        self.frameCapture = FrameCapture()
        self.frameCapture._attach(self)
        self.timingCapture = TimingCapture(self)
        self.graphs: list[RenderGraph] = []
        self.active_graph: RenderGraph | None = None
        self.scene = None
        self.cameraPath = None          # scene/animation.py CameraPath
        self.animationController = None  # scene/animation.py AnimationController
        self._scene_name = None
        self._state = None
        self._frame_fn = None
        self._scene_comp = None  # guard-band-compensated pristine scene
        self._last_outputs = None
        from .core.settings import Settings
        self.settings = Settings()
        self.pixelDebug = PixelDebug(self)

    # --- script API -----------------------------------------------------
    def addGraph(self, graph: RenderGraph):
        self.graphs.append(graph)
        self.active_graph = graph
        self._apply_settings(graph)
        if self.scene is not None:
            graph.set_scene(self.scene)
        self._frame_fn = None
        self._state = None

    def renderUI(self) -> dict:
        """App-level declarative UI (the headless Mogwai::renderUI analogue,
        Mogwai.cpp renderUI + Utils/UI/Gui.h): clock controls + scene info +
        per-graph pass widget trees. tools/ui_panel.py turns this into an
        HTML control panel; applyUI() feeds edited values back."""
        return dict(
            clock=dict(time=float(self.clock.time),
                       paused=self.clock.paused,
                       framerate=self.clock.framerate),
            scene=dict(name=self._scene_name,
                       triangles=(int(self.scene.num_triangles)
                                  if self.scene is not None else 0)),
            resolution=[self.width, self.height],
            graphs={g.name: g.render_ui() for g in self.graphs})

    def applyUI(self, edits: dict) -> bool:
        """Apply {graph: {pass: {key: value}}} edits; invalidates the
        compiled frame path when anything changed (requestRecompile)."""
        changed = False
        by_name = {g.name: g for g in self.graphs}
        for gname, gedits in edits.items():
            changed |= by_name[gname].apply_ui(gedits)
        if changed:
            self._frame_fn = None
            self._state = None
        return changed

    def addOptions(self, source):
        """Global options from a dict or a JSON file path (reference
        Settings::addOptions, Utils/Settings.h:314-319; Mogwai scripts call
        m.addOptions(...)). Options under 'RenderPass:<Type>' override
        matching pass properties; attribute filters added via
        m.settings.add_filtered_attributes(pattern, attrs) match
        '<graph>:<pass>' subjects (Settings.h:297-324)."""
        self.settings.add_options(source)
        for g in self.graphs:
            self._apply_settings(g)
        self._frame_fn = None
        self._state = None

    def clearOptions(self):
        self.settings._options.clear()

    def _apply_settings(self, graph):
        for name, p in graph.passes.items():
            opts = self.settings.get_option(f"RenderPass:{p.pass_type}")
            if isinstance(opts, dict):
                for key, val in opts.items():
                    if key in p.cfg:
                        p.cfg[key] = val
            subject = f"{getattr(graph, 'name', 'graph')}:{name}"
            for key in list(p.cfg.keys()):
                val = self.settings.get_attribute(subject, key, None)
                if val is not None:
                    p.cfg[key] = val

    def removeGraph(self, graph):
        self.graphs.remove(graph)
        if self.active_graph is graph:
            self.active_graph = self.graphs[-1] if self.graphs else None

    def loadScene(self, path: str, use_cache: bool = True):
        """Scene load via importer dispatch + SceneCache (reference
        Mogwai.h:166 / Scene/Importer.cpp / SceneCache.h:54). Every file
        importer goes through the content-keyed cache (r2 verdict #10:
        glTF/pbrt/USDA previously reloaded cold every run); .pyscene is
        executable python and is never cached."""
        self._scene_name = path
        file_exts = (".obj", ".gltf", ".glb", ".pbrt", ".usda", ".usd",
                     ".fbx")
        if path.endswith(file_exts + (".pyscene",)):
            from .scene.importers import load_any
            if use_cache and path.endswith(file_exts):
                from .scene import cache
                self.scene = cache.load_cached(path, load_any)
            else:
                self.scene = load_any(path)
        else:
            self.scene = load_scene(path, aspect=self.width / self.height)
        # scene options (Settings attribute machinery, Utils/Settings.h):
        # 'Scene:emissiveVirtualLights' = N turns emissive geometry into up
        # to N analytic point lights for the raster shading paths
        evl = int(self.settings.get_option("Scene:emissiveVirtualLights", 0))
        if evl > 0:
            from .scene.scene import add_emissive_virtual_lights
            self.scene = add_emissive_virtual_lights(self.scene, evl)
        for g in self.graphs:
            g.set_scene(self.scene)
        self._frame_fn = None
        self._state = None

    def saveConfig(self, path: str):
        """Round-trip the active graph to a python script (Mogwai 'save
        config', RenderGraphImportExport/ScriptWriter)."""
        from .core.script_writer import save_graph_script
        save_graph_script(self.active_graph, path)

    def resizeFrameBuffer(self, width: int, height: int):
        self.width, self.height = width, height
        if self._scene_name:
            self.loadScene(self._scene_name)
        self._frame_fn = None
        self._state = None

    # --- frame loop -------------------------------------------------------
    def _guard_band(self) -> int:
        g = self.active_graph
        for p in g.passes.values():
            if p.pass_type == "GuardBand":
                return int(p.cfg["guardBand"])
        return 0

    def _render_res(self):
        gb = self._guard_band()
        return self.width + 2 * gb, self.height + 2 * gb, gb

    def _compensated_scene(self):
        """Widen the FOV so the guard-band interior keeps the requested FOV
        (the reference's 'Fix Camera Fov', GuardBand.cpp:96-100)."""
        gb = self._guard_band()
        if gb == 0:
            return self.scene
        cam = self.scene.camera
        h = self.height / 2 + gb
        fov = 2.0 * math.atan(0.5 * float(cam.frame_height) / float(cam.focal_length))
        new_fov = 2.0 * math.atan(h * math.tan(fov * 0.5) / (h - gb))
        new_focal = 0.5 * float(cam.frame_height) / math.tan(new_fov * 0.5)
        rw, rh, _ = self._render_res()
        new_cam = Camera.create(
            position=np.asarray(cam.pos_w), target=np.asarray(cam.target),
            up=np.asarray(cam.up), focal_length=new_focal,
            frame_height=float(cam.frame_height), aspect=rw / rh,
            near_z=float(cam.near_z), far_z=float(cam.far_z))
        return self.scene.with_camera(new_cam)

    def _build_frame_fn(self):
        graph = self.active_graph
        rw, rh, gb = self._render_res()
        scene = self._compensated_scene()
        graph.set_scene(scene)
        ctx = RenderContext(width=rw, height=rh, scene=scene,
                            dictionary={"guardBand": gb})
        self._state = graph.init_state(ctx)
        fn = graph.frame_fn(rw, rh, dictionary={"guardBand": gb},
                            pixel_debug=self.pixelDebug.pixel)
        # donate the temporal-state pytree: XLA aliases each frame's new
        # history buffers (TAA/TemporalAO/accum, several full-res planes)
        # into the old ones instead of fresh HBM allocations + copies
        # (reference keeps persistent textures; donation is the jit form)
        self._frame_fn = (jax.jit(fn, donate_argnums=(1,))
                          if self.use_jit else fn)
        self._scene_comp = scene

    def renderFrame(self):
        if self.active_graph is None or self.scene is None:
            raise RuntimeError("need addGraph + loadScene before renderFrame")
        if self._frame_fn is None:
            self._build_frame_fn()
        # self._scene_comp stays the PRISTINE (bind-pose) scene: node tracks
        # carry absolute node-to-world transforms, so each frame re-applies
        # them to the base soup (applying to last frame's animated soup would
        # compound transforms every frame — AnimationController::animate in
        # the reference also transforms from the static bind pose).
        scene = self._scene_comp
        if self.animationController is not None:
            # geometry animation: animated vertex soup + prev positions for
            # object motion vectors (same pytree structure after the first
            # frame -> no recompile beyond the one-time prev_positions add)
            scene = self.animationController.animate(scene, self.clock.time)
        if self.cameraPath is not None:
            # animate the camera (same pytree structure -> no recompile)
            base = self._scene_comp.camera
            cam = self.cameraPath.camera_at(self.clock.time, base,
                                            dt=1.0 / self.clock.framerate,
                                            aspect=float(base.aspect),
                                            focal=float(base.focal_length))
            scene = scene.with_camera(cam)
        import time as _time
        t0 = _time.perf_counter()
        with self.profiler.event("renderFrame"):
            marked, self._state = self._frame_fn(
                scene, self._state,
                frame_index=self.clock.frame, time=self.clock.time)
            jax.block_until_ready(marked)
        self.timingCapture._record((_time.perf_counter() - t0) * 1e3)
        dbg = marked.pop("__pixel_debug__", None)
        if dbg is not None:
            self.pixelDebug.last = {k: np.asarray(v) for k, v in dbg.items()}
        # crop the guard band off marked outputs (capture shows the target res)
        _, _, gb = self._render_res()
        if gb:
            marked = {k: v[gb:gb + self.height, gb:gb + self.width]
                      if hasattr(v, "ndim") and v.ndim >= 2 else v
                      for k, v in marked.items()}
        self._last_outputs = marked
        self.clock.tick()
        return marked


def load_plugins(paths):
    """Runtime pass/importer plugins (reference PluginRegistry +
    FALCOR_PLUGIN_CLASS, Core/Plugin.h — DLLs there, python modules here):
    each path is a .py file or a directory of .py files executed once;
    modules register passes via @register_pass / importers by monkeypatching
    scene.importers. Returns the newly registered pass-type names."""
    import glob as _glob

    from .rendergraph.render_pass import PASS_REGISTRY
    before = set(PASS_REGISTRY)
    files = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(sorted(_glob.glob(os.path.join(p, "*.py"))))
        else:
            files.append(p)
    for f in files:
        runpy.run_path(f, run_name=f"rtsdm_plugin_{os.path.basename(f)}")
    return sorted(set(PASS_REGISTRY) - before)


def run_script(path: str, m: Renderer | None = None, scene: str | None = None):
    """Execute a graph script the way Mogwai does (Renderer::loadScript,
    Mogwai.h:111): the script sees `m` and `from falcor import *` works."""
    m = m or Renderer()
    glb = {"m": m}
    ns = runpy.run_path(path, init_globals=glb)
    if scene:
        m.loadScene(scene)
    return m, ns


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description="Mogwai-style script runner")
    ap.add_argument("script")
    ap.add_argument("--scene", default="CornellBox")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--frames", type=int, default=1)
    ap.add_argument("--capture", default=None)
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--plugin", action="append", default=[],
                    help="pass-plugin .py file or directory (repeatable)")
    args = ap.parse_args(argv)

    if args.plugin:
        load_plugins(args.plugin)
    m = Renderer(width=args.width, height=args.height)
    m.profiler.enabled = args.profile
    run_script(args.script, m)
    m.loadScene(args.scene)
    m.clock.pause()
    for f in range(args.frames):
        m.clock.frame = f
        m.renderFrame()
        if args.capture:
            m.frameCapture.outputDir = args.capture
            m.frameCapture.capture()
    if args.profile:
        print(m.profiler.capture_json())
    print("outputs:", {k: tuple(v.shape) for k, v in m._last_outputs.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())
