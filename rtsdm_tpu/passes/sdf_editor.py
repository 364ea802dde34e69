"""SDFEditor — SDF primitive editing + sphere-traced visualization
(reference Source/RenderPasses/SDFEditor/SDFEditor.cpp, 3.4k LoC: a GUI
editor that batches primitive edits onto an SDF grid and renders it; the
GUI collapses into the editor API on SDFPrimitiveList, scene/sdf.py).

Rendering is fixed-iteration sphere tracing under jit (`lax.fori_loop`,
no data-dependent control flow), either against the analytic primitive
list or the baked dense grid (`gridBacked`). Outputs a G-buffer-shaped
set of channels (color/depth/normal) so the result can feed the usual
post passes."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass
from ..scene.sdf import SDFPrimitiveList, bake_grid, eval_grid, eval_sdf
from ..utils.math import normalize, saturate


@register_pass("SDFEditor")
class SDFEditor(RenderPass):
    SCHEMA = dict(iterations=64, epsilon=1e-3, maxDistance=100.0,
                  gridBacked=False, gridRes=64, baseColor=(0.75, 0.72, 0.68),
                  lightDir=(0.4, -1.0, -0.3))

    def __init__(self, props=None):
        super().__init__(props)
        self.primitives = SDFPrimitiveList()
        self._grid = None

    # editor entry points (SDFEditor mouse/keyboard edits -> API calls)
    def addPrimitive(self, *args, **kwargs) -> int:
        self._grid = None  # edits invalidate the baked grid
        return self.primitives.add(*args, **kwargs)

    def removePrimitive(self, pid: int):
        self._grid = None
        self.primitives.remove(pid)

    def movePrimitive(self, pid: int, position):
        self._grid = None
        self.primitives.move(pid, position)

    def reflect(self, ctx):
        return (PassReflection().add_input("inputColor", optional=True)
                .add_output("output").add_output("linearZ")
                .add_output("normalW"))

    def _distance_fn(self):
        tables = self.primitives.tables()
        if self.cfg["gridBacked"]:
            if self._grid is None:
                import numpy as np
                pos = np.asarray(tables[1])
                ext = float(np.abs(np.asarray(tables[2])).max()
                            + np.abs(pos).max()) + 1.0
                grid, bounds = bake_grid(tables, (-ext,) * 3, (ext,) * 3,
                                         int(self.cfg["gridRes"]))
                self._grid = (jax.device_put(grid), bounds)
            grid, bounds = self._grid
            return lambda p: eval_grid(grid, bounds, p)
        return lambda p: eval_sdf(tables, p)

    def execute(self, ctx, inputs, state=None):
        h, w = ctx.height, ctx.width
        cam = ctx.scene.camera
        sdf = self._distance_fn()
        eps = float(self.cfg["epsilon"])
        tmax = float(self.cfg["maxDistance"])

        xs = jnp.arange(w, dtype=jnp.float32)
        ys = jnp.arange(h, dtype=jnp.float32)
        px = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1)
        origin, dirs = cam.compute_ray_pinhole(px, (w, h))
        o = jnp.broadcast_to(origin, dirs.shape)

        def step(_, t):
            p = o + dirs * t[..., None]
            d = sdf(p)
            # freeze converged/escaped rays (fixed-iteration sphere trace)
            return jnp.where((d < eps) | (t > tmax), t, t + d)

        t = jax.lax.fori_loop(0, int(self.cfg["iterations"]), step,
                              jnp.full((h, w), cam.near_z))
        p = o + dirs * t[..., None]
        d_final = sdf(p)
        hit = (d_final < 4.0 * eps) & (t <= tmax)

        # central-difference normal (6 evals, full batch)
        e = jnp.asarray([eps, 0.0, 0.0])
        n = jnp.stack([
            sdf(p + jnp.roll(e, k)) - sdf(p - jnp.roll(e, k))
            for k in range(3)], -1)
        n = normalize(n + 1e-12)

        ld = -normalize(jnp.asarray(self.cfg["lightDir"], jnp.float32))
        ndotl = saturate(jnp.sum(n * ld, -1))
        base = jnp.asarray(self.cfg["baseColor"], jnp.float32)
        col = base * (0.15 + 0.85 * ndotl)[..., None]
        bg = (inputs.get("inputColor")
              if inputs.get("inputColor") is not None
              else jnp.full((h, w, 3), 0.05))
        color = jnp.where(hit[..., None], col, bg[..., :3])

        fwd = normalize(cam.camera_w)
        view_z = t * jnp.sum(dirs * fwd, -1)
        lin_z = jnp.where(hit, view_z, cam.far_z)
        return {"output": color, "linearZ": lin_z,
                "normalW": jnp.where(hit[..., None], n, 0.0)}, None
