"""Camera animation (reference Scene/Animation/AnimationController.h:43 —
keyframed animation; here the camera path subset that drives the benchmark
flythroughs and PathRecorder replay)."""
from __future__ import annotations

import numpy as np

from .camera import Camera


def _catmull_rom(p0, p1, p2, p3, t):
    t2, t3 = t * t, t * t * t
    return 0.5 * ((2 * p1) + (-p0 + p2) * t
                  + (2 * p0 - 5 * p1 + 4 * p2 - p3) * t2
                  + (-p0 + 3 * p1 - 3 * p2 + p3) * t3)


class CameraPath:
    """Keyframed camera path with Catmull-Rom interpolation. Loops."""

    def __init__(self, positions, targets, ups=None, duration: float = 10.0):
        self.positions = np.asarray(positions, np.float32)
        self.targets = np.asarray(targets, np.float32)
        n = len(self.positions)
        self.ups = (np.asarray(ups, np.float32) if ups is not None
                    else np.tile([0.0, 1.0, 0.0], (n, 1)))
        self.duration = float(duration)

    def _sample(self, arr, u):
        n = len(arr)
        f = (u % 1.0) * n
        i1 = int(f) % n
        i0, i2, i3 = (i1 - 1) % n, (i1 + 1) % n, (i1 + 2) % n
        return _catmull_rom(arr[i0], arr[i1], arr[i2], arr[i3], f - int(f))

    def eval(self, time: float):
        u = time / self.duration
        return (self._sample(self.positions, u),
                self._sample(self.targets, u),
                self._sample(self.ups, u))

    def camera_at(self, time: float, base: Camera, dt: float = 1 / 60,
                  aspect=None, focal=None) -> Camera:
        """Camera at `time`, with prev-frame matrices for motion vectors."""
        pos, tgt, up = self.eval(time)
        kwargs = dict(
            focal_length=float(focal if focal is not None else base.focal_length),
            frame_height=float(base.frame_height),
            aspect=float(aspect if aspect is not None else base.aspect),
            near_z=float(base.near_z), far_z=float(base.far_z))
        p_pos, p_tgt, p_up = self.eval(max(time - dt, 0.0))
        prev = Camera.create(position=p_pos, target=p_tgt, up=p_up, **kwargs)
        return Camera.create(position=pos, target=tgt, up=up, prev=prev,
                             **kwargs)

    @staticmethod
    def orbit(center, radius: float, height: float, duration: float = 10.0,
              n: int = 16) -> "CameraPath":
        """Circular flythrough (the benchmark default for config 5)."""
        center = np.asarray(center, np.float32)
        ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
        pos = np.stack([center[0] + radius * np.cos(ang),
                        np.full(n, center[1] + height),
                        center[2] + radius * np.sin(ang)], -1)
        tgt = np.tile(center, (n, 1))
        return CameraPath(pos, tgt, duration=duration)
