"""FrameCapture: write marked graph outputs to files on trigger frames
(reference Source/Mogwai/Extensions/Capture/FrameCapture.h:35 — the basis of
the reference's image tests)."""
from __future__ import annotations

import os

import numpy as np


def _to_u8(img):
    a = np.asarray(img, np.float32)
    if a.ndim == 2:
        a = a[..., None]
    if a.shape[-1] == 1:
        a = np.repeat(a, 3, axis=-1)
    if a.shape[-1] == 2:
        a = np.concatenate([a, np.zeros_like(a[..., :1])], -1)
    return (np.clip(a[..., :3], 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


class FrameCapture:
    def __init__(self):
        self.outputDir = "."
        self.baseFilename = "Mogwai"
        # "npy" (exact), "exr" (HDR interchange), or "png" (LDR only);
        # a .png preview is written alongside either way (the reference
        # captures EXR for HDR outputs, FrameCapture.cpp)
        self.format = "npy"
        self.captured: list[str] = []
        self._renderer = None

    def _attach(self, renderer):
        self._renderer = renderer

    def capture(self):
        """Write every marked output of the active graph as .npy (exact) and
        .png (preview). Filenames mirror the reference's
        <base>.<graph>.<pass>.<channel>.<frame>."""
        r = self._renderer
        if r is None or r._last_outputs is None:
            raise RuntimeError("no rendered frame to capture")
        os.makedirs(self.outputDir, exist_ok=True)
        frame = r.clock.frame
        files = []
        for name, arr in r._last_outputs.items():
            a = np.asarray(arr)
            base = f"{self.baseFilename}.{r.active_graph.name}.{name}.{frame}"
            from ..utils.image_io import save_image
            ext = self.format if self.format in ("npy", "exr", "png") else "npy"
            main = os.path.join(self.outputDir, base + "." + ext)
            save_image(main, a if ext != "exr" or a.ndim == 2
                       else a[..., :min(a.shape[-1], 4)])
            if ext != "png":
                png = os.path.join(self.outputDir, base + ".png")
                try:
                    from PIL import Image
                    Image.fromarray(_to_u8(a)).save(png)
                except Exception:
                    pass
            files.append(main)
        self.captured.extend(files)
        return files
