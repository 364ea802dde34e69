# Golden-image test for the full PathTracer + SVGF denoiser chain.
IMAGE_TEST = {"tolerance": 2e-4, "frames": [1], "scene": "CornellBox",
              "width": 64, "height": 64,
              "pass_overrides": {"PathTracer": {"maxSurfaceBounces": 2,
                                                "chunk": 64},
                                 "GBufferRaster": {"maxPerTile": 64}}}
SCRIPT = "scripts/PathTracerSVGF.py"
