# Golden-image test for the SVAO Ray-SD pipeline (configs 2-4 shape).
IMAGE_TEST = {"tolerance": 2e-4, "frames": [1], "scene": "CornellBox",
              "width": 96, "height": 96, "guard_band": 8,
              "pass_overrides": {"GBufferRaster": {"maxPerTile": 64},
                                  "DepthPeeling": {"maxPerTile": 64},
                                  "ForwardLighting": {"maxPerTile": 64},
                                  "SVAO": {"stochMapGuardBand": 64}}}
SCRIPT = "scripts/SVAO_small.py"
OUTPUTS = ["AmbientOcclusion.out", "Shaded.out"]
