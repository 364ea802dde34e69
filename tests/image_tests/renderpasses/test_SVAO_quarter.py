# Golden-image test for the quarter-res Ray-SD pipeline (config-4 shape:
# stochMapDivisor=4 + AO-guided upsample + TAA).
IMAGE_TEST = {"tolerance": 2e-4, "frames": [1], "scene": "CornellBox",
              "width": 96, "height": 96, "guard_band": 8,
              "pass_overrides": {"GBufferRaster": {"maxPerTile": 64},
                                 "ForwardLighting": {"maxPerTile": 64},
                                 "SVAO": {"stochMapGuardBand": 32}}}
SCRIPT = "scripts/SVAO_quarter.py"
