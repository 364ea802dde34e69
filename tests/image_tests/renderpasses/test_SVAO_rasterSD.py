# Raster stochastic-depth graph variant (StochasticDepthMap, config-2 shape).
IMAGE_TEST = {"tolerance": 2e-4, "frames": [1], "scene": "CornellBox",
              "width": 128, "height": 128, "guard_band": 8,
              "pass_overrides": {"SVAO": {"stochasticDepthImpl": "Raster",
                                           "stochMapGuardBand": 64}}}
SCRIPT = "scripts/SVAO_small.py"
OUTPUTS = ["AmbientOcclusion.out"]
