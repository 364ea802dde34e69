# Dual-AO (bright/dark channel) SVAO variant (VERDICT r2 weak #6: no dual-AO
# golden existed).
IMAGE_TEST = {"tolerance": 2e-4, "frames": [1], "scene": "CornellBox",
              "width": 128, "height": 128, "guard_band": 8,
              "pass_overrides": {"SVAO": {"dualAO": True,
                                           "stochMapGuardBand": 64}}}
SCRIPT = "scripts/SVAO_small.py"
OUTPUTS = ["AmbientOcclusion.out"]
