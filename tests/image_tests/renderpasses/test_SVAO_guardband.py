# Guard band at scale: 32 px guard on a 256-px frame exercises the FOV
# compensation + crop protocol (GuardBand.cpp:74-100).
IMAGE_TEST = {"tolerance": 2e-4, "frames": [1], "scene": "CornellBox",
              "width": 256, "height": 256, "guard_band": 32,
              "pass_overrides": {"SVAO": {"stochMapGuardBand": 128}}}
SCRIPT = "scripts/SVAO_small.py"
OUTPUTS = ["AmbientOcclusion.out"]
