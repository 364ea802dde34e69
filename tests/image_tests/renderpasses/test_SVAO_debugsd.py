IMAGE_TEST = {"tolerance": 2e-4, "frames": [1], "scene": "CornellBox",
              "width": 96, "height": 96, "guard_band": 8}
SCRIPT = "scripts/SVAO_debugsd.py"
