IMAGE_TEST = {"tolerance": 5e-4, "frames": [1], "scene": "CornellBox",
              "width": 96, "height": 96}
SCRIPT = "scripts/PathTracer.py"
