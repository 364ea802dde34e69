IMAGE_TEST = {"tolerance": 2e-4, "frames": [2], "scene": "CornellBox",
              "width": 96, "height": 96}
SCRIPT = "samples/MultiSampling.py"
