IMAGE_TEST = {"tolerance": 2e-4, "frames": [1], "scene": "CornellBox",
              "width": 128, "height": 64}
SCRIPT = "samples/Visualization2D.py"
