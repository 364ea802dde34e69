IMAGE_TEST = {"tolerance": 2e-4, "frames": [2], "scene": "CornellBox",
              "width": 128, "height": 72}
SCRIPT = "samples/ShaderToy.py"
