import os
IMAGE_TEST = {"tolerance": 2e-4, "frames": [1],
              "scene": os.path.join(os.path.dirname(__file__), "..", "..",
                                    "assets", "pyscene_demo.pyscene"),
              "width": 128, "height": 96}
SCRIPT = "scripts/Forward.py"
