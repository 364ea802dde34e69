# A real imported-mesh scene (Arcade small tier) through Forward shading.
IMAGE_TEST = {"tolerance": 2e-4, "frames": [1], "scene": "Arcade",
              "width": 160, "height": 96}
SCRIPT = "scripts/Forward.py"
OUTPUTS = ["ToneMapper.dst"]
