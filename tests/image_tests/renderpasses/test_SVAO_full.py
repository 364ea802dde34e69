# The full SVAO.py research graph (guard band + interleaved blur chain) at
# reduced resolution — the flagship script itself, not the _small variant.
IMAGE_TEST = {"tolerance": 2e-4, "frames": [1], "scene": "CornellBox",
              "width": 128, "height": 128}
SCRIPT = "scripts/SVAO.py"
OUTPUTS = ["AmbientRef.out", "AmbientTAA.colorOut"]
