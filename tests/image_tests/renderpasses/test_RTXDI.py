# RTXDI graph (vendor-stub RTXDIPass passes radiance through; VBufferRT +
# ToneMapper are real — locks the graph wiring + the pass-through contract).
IMAGE_TEST = {"tolerance": 2e-4, "frames": [1], "scene": "CornellBox",
              "width": 128, "height": 128}
SCRIPT = "scripts/RTXDI.py"
OUTPUTS = ["ToneMapper.dst"]
