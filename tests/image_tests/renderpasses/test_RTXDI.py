# RTXDI graph: ReSTIR reservoir direct lighting (passes/rtxdi.py) through
# the reference wiring — locks the reservoir path's frame-1 image.
IMAGE_TEST = {"tolerance": 2e-4, "frames": [1], "scene": "CornellBox",
              "width": 128, "height": 128}
SCRIPT = "scripts/RTXDI.py"
OUTPUTS = ["ToneMapper.dst"]
