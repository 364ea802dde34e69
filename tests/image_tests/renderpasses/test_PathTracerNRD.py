# PathTracerNRD dual-chain graph (NRD/DLSS are declared stubs; the reference
# accumulate chain is fully real).
IMAGE_TEST = {"tolerance": 2e-4, "frames": [1], "scene": "CornellBox",
              "width": 128, "height": 128}
SCRIPT = "scripts/PathTracerNRD.py"
OUTPUTS = ["ToneMapperReference.dst"]
