# PathTracerNRD dual-chain graph. The reference accumulate chain is fully
# real; the NRD chain runs the SVGF-grade denoiser slot (passes/nrd.py), so
# its ToneMapperNRD output is a real filtered image, locked here alongside
# the reference path (DLSS stays a declared pass-through stub).
IMAGE_TEST = {"tolerance": 2e-4, "frames": [1], "scene": "CornellBox",
              "width": 128, "height": 128}
SCRIPT = "scripts/PathTracerNRD.py"
OUTPUTS = ["ToneMapperReference.dst", "ToneMapperNRD.dst"]
