# SampleAppTemplate — the starting-point skeleton (reference
# Source/Samples/SampleAppTemplate: the minimal app you copy to begin a new
# tool). Shows the three things every app does: build a graph from passes,
# mark an output, hand it to the harness. Run:
#   python -m rtsdm_tpu.mogwai samples/SampleAppTemplate.py \
#       --scene CornellBox --width 256 --height 256 --frames 1
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "scripts"))
from _graphlib import build

PASSES = [
    # 1) your passes here (see docs/passes.md for the full registry)
    ('GBufferRaster', 'GBufferRaster', {}),
    ('LinearizeDepth', 'LinearizeDepth', {}),
]
EDGES = [
    # 2) wire channels pass-to-pass
    ('GBufferRaster.depth', 'LinearizeDepth.depth'),
]

# 3) build + register; mark what to show/capture
Template = build('SampleAppTemplate', PASSES, EDGES,
                 ['LinearizeDepth.linearDepth'])
try:
    m.addGraph(Template)
except NameError:
    pass
