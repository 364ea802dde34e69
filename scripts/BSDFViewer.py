# BSDF viewer graph (reference scripts/BSDFViewer.py: BSDFViewer ->
# AccumulatePass).
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _graphlib import build

PASSES = [
    ('BSDFViewer', 'BSDFViewer', dict(materialID=0)),
    ('AccumulatePass', 'AccumulatePass', dict(enabled=True, precisionMode='Double')),
]
EDGES = [
    ('BSDFViewer.output', 'AccumulatePass.input'),
]
g = build('BSDFViewer', PASSES, EDGES, ['AccumulatePass.output'])
try:
    m.addGraph(g)
except NameError:
    pass
