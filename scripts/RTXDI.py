# RTXDI graph (reference scripts/RTXDI.py wiring: VBufferRT -> RTXDIPass ->
# AccumulatePass -> ToneMapper). RTXDIPass runs TPU-native ReSTIR reservoir
# resampling with temporal + spatial reuse (passes/rtxdi.py).
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _graphlib import build

PASSES = [
    ('VBufferRT', 'VBufferRT', {}),
    ('RTXDIPass', 'RTXDIPass', {}),
    ('AccumulatePass', 'AccumulatePass', dict(enabled=False, precisionMode='Single')),
    ('ToneMapper', 'ToneMapper', dict(autoExposure=False, exposureCompensation=0.0)),
]
EDGES = [
    ('VBufferRT.vbuffer', 'RTXDIPass.vbuffer'),
    ('VBufferRT.mvec', 'RTXDIPass.mvec'),
    ('RTXDIPass.color', 'AccumulatePass.input'),
    ('AccumulatePass.output', 'ToneMapper.src'),
]
g = build('RTXDI', PASSES, EDGES, ['ToneMapper.dst'])
try:
    m.addGraph(g)
except NameError:
    pass
