# Full path tracer with accumulation (reference scripts/PathTracer.py:3-19).
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _graphlib import build

PASSES = [
    ('VBufferRT', 'VBufferRT', dict(cull='Back')),
    ('PathTracer', 'PathTracer', dict(samplesPerPixel=1)),
    ('AccumulatePass', 'AccumulatePass', dict(enabled=True)),
    ('ToneMapper', 'ToneMapper', dict(operator='Aces', clamp=True)),
]
EDGES = [
    ('VBufferRT.vbuffer', 'PathTracer.vbuffer'),
    ('VBufferRT.mvec', 'PathTracer.mvec'),
    ('PathTracer.color', 'AccumulatePass.input'),
    ('AccumulatePass.output', 'ToneMapper.src'),
]
g = build('PathTracer', PASSES, EDGES, ['ToneMapper.dst'])
try:
    m.addGraph(g)
except NameError:
    pass
