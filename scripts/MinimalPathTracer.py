# Ground-truth path-traced reference with accumulation (reference
# MinimalPathTracer graph).
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _graphlib import build

PASSES = [
    ('VBufferRT', 'VBufferRT', dict(cull='Back')),
    ('MinimalPathTracer', 'MinimalPathTracer', dict(maxBounces=2)),
    ('AccumulatePass', 'AccumulatePass', dict(enabled=True)),
    ('ToneMapper', 'ToneMapper', dict(operator='Aces', clamp=True)),
]
EDGES = [
    ('VBufferRT.vbuffer', 'MinimalPathTracer.vbuffer'),
    ('MinimalPathTracer.color', 'AccumulatePass.input'),
    ('AccumulatePass.output', 'ToneMapper.src'),
]
g = build('MinimalPathTracer', PASSES, EDGES, ['ToneMapper.dst'])
try:
    m.addGraph(g)
except NameError:
    pass
