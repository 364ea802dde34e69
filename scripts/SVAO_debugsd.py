# SVAO + stochastic-depth point visualization (reference SVAO_debugsd graph).
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _graphlib import build

PASSES = [
    ('GBufferRaster', 'GBufferRaster', dict(sampleCount=8, cull='Back')),
    ('LinearizeDepth', 'LinearizeDepth', {}),
    ('GuardBand', 'GuardBand', dict(guardBand=64)),
    ('CompressNormals', 'CompressNormals', dict(viewSpace=True, use16Bit=True)),
    ('SVAO', 'SVAO', dict(radius=0.2, secondaryDepthMode='StochasticDepth',
                          stochMapDivisor=4)),
    ('Ambient', 'ImageEquation', dict(formula='I0[xy].rrra', format='RGBA32Float')),
    ('DebugStochasticDepth', 'DebugStochasticDepth', {}),
]

EDGES = [
    ('GuardBand', 'GBufferRaster'),
    ('GBufferRaster.depth', 'LinearizeDepth.depth'),
    ('GBufferRaster.depth', 'SVAO.gbufferDepth'),
    ('LinearizeDepth.linearDepth', 'SVAO.depth'),
    ('LinearizeDepth.linearDepth', 'SVAO.depth2'),
    ('CompressNormals.normalOut', 'SVAO.normals'),
    ('GBufferRaster.faceNormalW', 'CompressNormals.normalW'),
    ('SVAO.ao', 'Ambient.I0'),
    ('LinearizeDepth.linearDepth', 'DebugStochasticDepth.depth'),
    ('Ambient.out', 'DebugStochasticDepth.in'),
]

g = build('SVAO_debugsd', PASSES, EDGES, ['DebugStochasticDepth.out'])
try:
    m.addGraph(g)
except NameError:
    pass
