# Dual-depth study: SVAO(DualDepth) vs SVAO_ref(Raytraced), with a
# TemporalDepthPeel / DepthPeeling switch for the second layer
# (reference SVAO_depth graph, SURVEY §2.4).
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _graphlib import build

PASSES = [
    ('GBufferRaster', 'GBufferRaster', dict(sampleCount=16, useAlphaTest=True, cull='Back')),
    ('LinearizeDepth', 'LinearizeDepth', {}),
    ('GuardBand', 'GuardBand', dict(guardBand=64)),
    ('DepthPeeling', 'DepthPeeling', dict(cullMode='Back', minSeparationDistance=0.5)),
    ('TemporalDepthPeel', 'TemporalDepthPeel',
     dict(minSeparationDistance=0.01)),
    ('DepthSelect', 'Switch', dict(count=2, selected=0, i0='Temporal', i1='Peel')),
    ('LinearizeDepth2', 'LinearizeDepth', {}),
    ('CompressNormals', 'CompressNormals', dict(viewSpace=True, use16Bit=True)),
    ('SVAO', 'SVAO', dict(radius=0.2, primaryDepthMode='DualDepth',
                          secondaryDepthMode='SingleDepth', exponent=2.0)),
    ('SVAO_ref', 'SVAO', dict(radius=0.2, primaryDepthMode='SingleDepth',
                              secondaryDepthMode='Raytraced', exponent=2.0)),
    ('Ambient', 'ImageEquation', dict(formula='I0[xy].rrra', format='RGBA32Float')),
    ('AmbientRef', 'ImageEquation', dict(formula='I0[xy].rrra', format='RGBA32Float')),
]

EDGES = [
    ('GuardBand', 'GBufferRaster'),
    ('GBufferRaster.depth', 'LinearizeDepth.depth'),
    ('LinearizeDepth.linearDepth', 'DepthPeeling.linearZ'),
    ('LinearizeDepth.linearDepth', 'TemporalDepthPeel.linearZ'),
    ('GBufferRaster.mvec', 'TemporalDepthPeel.mvec'),
    ('TemporalDepthPeel.depth2', 'DepthSelect.i0'),
    ('DepthPeeling.depth2', 'DepthSelect.i1'),
    ('DepthSelect.out', 'LinearizeDepth2.depth'),
    ('GBufferRaster.faceNormalW', 'CompressNormals.normalW'),
    ('GBufferRaster.depth', 'SVAO.gbufferDepth'),
    ('LinearizeDepth.linearDepth', 'SVAO.depth'),
    ('LinearizeDepth2.linearDepth', 'SVAO.depth2'),
    ('CompressNormals.normalOut', 'SVAO.normals'),
    ('GBufferRaster.depth', 'SVAO_ref.gbufferDepth'),
    ('LinearizeDepth.linearDepth', 'SVAO_ref.depth'),
    ('LinearizeDepth2.linearDepth', 'SVAO_ref.depth2'),
    ('CompressNormals.normalOut', 'SVAO_ref.normals'),
    ('SVAO.ao', 'Ambient.I0'),
    ('SVAO_ref.ao', 'AmbientRef.I0'),
]

SVAO_depth = build('SVAO_depth', PASSES, EDGES, ['Ambient.out', 'AmbientRef.out'])
try:
    m.addGraph(SVAO_depth)
except NameError:
    pass
