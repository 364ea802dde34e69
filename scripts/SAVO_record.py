# ML-training capture pipeline: SVAO raster vs reference ray AO exported as
# npy + CNN inference compare (reference SAVO_record graph, SURVEY §2.4).
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _graphlib import build

PASSES = [
    ('GBufferRaster', 'GBufferRaster', dict(sampleCount=8, cull='Back')),
    ('LinearizeDepth', 'LinearizeDepth', {}),
    ('GuardBand', 'GuardBand', dict(guardBand=32)),
    ('CompressNormals', 'CompressNormals', dict(viewSpace=True, use16Bit=True)),
    ('SVAO', 'SVAO', dict(radius=0.2, secondaryDepthMode='SingleDepth',
                          dualAO=True)),
    ('SVAO_ref', 'SVAO', dict(radius=0.2, secondaryDepthMode='Raytraced')),
    ('DeinterleaveAO', 'DeinterleaveTexture', {}),
    ('VAOExport', 'VAOExport', dict(outputDir='/tmp/vao_export')),
    ('ConvNet', 'ConvolutionalNet', dict(weights='')),
]

EDGES = [
    ('GuardBand', 'GBufferRaster'),
    ('GBufferRaster.depth', 'LinearizeDepth.depth'),
    ('GBufferRaster.depth', 'SVAO.gbufferDepth'),
    ('LinearizeDepth.linearDepth', 'SVAO.depth'),
    ('LinearizeDepth.linearDepth', 'SVAO.depth2'),
    ('CompressNormals.normalOut', 'SVAO.normals'),
    ('GBufferRaster.faceNormalW', 'CompressNormals.normalW'),
    ('GBufferRaster.depth', 'SVAO_ref.gbufferDepth'),
    ('LinearizeDepth.linearDepth', 'SVAO_ref.depth'),
    ('LinearizeDepth.linearDepth', 'SVAO_ref.depth2'),
    ('CompressNormals.normalOut', 'SVAO_ref.normals'),
    ('SVAO.ao', 'DeinterleaveAO.texIn'),
    ('SVAO.ao', 'VAOExport.bright'),
    ('SVAO_ref.ao', 'VAOExport.ao'),
    ('LinearizeDepth.linearDepth', 'VAOExport.depth'),
    ('SVAO.ao', 'ConvNet.input'),
]

g = build('SAVO_record', PASSES, EDGES, ['ConvNet.output'])
try:
    m.addGraph(g)
except NameError:
    pass
