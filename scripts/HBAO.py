# HBAO baseline pipeline (BASELINE config 1). Pass names and channel wiring
# follow the reference's shipped HBAO graph (SURVEY §2.4) so the same
# description drives both engines.
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _graphlib import build

TM = dict(operator='Aces', clamp=True)

PASSES = [
    ('GBufferRaster', 'GBufferRaster', dict(sampleCount=16, useAlphaTest=True, cull='Back')),
    ('ForwardLighting', 'ForwardLighting', dict(envMapIntensity=1.0, ambientIntensity=0.5, lightIntensity=0.5)),
    ('LinearizeDepth', 'LinearizeDepth', {}),
    ('EnvMapPass', 'EnvMapPass', {}),
    ('RayShadow', 'RayShadow', {}),
    ('DepthPeeling', 'DepthPeeling', dict(cullMode='Back', minSeparationDistance=0.5)),
    ('MaterialDoubleSided', 'MaterialDoubleSided', {}),
    ('GuardBand', 'GuardBand', dict(guardBand=64)),
    ('ToneMapper', 'ToneMapper', TM),
    ('DeinterleaveDepth', 'DeinterleaveTexture', {}),
    ('CrossBilateralBlurBL', 'CrossBilateralBlur', {}),
    ('InterleaveTexture0', 'InterleaveTexture', {}),
    ('Ambient', 'ImageEquation', dict(formula='I0[xy].rrra', format='RGBA32Float')),
    ('Diffuse', 'ImageEquation', dict(formula='I0[xy].r * I1[xy]', format='RGBA32Float')),
    ('HBAO', 'HBAO', dict(radius=1.0, depthMode='SingleDepth', depthBias=0.1, exponent=2.0)),
    ('DeinterleaveTexture', 'DeinterleaveTexture', {}),
]

EDGES = [
    ('GBufferRaster.depth', 'ForwardLighting.depth'),
    ('EnvMapPass.color', 'ForwardLighting.color'),
    ('RayShadow.visibility', 'ForwardLighting.visibilityBuffer'),
    ('GBufferRaster.posW', 'RayShadow.posW'),
    ('GBufferRaster.normW', 'RayShadow.normalW'),
    ('GBufferRaster.depth', 'EnvMapPass.depth'),
    ('GBufferRaster.depth', 'LinearizeDepth.depth'),
    ('GBufferRaster.mtlData', 'MaterialDoubleSided.mtlData'),
    ('GuardBand', 'GBufferRaster'),
    ('ForwardLighting.color', 'ToneMapper.src'),
    ('LinearizeDepth.linearDepth', 'CrossBilateralBlurBL.linear depth'),
    ('ToneMapper.dst', 'Diffuse.I1'),
    ('LinearizeDepth.linearDepth', 'DeinterleaveDepth.texIn'),
    ('DeinterleaveDepth.texOut', 'HBAO.depth'),
    ('GBufferRaster.faceNormalW', 'HBAO.normals'),
    ('DeinterleaveTexture.texOut', 'HBAO.depth2'),
    ('InterleaveTexture0.texOut', 'CrossBilateralBlurBL.color'),
    ('LinearizeDepth.linearDepth', 'DepthPeeling.linearZ'),
    ('DepthPeeling.depth2', 'DeinterleaveTexture.texIn'),
    ('HBAO.ambientMap', 'InterleaveTexture0.texIn'),
    ('CrossBilateralBlurBL.colorOut', 'Ambient.I0'),
    ('Ambient.out', 'Diffuse.I0'),
]

HBAO = build('HBAO', PASSES, EDGES, ['Ambient.out', 'Diffuse.out'])
try:
    m.addGraph(HBAO)
except NameError:
    pass
