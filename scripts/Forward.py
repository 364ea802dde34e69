# Forward-shaded pipeline with shadow rays and TAA (reference Forward graph).
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _graphlib import build

PASSES = [
    ('GBufferRaster', 'GBufferRaster', dict(sampleCount=8, cull='Back')),
    ('EnvMapPass', 'EnvMapPass', {}),
    ('RayShadow', 'RayShadow', {}),
    ('ForwardLighting', 'ForwardLighting', dict(envMapIntensity=0.5, ambientIntensity=0.3, lightIntensity=0.7)),
    ('ToneMapper', 'ToneMapper', dict(operator='Aces', clamp=True)),
    ('TAA', 'TAA', dict(alpha=0.1, colorBoxSigma=0.5, antiFlicker=True)),
]

EDGES = [
    ('GBufferRaster.depth', 'EnvMapPass.depth'),
    ('GBufferRaster.depth', 'ForwardLighting.depth'),
    ('GBufferRaster.posW', 'RayShadow.posW'),
    ('GBufferRaster.normW', 'RayShadow.normalW'),
    ('EnvMapPass.color', 'ForwardLighting.color'),
    ('RayShadow.visibility', 'ForwardLighting.visibilityBuffer'),
    ('ForwardLighting.color', 'ToneMapper.src'),
    ('ToneMapper.dst', 'TAA.colorIn'),
    ('GBufferRaster.mvec', 'TAA.motionVecs'),
]

Forward = build('Forward', PASSES, EDGES, ['TAA.colorOut', 'ToneMapper.dst'])
try:
    m.addGraph(Forward)
except NameError:
    pass
