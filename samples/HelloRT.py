# HelloRT — the HelloDXR analogue (reference Source/Samples/HelloDXR:
# a minimal app that raster-renders a scene and shades primary RT hits).
# Here: ray-traced G-buffer -> deferred shade -> tone map, ~20 lines of
# graph description on the public API. Run:
#   python -m rtsdm_tpu.mogwai samples/HelloRT.py --scene CornellBox \
#       --width 256 --height 256 --frames 1 --capture /tmp/hellort
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "scripts"))
from _graphlib import build

PASSES = [
    ('GBufferRT', 'GBufferRT', {}),
    ('EnvMapPass', 'EnvMapPass', {}),
    ('RayShadow', 'RayShadow', {}),
    ('Shade', 'DeferredLighting', dict(envMapIntensity=0.6,
                                       ambientIntensity=0.2,
                                       lightIntensity=1.0)),
    ('ToneMapper', 'ToneMapper', dict(operator='Aces')),
]
EDGES = [
    ('GBufferRT.depth', 'EnvMapPass.depth'),
    ('GBufferRT.posW', 'RayShadow.posW'),
    ('GBufferRT.normW', 'RayShadow.normalW'),
    ('GBufferRT.posW', 'Shade.posW'),
    ('GBufferRT.normW', 'Shade.normW'),
    ('GBufferRT.mtlData', 'Shade.mtlData'),
    ('GBufferRT.texC', 'Shade.texC'),
    ('EnvMapPass.color', 'Shade.color'),
    ('RayShadow.visibility', 'Shade.visibilityBuffer'),
    ('Shade.color', 'ToneMapper.src'),
]

HelloRT = build('HelloRT', PASSES, EDGES, ['ToneMapper.dst'])
try:
    m.addGraph(HelloRT)
except NameError:
    pass
