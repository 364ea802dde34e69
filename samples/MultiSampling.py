# MultiSampling — the reference sample renders one triangle with MSAA.
# The TPU analogue: jittered accumulation over sample-pattern positions
# (AccumulatePass + per-frame camera jitter = the supersampling loop).
#   python -m rtsdm_tpu.mogwai samples/MultiSampling.py --scene CornellBox \
#       --width 256 --height 256 --frames 8 --capture /tmp/msaa
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "scripts"))
from _graphlib import build

PASSES = [
    ('GBufferRaster', 'GBufferRaster', dict(samplePattern='Halton',
                                            sampleCount=8)),
    ('EnvMapPass', 'EnvMapPass', {}),
    ('Shade', 'ForwardLighting', dict(envMapIntensity=0.5,
                                      ambientIntensity=0.3)),
    ('Accumulate', 'AccumulatePass', dict(enabled=True, precisionMode='Single')),
    ('ToneMapper', 'ToneMapper', dict(operator='Aces')),
]
EDGES = [
    ('GBufferRaster.depth', 'Shade.depth'),
    ('GBufferRaster.depth', 'EnvMapPass.depth'),
    ('EnvMapPass.color', 'Shade.color'),
    ('Shade.color', 'Accumulate.input'),
    ('Accumulate.output', 'ToneMapper.src'),
]

MultiSampling = build('MultiSampling', PASSES, EDGES, ['ToneMapper.dst'])
try:
    m.addGraph(MultiSampling)
except NameError:
    pass
