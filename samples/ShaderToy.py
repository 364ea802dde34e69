# ShaderToy — the reference sample of the same name (a full-screen
# procedural shader). The ImageEquation pass IS the shader surface: its
# formula DSL runs per pixel over xy/time. Run:
#   python -m rtsdm_tpu.mogwai samples/ShaderToy.py --scene CornellBox \
#       --width 512 --height 288 --frames 8 --capture /tmp/shadertoy
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "scripts"))
from _graphlib import build

PASSES = [
    # animated plasma: pure function of pixel position + frame time
    ('Toy', 'ImageEquation',
     dict(formula='float3(0.5 + 0.5*sin(0.02*x + time),'
                  ' 0.5 + 0.5*sin(0.013*y - 0.7*time),'
                  ' 0.5 + 0.5*sin(0.009*(x+y) + 1.3*time))',
          format='RGBA32Float')),
    ('ToneMapper', 'ToneMapper', dict(operator='Linear', clamp=True)),
]
EDGES = [('Toy.out', 'ToneMapper.src')]

ShaderToy = build('ShaderToy', PASSES, EDGES, ['ToneMapper.dst'])
try:
    m.addGraph(ShaderToy)
except NameError:
    pass
