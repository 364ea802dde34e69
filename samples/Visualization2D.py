# Visualization2D — the reference sample draws 2D diagnostics. Analogue:
# linear-depth false-color + normal visualization via SceneDebugger and
# ColorMapPass side by side.
#   python -m rtsdm_tpu.mogwai samples/Visualization2D.py --scene CornellBox \
#       --width 384 --height 192 --frames 1 --capture /tmp/vis2d
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "scripts"))
from _graphlib import build

PASSES = [
    ('GBufferRaster', 'GBufferRaster', {}),
    ('LinearizeDepth', 'LinearizeDepth', {}),
    ('ColorMap', 'ColorMapPass', dict(colorMap='Viridis', autoRange=True)),
    ('Normals', 'SceneDebugger', dict(mode='FaceNormal')),
    ('SideBySide', 'SideBySidePass', dict(splitLocation=0.5)),
]
EDGES = [
    ('GBufferRaster.depth', 'LinearizeDepth.depth'),
    ('LinearizeDepth.linearDepth', 'ColorMap.input'),
    ('GBufferRaster.faceNormalW', 'Normals.faceNormalW'),
    ('ColorMap.output', 'SideBySide.leftInput'),
    ('Normals.output', 'SideBySide.rightInput'),
]

Vis2D = build('Visualization2D', PASSES, EDGES, ['SideBySide.output'])
try:
    m.addGraph(Vis2D)
except NameError:
    pass
