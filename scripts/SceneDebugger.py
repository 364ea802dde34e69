# Scene debugger graph (reference scripts/SceneDebugger.py). The reference
# pass pulls G-buffer data through the scene block; ours consumes the
# GBufferRaster channels explicitly (same visualization modes).
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _graphlib import build

PASSES = [
    ('GBufferRaster', 'GBufferRaster', {}),
    ('SceneDebugger', 'SceneDebugger', dict(mode='FaceNormal')),
]
EDGES = [
    ('GBufferRaster.depth', 'SceneDebugger.depth'),
    ('GBufferRaster.normW', 'SceneDebugger.normW'),
    ('GBufferRaster.faceNormalW', 'SceneDebugger.faceNormalW'),
    ('GBufferRaster.texC', 'SceneDebugger.texC'),
    ('GBufferRaster.mvec', 'SceneDebugger.mvec'),
    ('GBufferRaster.mtlData', 'SceneDebugger.mtlData'),
]
g = build('SceneDebugger', PASSES, EDGES, ['SceneDebugger.output'])
try:
    m.addGraph(g)
except NameError:
    pass
