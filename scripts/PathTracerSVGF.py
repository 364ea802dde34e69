# Path tracer denoised by SVGF (reference SVGFPass wiring: demodulated
# 1-spp path-traced illumination -> temporal reprojection + variance-guided
# a-trous; compare reference scripts using SVGFPass).
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _graphlib import build

PASSES = [
    ('GBufferRaster', 'GBufferRaster', {}),
    ('LinearizeDepth', 'LinearizeDepth', {}),
    ('PathTracer', 'PathTracer', dict(samplesPerPixel=1)),
    ('SVGFPass', 'SVGFPass', dict(Iterations=4)),
    ('ToneMapper', 'ToneMapper', dict(operator='Aces', clamp=True)),
]
EDGES = [
    ('GBufferRaster.depth', 'LinearizeDepth.depth'),
    ('PathTracer.color', 'SVGFPass.Color'),
    ('GBufferRaster.normW', 'SVGFPass.WorldNormal'),
    ('LinearizeDepth.linearDepth', 'SVGFPass.LinearZ'),
    ('GBufferRaster.mvec', 'SVGFPass.MotionVec'),
    ('SVGFPass.Filtered', 'ToneMapper.src'),
]
g = build('PathTracerSVGF', PASSES, EDGES,
          ['ToneMapper.dst', 'SVGFPass.Filtered'])
try:
    m.addGraph(g)
except NameError:
    pass
