# Path tracer + NRD denoiser graph (reference scripts/PathTracerNRD.py).
# NRDPass and DLSSPass are declared vendor stubs (passes/stubs.py); the graph
# keeps the reference's dual path: a reference accumulate chain and an
# NRD-denoised chain, both tone-mapped.
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _graphlib import build

PASSES = [
    ('GBufferRT', 'GBufferRT', dict(samplePattern='Halton', sampleCount=32,
                                    useAlphaTest=True)),
    ('PathTracer', 'PathTracer', dict(samplesPerPixel=1, maxSurfaceBounces=10,
                                      useRussianRoulette=True)),
    # reference path
    ('AccumulatePass', 'AccumulatePass', dict(enabled=True, precisionMode='Single')),
    ('ToneMapperReference', 'ToneMapper', dict(autoExposure=False,
                                               exposureCompensation=0.0)),
    # NRD path (vendor stubs preserve the wiring)
    ('NRDDiffuseSpecular', 'NRDPass', dict()),
    ('ModulateIllumination', 'ModulateIllumination', dict(useResidualRadiance=False)),
    ('DLSS', 'DLSSPass', dict(enabled=True, profile='Balanced',
                              motionVectorScale='Relative', isHDR=True,
                              sharpness=0.0, exposure=0.0)),
    ('ToneMapperNRD', 'ToneMapper', dict(autoExposure=False,
                                         exposureCompensation=0.0)),
]
EDGES = [
    ('GBufferRT.vbuffer', 'PathTracer.vbuffer'),
    ('GBufferRT.mvec', 'PathTracer.mvec'),
    # reference chain
    ('PathTracer.color', 'AccumulatePass.input'),
    ('AccumulatePass.output', 'ToneMapperReference.src'),
    # NRD chain
    ('PathTracer.color', 'NRDDiffuseSpecular.radiance'),
    ('GBufferRT.mvec', 'NRDDiffuseSpecular.mvec'),
    ('GBufferRT.normW', 'NRDDiffuseSpecular.normal'),
    ('NRDDiffuseSpecular.filteredRadiance', 'ModulateIllumination.diffuseRadiance'),
    ('ModulateIllumination.output', 'DLSS.color'),
    ('GBufferRT.mvec', 'DLSS.mvec'),
    ('GBufferRT.depth', 'DLSS.depth'),
    ('DLSS.output', 'ToneMapperNRD.src'),
]
g = build('PathTracerNRD', PASSES, EDGES,
          ['ToneMapperNRD.dst', 'ToneMapperReference.dst'])
try:
    m.addGraph(g)
except NameError:
    pass
