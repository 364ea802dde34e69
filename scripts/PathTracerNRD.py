# Path tracer + NRD denoiser graph (reference scripts/PathTracerNRD.py).
# The dual path of the reference: a reference accumulate chain, and an
# NRD-denoised chain where each "NRD" instance runs the SVGF-grade
# spatiotemporal filter (passes/nrd.py) over its demodulated
# radiance+hitDist channels before ModulateIllumination recombines them.
# DLSS remains a declared vendor stub (passes/stubs.py).
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
    # NRD path (reference scripts/PathTracerNRD.py:17-34)
    ('NRDDiffuseSpecular', 'NRD', dict(maxIntensity=250.0)),
    ('NRDDeltaReflection', 'NRD', dict(method='RelaxDiffuse', maxIntensity=250.0,
                                       worldSpaceMotion=False,
                                       enableReprojectionTestSkippingWithoutMotion=True,
                                       spatialVarianceEstimationHistoryThreshold=1)),
    ('NRDDeltaTransmission', 'NRD', dict(method='RelaxDiffuse', maxIntensity=250.0,
                                         worldSpaceMotion=False,
                                         enableReprojectionTestSkippingWithoutMotion=True)),
    ('NRDReflectionMotionVectors', 'NRD', dict(method='SpecularReflectionMv',
                                               worldSpaceMotion=False)),
    ('NRDTransmissionMotionVectors', 'NRD', dict(method='SpecularDeltaMv',
                                                 worldSpaceMotion=False)),
    ('ModulateIllumination', 'ModulateIllumination', dict(useResidualRadiance=False)),
    ('DLSS', 'DLSSPass', dict(enabled=True, profile='Balanced',
                              motionVectorScale='Relative', isHDR=True,
                              sharpness=0.0, exposure=0.0)),
    ('ToneMapperNRD', 'ToneMapper', dict(autoExposure=False,
                                         exposureCompensation=0.0)),
]
EDGES = [
    ('GBufferRT.vbuffer', 'PathTracer.vbuffer'),
    ('GBufferRT.viewW', 'PathTracer.viewW'),
    # reference chain
    ('PathTracer.color', 'AccumulatePass.input'),
    ('AccumulatePass.output', 'ToneMapperReference.src'),
    # NRD diffuse+specular chain
    ('PathTracer.nrdDiffuseRadianceHitDist', 'NRDDiffuseSpecular.diffuseRadianceHitDist'),
    ('PathTracer.nrdSpecularRadianceHitDist', 'NRDDiffuseSpecular.specularRadianceHitDist'),
    ('GBufferRT.mvecW', 'NRDDiffuseSpecular.mvec'),
    ('GBufferRT.normWRoughnessMaterialID', 'NRDDiffuseSpecular.normWRoughnessMaterialID'),
    ('GBufferRT.linearZ', 'NRDDiffuseSpecular.viewZ'),
    # reflection motion vectors
    ('PathTracer.nrdDeltaReflectionHitDist', 'NRDReflectionMotionVectors.specularHitDist'),
    ('GBufferRT.linearZ', 'NRDReflectionMotionVectors.viewZ'),
    ('GBufferRT.normWRoughnessMaterialID', 'NRDReflectionMotionVectors.normWRoughnessMaterialID'),
    ('GBufferRT.mvec', 'NRDReflectionMotionVectors.mvec'),
    # delta reflection chain
    ('PathTracer.nrdDeltaReflectionRadianceHitDist', 'NRDDeltaReflection.diffuseRadianceHitDist'),
    ('NRDReflectionMotionVectors.reflectionMvec', 'NRDDeltaReflection.mvec'),
    ('PathTracer.nrdDeltaReflectionNormWRoughMaterialID', 'NRDDeltaReflection.normWRoughnessMaterialID'),
    ('PathTracer.nrdDeltaReflectionPathLength', 'NRDDeltaReflection.viewZ'),
    # transmission motion vectors
    ('GBufferRT.posW', 'NRDTransmissionMotionVectors.deltaPrimaryPosW'),
    ('PathTracer.nrdDeltaTransmissionPosW', 'NRDTransmissionMotionVectors.deltaSecondaryPosW'),
    ('GBufferRT.mvec', 'NRDTransmissionMotionVectors.mvec'),
    # delta transmission chain
    ('PathTracer.nrdDeltaTransmissionRadianceHitDist', 'NRDDeltaTransmission.diffuseRadianceHitDist'),
    ('NRDTransmissionMotionVectors.deltaMvec', 'NRDDeltaTransmission.mvec'),
    ('PathTracer.nrdDeltaTransmissionNormWRoughMaterialID', 'NRDDeltaTransmission.normWRoughnessMaterialID'),
    ('PathTracer.nrdDeltaTransmissionPathLength', 'NRDDeltaTransmission.viewZ'),
    # recombine
    ('PathTracer.nrdEmission', 'ModulateIllumination.emission'),
    ('PathTracer.nrdDiffuseReflectance', 'ModulateIllumination.diffuseReflectance'),
    ('NRDDiffuseSpecular.filteredDiffuseRadianceHitDist', 'ModulateIllumination.diffuseRadiance'),
    ('PathTracer.nrdSpecularReflectance', 'ModulateIllumination.specularReflectance'),
    ('NRDDiffuseSpecular.filteredSpecularRadianceHitDist', 'ModulateIllumination.specularRadiance'),
    ('PathTracer.nrdDeltaReflectionEmission', 'ModulateIllumination.deltaReflectionEmission'),
    ('PathTracer.nrdDeltaReflectionReflectance', 'ModulateIllumination.deltaReflectionReflectance'),
    ('NRDDeltaReflection.filteredDiffuseRadianceHitDist', 'ModulateIllumination.deltaReflectionRadiance'),
    ('PathTracer.nrdDeltaTransmissionEmission', 'ModulateIllumination.deltaTransmissionEmission'),
    ('PathTracer.nrdDeltaTransmissionReflectance', 'ModulateIllumination.deltaTransmissionReflectance'),
    ('NRDDeltaTransmission.filteredDiffuseRadianceHitDist', 'ModulateIllumination.deltaTransmissionRadiance'),
    ('PathTracer.nrdResidualRadianceHitDist', 'ModulateIllumination.residualRadiance'),
    # upscale + tonemap
    ('GBufferRT.mvec', 'DLSS.mvec'),
    ('GBufferRT.linearZ', 'DLSS.depth'),
    ('ModulateIllumination.output', 'DLSS.color'),
    ('DLSS.output', 'ToneMapperNRD.src'),
]
g = build('PathTracerNRD', PASSES, EDGES,
          ['ToneMapperNRD.dst', 'ToneMapperReference.dst'])
try:
    m.addGraph(g)
except NameError:
    pass
