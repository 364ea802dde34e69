# Full SVAO research pipeline (BASELINE configs 2-4 shape) with temporal AO,
# benchmark/recording tooling and the DLSS slot. Pass names and wiring follow
# the reference's shipped SVAO graph (SURVEY §2.4).
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _graphlib import build

SVAO_PROPS = dict(radius=0.2, primaryDepthMode='SingleDepth',
                  secondaryDepthMode='StochasticDepth', exponent=2.0,
                  rayPipeline=True, thickness=0.0, stochMapDivisor=4,
                  dualAO=False, alphaTest=True)
TAA_PROPS = dict(alpha=0.1, antiFlicker=True)

PASSES = [
    ('GBufferRaster', 'GBufferRaster', dict(sampleCount=8, useAlphaTest=True, cull='Back')),
    ('LinearizeDepth', 'LinearizeDepth', {}),
    ('RayShadow', 'RayShadow', {}),
    ('DepthPeeling', 'DepthPeeling', dict(cullMode='Back', minSeparationDistance=0.01)),
    ('GuardBand', 'GuardBand', dict(guardBand=64)),
    ('ToneMapper', 'ToneMapper', dict(operator='Linear', clamp=False)),
    ('SVAO', 'SVAO', SVAO_PROPS),
    ('CrossBilateralBlur0', 'CrossBilateralBlur', {}),
    ('DiffuseRef', 'ImageEquation', dict(formula='I0[xy].r * I1[xy]', format='RGBA32Float')),
    ('AmbientRef', 'ImageEquation', dict(formula='I0[xy].rrra', format='RGBA32Float')),
    ('DepthPass', 'DepthPass', dict(cullMode='Back')),
    ('DiffuseTAA', 'TAA', dict(colorBoxSigma=0.5, **TAA_PROPS)),
    ('AmbientTAA', 'TAA', dict(colorBoxSigma=1.0, **TAA_PROPS)),
    ('ForwardLighting', 'ForwardLighting', dict(envMapIntensity=0.25, ambientIntensity=0.25, lightIntensity=0.5)),
    ('EnvMapPass', 'EnvMapPass', {}),
    ('CompressNormals', 'CompressNormals', dict(viewSpace=True, use16Bit=True)),
    ('AccumulatePass', 'AccumulatePass', dict(enabled=True, autoReset=True)),
    ('PathBenchmark', 'PathBenchmark', {}),
    ('AOFlickerMask', 'AOFlickerMask', {}),
    ('TemporalAO', 'TemporalAO', dict(enabled=False, useStableMask=True)),
    ('AOSwitch', 'Switch', dict(count=2, selected=1, i0='Default', i1='TemporalAO')),
    ('BinaryDilation', 'BinaryDilation', dict(op='min')),
    ('VideoRecorder', 'VideoRecorder', {}),
    ('LinearizeDepth0', 'LinearizeDepth', {}),
    ('RayMinMaxLength', 'RayMinMaxLength', {}),
    ('DiffuseDLSS', 'DLSSPass', dict(enabled=True, profile='Balanced')),
]

EDGES = [
    ('GBufferRaster.posW', 'RayShadow.posW'),
    ('GBufferRaster.normW', 'RayShadow.normalW'),
    ('GBufferRaster.depth', 'LinearizeDepth.depth'),
    ('GBufferRaster.depth', 'SVAO.gbufferDepth'),
    ('ToneMapper.dst', 'SVAO.color'),
    ('LinearizeDepth.linearDepth', 'DepthPeeling.linearZ'),
    ('GuardBand', 'GBufferRaster'),
    ('SVAO.ao', 'CrossBilateralBlur0.color'),
    ('LinearizeDepth.linearDepth', 'CrossBilateralBlur0.linear depth'),
    ('ToneMapper.dst', 'DiffuseRef.I1'),
    ('DepthPass', 'GBufferRaster'),
    ('DiffuseRef.out', 'DiffuseTAA.colorIn'),
    ('AmbientRef.out', 'AmbientTAA.colorIn'),
    ('GBufferRaster.mvec', 'AmbientTAA.motionVecs'),
    ('GBufferRaster.mvec', 'DiffuseTAA.motionVecs'),
    ('GBufferRaster.depth', 'ForwardLighting.depth'),
    ('GBufferRaster.depth', 'EnvMapPass.depth'),
    ('EnvMapPass.color', 'ForwardLighting.color'),
    ('ForwardLighting.color', 'ToneMapper.src'),
    ('GBufferRaster.faceNormalW', 'CompressNormals.normalW'),
    ('DiffuseRef.out', 'AccumulatePass.input'),
    ('RayShadow.visibility', 'ForwardLighting.visibilityBuffer'),
    ('DiffuseTAA', 'PathBenchmark'),
    ('LinearizeDepth.linearDepth', 'AOFlickerMask.linearZ'),
    ('GBufferRaster.faceNormalW', 'AOFlickerMask.normalW'),
    ('CrossBilateralBlur0.colorOut', 'TemporalAO.aoIn'),
    ('LinearizeDepth.linearDepth', 'TemporalAO.linearZ'),
    ('GBufferRaster.mvec', 'TemporalAO.mvec'),
    ('CrossBilateralBlur0.colorOut', 'AOSwitch.i0'),
    ('TemporalAO.aoOut', 'AOSwitch.i1'),
    ('AOSwitch.out', 'AmbientRef.I0'),
    ('AOSwitch.out', 'DiffuseRef.I0'),
    ('AOFlickerMask.mask', 'BinaryDilation.input'),
    ('BinaryDilation.output', 'TemporalAO.stableMask'),
    ('VideoRecorder', 'GBufferRaster'),
    ('DepthPeeling.depth2', 'LinearizeDepth0.depth'),
    ('LinearizeDepth0.linearDepth', 'SVAO.depth2'),
    ('CompressNormals.normalOut', 'SVAO.normals'),
    ('SVAO.internalRayMin', 'RayMinMaxLength.kRayMin'),
    ('SVAO.internalRayMax', 'RayMinMaxLength.kRayMax'),
    ('LinearizeDepth.linearDepth', 'SVAO.depth'),
    ('GBufferRaster.mvec', 'DiffuseDLSS.mvec'),
    ('GBufferRaster.depth', 'DiffuseDLSS.depth'),
    ('DiffuseRef.out', 'DiffuseDLSS.color'),
]

OUTPUTS = ['AmbientRef.out', 'DiffuseRef.out', 'AmbientTAA.colorOut',
           'DiffuseTAA.colorOut', 'DiffuseDLSS.output']

SVAO = build('SVAO', PASSES, EDGES, OUTPUTS)
try:
    m.addGraph(SVAO)
except NameError:
    pass
