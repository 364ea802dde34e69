"""Pin the regenerated sample/dither/jitter tables to the reference's literal
constants, so numerical parity of the deterministic inputs is locked by
assertion rather than by docstring.

Literal sources (transcribed as data constants of the technique):
  - sampleRadius tables:  /root/reference/Source/RenderPasses/SVAO/Common.slang:51-68
  - 4x4 ordered dither:   /root/reference/Source/RenderPasses/SVAO/SVAO.cpp:670-674
  - 4x4 sub-texel jitter: /root/reference/Source/RenderPasses/StochasticDepthMapRT/Jitter.slangh:20
"""
import numpy as np

from rtsdm_tpu.utils.sampling import (
    AO_KERNEL_HBAO,
    AO_KERNEL_VAO,
    DITHER_4X4,
    JITTER_4X4,
    sample_radius_table,
)

# Common.slang:52 (VAO, NUM_DIRECTIONS==8) — printed there at 6 decimals.
REF_VAO_8 = [0.917883, 0.564429, 0.734504, 0.359545,
             0.820004, 0.470149, 0.650919, 0.205215]
# Common.slang:54 (VAO, 16) — full double precision in the reference.
REF_VAO_16 = [0.949098221604059, 0.5865639019441775, 0.7554681720909893,
              0.3895439574863043, 0.8425560503012255, 0.4948003867747738,
              0.6719196866381647, 0.25203100417434543, 0.8908588816103737,
              0.5418210823278604, 0.7136427497994143, 0.32724136087586453,
              0.7980920320691521, 0.4445340224611676, 0.6297373536812639,
              0.1447182620692375]
# Common.slang:56 (VAO, 32).
REF_VAO_32 = [0.9682458365518543, 0.5974803093982587, 0.7660169295429302,
              0.4038472576817624, 0.8541535023444914, 0.5068159098187986,
              0.6823727109604635, 0.2726076670970059, 0.904018191941786,
              0.5531894754180758, 0.7240656647095169, 0.34372202910162664,
              0.8089818132350507, 0.45747336127867605, 0.640354849019649,
              0.17748061996818404, 0.9327350969376332, 0.5755500192397054,
              0.7449678114312224, 0.37479566486456295, 0.8311856199411515,
              0.4825843210309559, 0.6614378277661477, 0.22975243551455923,
              0.878233108646881, 0.5303115209931901, 0.7032256306171377,
              0.3099952198410562, 0.7873133907642258, 0.43130429537268,
              0.6190581352335289, 0.10219580968897692]
# Common.slang:61 (HBAO, 8).
REF_HBAO_8 = [0.019897607325877215, 0.3239192018939078, 0.15013283288204182,
              0.5608856339193332, 0.07874804859295396, 0.4306374970658152,
              0.23159241868180838, 0.74770696488701]
# Common.slang:63 (HBAO, 16).
REF_HBAO_16 = [0.008364792005390745, 0.29968419137477154, 0.13131974798930376,
               0.5251597224509892, 0.06264063727314514, 0.40226410430222115,
               0.21027995621089465, 0.6906178807859765, 0.03303993608633204,
               0.34903099295095424, 0.16956281924775551, 0.5996160679614535,
               0.09559795810145842, 0.46040865279052423, 0.25357218870257175,
               0.8218290863578166]
# Common.slang:65 (HBAO, 32).
REF_HBAO_32 = [0.0035168784979124203, 0.28787249889929795, 0.12214740408236834,
               0.5082189968610005, 0.05489041689357717, 0.38854375322009427,
               0.19986558164830323, 0.6656225173745592, 0.02630214826181389,
               0.33636038195532914, 0.15977097044845298, 0.579825376399601,
               0.08708424832212604, 0.44533522627083877, 0.24249692822679572,
               0.7816464549941924, 0.013886447731081395, 0.3116969449839127,
               0.14064876764650994, 0.5426920213922799, 0.07059703986067731,
               0.41628837439340993, 0.22085459126773643, 0.7177502077720759,
               0.04006955250785802, 0.36194276200351894, 0.17950859741413544,
               0.6203897476558216, 0.10428292232859922, 0.47588885313824597,
               0.2648228762567681, 0.8740952987729764]

# SVAO.cpp:670-674 genNoiseTexture ditherValues (row-major), quantized there
# as uint8(v / 16 * 255) and sampled back as unorm8.
REF_DITHER = [0.0, 8.0, 2.0, 10.0,
              12.0, 4.0, 14.0, 6.0,
              3.0, 11.0, 1.0, 9.0,
              15.0, 7.0, 13.0, 5.0]

# Jitter.slangh:20 jitterPos[16] (x, y interleaved).
REF_JITTER = [
    (0.6483604982495308, 0.914070401340723),
    (0.7279119342565536, 0.1037941575050354),
    (0.48886989802122116, 0.699178121984005),
    (0.3848271369934082, 0.25951504334807396),
    (0.1555836834013462, 0.8020274639129639),
    (0.2205628715455532, 0.2412630058825016),
    (0.9962188489735126, 0.5846633277833462),
    (0.8776040785014629, 0.3954884633421898),
    (0.9271227307617664, 0.831196017563343),
    (0.9490576796233654, 0.14202157780528069),
    (0.20916065946221352, 0.5476771481335163),
    (0.16468944773077965, 0.4869129806756973),
    (0.43544455617666245, 0.9515445046126842),
    (0.44085410237312317, 0.011881716549396515),
    (0.7173641100525856, 0.6695209294557571),
    (0.6563677340745926, 0.35924511030316353),
]


def test_vao_radius_tables_match_reference():
    # The 8-entry table is printed at 6 decimals in the reference; 16/32 at
    # full precision. float32 storage bounds the achievable tolerance.
    np.testing.assert_allclose(
        sample_radius_table(8, AO_KERNEL_VAO), REF_VAO_8, atol=5e-7)
    np.testing.assert_allclose(
        sample_radius_table(16, AO_KERNEL_VAO), REF_VAO_16, atol=1e-7)
    np.testing.assert_allclose(
        sample_radius_table(32, AO_KERNEL_VAO), REF_VAO_32, atol=1e-7)


def test_hbao_radius_tables_match_reference():
    np.testing.assert_allclose(
        sample_radius_table(8, AO_KERNEL_HBAO), REF_HBAO_8, atol=1e-7)
    np.testing.assert_allclose(
        sample_radius_table(16, AO_KERNEL_HBAO), REF_HBAO_16, atol=1e-7)
    np.testing.assert_allclose(
        sample_radius_table(32, AO_KERNEL_HBAO), REF_HBAO_32, atol=1e-7)


def test_dither_matrix_matches_reference_quantization():
    want = np.floor(np.asarray(REF_DITHER, np.float32).reshape(4, 4)
                    / 16.0 * 255.0) / 255.0
    np.testing.assert_array_equal(DITHER_4X4, want.astype(np.float32))


def test_jitter_table_matches_reference():
    want = np.asarray(REF_JITTER, np.float32)
    np.testing.assert_array_equal(JITTER_4X4, want)
