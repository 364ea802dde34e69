# Golden-image test for the HBAO pipeline (closes SURVEY §4's research-pass
# image-test gap). Small res + small guard band for CPU determinism.
IMAGE_TEST = {"tolerance": 2e-4, "frames": [1], "scene": "CornellBox",
              "width": 96, "height": 96, "guard_band": 8,
              "pass_overrides": {"GBufferRaster": {"maxPerTile": 64},
                                  "DepthPeeling": {"maxPerTile": 64},
                                  "ForwardLighting": {"maxPerTile": 64}}}
SCRIPT = "scripts/HBAO.py"
OUTPUTS = ["Ambient.out", "Diffuse.out"]
