# Golden-image test for the Forward shading path (config-5 shape:
# Forward + TAA flythrough). Exercises textured materials + env map on the
# town tier via ForwardLighting/EnvMapPass.
IMAGE_TEST = {"tolerance": 2e-4, "frames": [1], "scene": "Arcade",
              "width": 96, "height": 96,
              "pass_overrides": {"GBufferRaster": {"maxPerTile": 512},
                                 "ForwardLighting": {"maxPerTile": 512}}}
SCRIPT = "scripts/Forward.py"
