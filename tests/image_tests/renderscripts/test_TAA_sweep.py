# Parameter sweep in one test file — the reference's image-test idiom
# (tests/image_tests/renderpasses/test_TAA.py loops alpha/colorBoxSigma).
IMAGE_TEST = {"tolerance": 2e-4, "frames": [2], "scene": "CornellBox",
              "width": 96, "height": 96,
              "pass_overrides": {"TAA": {"alpha": 0.05, "colorBoxSigma": 0.5}}}
SCRIPT = "scripts/Forward.py"
