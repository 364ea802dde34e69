# 512x512 golden (VERDICT r2 weak #6: all refs were <= 128^2).
IMAGE_TEST = {"tolerance": 2e-4, "frames": [1], "scene": "CornellBox",
              "width": 512, "height": 512, "guard_band": 16}
SCRIPT = "scripts/HBAO.py"
OUTPUTS = ["Ambient.out"]
