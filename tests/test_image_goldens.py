"""Golden-image regression tier (the reference's run_image_tests.py tier,
SURVEY §4.2) — runs the discovered image tests against committed references."""
from rtsdm_tpu.testing.image_tests import run_all


def test_image_goldens():
    report = run_all()
    bad = [r for r in report["results"] if r["status"] == "fail"]
    assert not bad, bad
    # missing refs are generated on first run — fail CI if that happened so
    # they get committed deliberately
    missing = [r["name"] for r in report["results"] if r["status"] == "missing_ref"]
    assert not missing, f"golden refs generated, commit them: {missing}"
