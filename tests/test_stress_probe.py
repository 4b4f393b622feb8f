"""The 2x stress-probe scale knob (SPARK_GRAFT_STRESS_SCALE).

The constants must scale at IMPORT time from the environment — not by
driver-side monkeypatching — because Spark's Python workers re-import
the stress modules when unpickling kernel closures; a patched driver
constant with an unpatched executor constant produces structurally
different fixtures and the crawl golden fails (see
tools/stress_probe.py). These tests import each module in a subprocess
with the env var set, exactly the way both the probe's driver AND a
Spark worker see it.
"""

import json
import subprocess
import sys

import pytest

CASES = [
    ("gfw_pixetl_spark.harness.scale_stress",
     ["GRID_COLS", "SRC_PIXELS"], [8192, 16384]),
    ("gfw_pixetl_spark.harness.scale_stress_vector",
     ["PTS_PER_EDGE"], [104]),
    ("gfw_pixetl_spark.harness.scale_stress_crawl",
     ["N_DOCS", "WAVE"], [24_000, 12_000]),
    ("gfw_pixetl_spark.harness.scale_stress_export",
     ["N_DOCS"], [120_000]),
    ("gfw_pixetl_spark.harness.scale_stress_video",
     ["N_VIDEOS"], [3_000]),
    ("gfw_pixetl_spark.harness.scale_stress_lakehouse",
     ["N_DOCS"], [400_000]),
]


def _import_consts(mod: str, names: list[str], scale: str | None):
    code = (
        "import json, importlib\n"
        f"m = importlib.import_module({mod!r})\n"
        f"print(json.dumps([getattr(m, n) for n in {names!r}]))\n"
    )
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin"}
    if scale is not None:
        env["SPARK_GRAFT_STRESS_SCALE"] = scale
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.parametrize("mod,names,base", CASES)
def test_scale_knob_multiplies_at_import(mod, names, base):
    assert _import_consts(mod, names, None) == base
    assert _import_consts(mod, names, "2") == [2 * b for b in base]


def test_raster_scaled_source_path_is_separate():
    (p1,) = _import_consts("gfw_pixetl_spark.harness.scale_stress",
                           ["SOURCE_PATH"], None)
    (p2,) = _import_consts("gfw_pixetl_spark.harness.scale_stress",
                           ["SOURCE_PATH"], "2")
    assert p1 != p2  # a scaled run must never touch the 1x cache
