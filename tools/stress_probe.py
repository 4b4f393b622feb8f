"""2x scaling probe for the six at-size stress goldens.

The per-query scaling probe (tools/scaling_probe.py) certifies the
registry operators across sf decades; the six ``scale_stress_*``
pipelines in the bench run at ONE fixed fixture size, so super-linear
drift inside the composed pipelines themselves would go unseen. This
tool re-runs each stress golden at its baseline size and at a doubled
fixture, asserts the closed-form goldens stay green at BOTH sizes (the
goldens are parametric in the size constants — a hard check that
nothing in the closed forms was accidentally baked to the 1x size),
and reports the wall-time ratio against a ~2.3-per-2x bound (raster
doubles its SIDE, i.e. 4x pixels, so its bound is 2.3^2).

Scale plumbing: the modules read ``SPARK_GRAFT_STRESS_SCALE`` at
import. Monkeypatching module constants does NOT work here — Spark's
Python workers unpickle kernel closures by module reference and
re-import the module fresh, so a driver-side patch silently reverts on
the executors (the crawl golden caught exactly this: driver closed
form at 2x vs executor text generation at 1x). Each (family, scale)
configuration therefore runs in its OWN subprocess with the env var
set before the JVM starts, so driver and workers agree by
construction.

Per-family 2x knobs (chosen so the golden scales by construction):

* raster    — GRID_COLS x2 (4x pixels; separate source cache path)
* vector    — PTS_PER_EDGE x2 (2x coordinate bytes, coverage unchanged)
* crawl     — N_DOCS x2 (WAVE derives from it)
* export    — N_DOCS x2
* video     — N_VIDEOS x2
* lakehouse — N_DOCS x2

Usage: python tools/stress_probe.py [family ...]     # default: all six
Prints one JSON line; SCALING.md quotes a representative run.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

MODULES = {
    "raster": "gfw_pixetl_spark.harness.scale_stress",
    "vector": "gfw_pixetl_spark.harness.scale_stress_vector",
    "crawl": "gfw_pixetl_spark.harness.scale_stress_crawl",
    "export": "gfw_pixetl_spark.harness.scale_stress_export",
    "video": "gfw_pixetl_spark.harness.scale_stress_video",
    "lakehouse": "gfw_pixetl_spark.harness.scale_stress_lakehouse",
}

_CHILD = """
import importlib, json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from gfw_pixetl_spark.session import get_spark
mod = importlib.import_module({mod!r})
spark = get_spark("stress-probe")
spark.sparkContext.setLogLevel("ERROR")
work = tempfile.mkdtemp(prefix="stress_probe_")
try:
    t0 = time.perf_counter()
    facts = mod.run(spark, work)
    wall = time.perf_counter() - t0
    failures = mod.verify_outputs(facts)
    wall -= float(facts.get("sec_source_build", 0.0))
    print(json.dumps({{"wall": wall, "failures": failures}}))
finally:
    shutil.rmtree(work, ignore_errors=True)
"""


def _one_run(family: str, scale: int) -> float:
    env = dict(os.environ, SPARK_GRAFT_STRESS_SCALE=str(scale))
    code = _CHILD.format(repo=str(REPO), mod=MODULES[family])
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, cwd=REPO)
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() \
        else ""
    if proc.returncode != 0 or not line.startswith("{"):
        raise SystemExit(
            f"{family} x{scale} child failed:\n{proc.stderr[-2000:]}")
    out = json.loads(line)
    if out["failures"]:
        raise SystemExit(
            f"GOLDEN FAILED at x{scale} for {family}: {out['failures']}")
    return float(out["wall"])


def main() -> None:
    names = sys.argv[1:] or list(MODULES)
    out = {}
    for name in names:
        t1 = _one_run(name, 1)
        t2 = _one_run(name, 2)
        data_factor = 4 if name == "raster" else 2
        bound = 2.3 ** 2 if data_factor == 4 else 2.3
        ratio = round(t2 / t1, 2)
        out[name] = {
            "sec_1x": round(t1, 2), "sec_2x": round(t2, 2),
            "data_factor": data_factor, "ratio": ratio,
            "bound": round(bound, 2), "ok": ratio <= bound,
        }
        print(f"{name}: {t1:.1f}s -> {t2:.1f}s ratio {ratio} "
              f"(x{data_factor} data, bound {bound:.2f}) "
              f"{'ok' if ratio <= bound else 'OVER'}", file=sys.stderr)
    print(json.dumps(out))
    if not all(v["ok"] for v in out.values()):
        raise SystemExit(1)


if __name__ == "__main__":
    main()

