"""2x scaling probe for the six at-size stress goldens.

The per-query scaling probe (tools/scaling_probe.py) certifies the
registry operators across sf decades; the six ``scale_stress_*``
pipelines in the bench run at ONE fixed fixture size, so super-linear
drift inside the composed pipelines themselves would go unseen. This
tool re-runs each stress golden at its baseline size and at a doubled
fixture, asserts the closed-form goldens stay green at BOTH sizes
(the goldens are parametric in the size constants — a hard check that
nothing in the closed forms was accidentally baked to the 1x size),
and reports the wall-time ratio against a ~2.3-per-2x bound (raster
doubles its SIDE, i.e. 4x pixels, so its bound is 2.3^2).

Per-family scale knobs (chosen so the golden scales by construction):

* raster    — GRID_COLS x2 (4x pixels; separate source cache path)
* vector    — PTS_PER_EDGE x2 (2x coordinate bytes, coverage unchanged)
* crawl     — N_DOCS x2 (WAVE recomputed)
* export    — N_DOCS x2
* video     — N_VIDEOS x2
* lakehouse — N_DOCS x2

Usage: python tools/stress_probe.py [family ...]   # default: all six
Prints one JSON line; SCALING.md quotes a representative run.
"""

from __future__ import annotations

import importlib
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gfw_pixetl_spark.session import get_spark


def _scale_raster(m, k: int) -> int:
    m.GRID_COLS = m.GRID_COLS * k
    m.SRC_PIXELS = 2 * m.GRID_COLS
    m.SOURCE_PATH = f"/tmp/gfw_scale_stress_src_x{k}.tif"
    m._MARKER = m.SOURCE_PATH + ".ok"
    return k * k  # doubling the side quadruples the data


def _scale_vector(m, k: int) -> int:
    m.PTS_PER_EDGE = m.PTS_PER_EDGE * k
    return k


def _scale_crawl(m, k: int) -> int:
    m.N_DOCS = m.N_DOCS * k
    m.WAVE = m.N_DOCS // 2
    return k


def _scale_export(m, k: int) -> int:
    m.N_DOCS = m.N_DOCS * k
    return k


def _scale_video(m, k: int) -> int:
    m.N_VIDEOS = m.N_VIDEOS * k
    return k


def _scale_lakehouse(m, k: int) -> int:
    m.N_DOCS = m.N_DOCS * k
    return k


FAMILIES = {
    "raster": ("gfw_pixetl_spark.harness.scale_stress", _scale_raster),
    "vector": ("gfw_pixetl_spark.harness.scale_stress_vector",
               _scale_vector),
    "crawl": ("gfw_pixetl_spark.harness.scale_stress_crawl",
              _scale_crawl),
    "export": ("gfw_pixetl_spark.harness.scale_stress_export",
               _scale_export),
    "video": ("gfw_pixetl_spark.harness.scale_stress_video",
              _scale_video),
    "lakehouse": ("gfw_pixetl_spark.harness.scale_stress_lakehouse",
                  _scale_lakehouse),
}


def _one_run(mod_name: str, scaler, k: int) -> tuple[float, dict]:
    """Fresh module import (resets the size constants), scale by ``k``,
    run in a throwaway dir, enforce the golden, return (seconds, facts).
    Fixture build time is excluded where the module reports it."""
    mod = importlib.import_module(mod_name)
    mod = importlib.reload(mod)
    if k != 1:
        scaler(mod, k)
    spark = get_spark("stress-probe")
    work = tempfile.mkdtemp(prefix=f"stress_probe_{mod_name.rsplit('.')[-1]}_x{k}_")
    try:
        t0 = time.perf_counter()
        facts = mod.run(spark, work)
        wall = time.perf_counter() - t0
        failures = mod.verify_outputs(facts)
        if failures:
            raise SystemExit(
                f"GOLDEN FAILED at x{k} for {mod_name}: {failures}")
        wall -= float(facts.get("sec_source_build", 0.0))
        return wall, facts
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    names = sys.argv[1:] or list(FAMILIES)
    spark = get_spark("stress-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in names:
        mod_name, scaler = FAMILIES[name]
        t1, _ = _one_run(mod_name, scaler, 1)
        t2, _ = _one_run(mod_name, scaler, 2)
        data_factor = 4 if name == "raster" else 2
        bound = 2.3 if data_factor == 2 else 2.3 ** 2
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
