"""Vector-pipe scale-stress golden run: fetch -> fan-out -> burn ->
merge -> write over a >=100 MB synthetic feature set.

The vector fixtures elsewhere in the suite are a handful of squares —
enough for burn-rule correctness, silent on the at-size claims: window-
granular burning (task memory bounded by the window, never the tile),
the salted two-phase merge at real fan-out, and producer-side Arrow
batch sizes. This module generates a deterministic lattice of ~16k
overlapping sawtooth-edged rectangles (~100 MB of coordinate doubles,
built distributedly in ``mapInPandas``, never on the driver), runs the
full production :class:`~..plans.vector_pipe.VectorPipe` at window
granularity over one 4096^2-px tile, and returns measured facts:

* output equality — the written tile equals the CLOSED-FORM winner:
  overlapping rectangles with strictly increasing paint values mean
  pixel (r, c) is last painted by lattice cell (r//s, c//s), so
  expected(r, c) = (r//s)*nj + (c//s) + 1, checked for all 16.7M px;
* window accounting — burned windows match the plan, payload bytes are
  one window each;
* Arrow batch bytes — max batch observed at the write exchange.

The rectangles' edges carry 96 interpolated vertices with alternating
±1e-9-degree sawtooth offsets: real vertex volume for the byte budget
without moving any pixel center across a boundary (centers are half a
pixel ≈ 1.2e-3 degrees from every edge).

``tests/test_scale_stress_vector.py`` asserts these (marked slow);
``bench.py`` records wall time (``scale_stress_vector`` entry).

Reference parity: gdal_rasterize burn of a PostGIS fetch
(``gfw_pixetl/tiles/vector_src_tile.py:158-212``) at the data volume
the reference's 48-vCPU envelope implies.
"""

from __future__ import annotations

import time

import numpy as np

GRID_WIDTH_DEG = 10
GRID_COLS = 4096
TILE_ID = "10N_000E"  # lat 0..10, lng 0..10; origin top-left (0, 10)
NI = NJ = 128          # lattice cells per axis
CELL_PX = GRID_COLS // NI  # 32 px; each rectangle spans 2 cells (64 px)
_SCALE = int(__import__("os").environ.get("SPARK_GRAFT_STRESS_SCALE", "1"))
PTS_PER_EDGE = 104 * _SCALE     # interpolated sawtooth vertices per edge
SAW_EPS = 1e-9         # degrees; pixel centers are ~1.2e-3 deg away


def expected_tile() -> np.ndarray:
    """Closed-form winner per pixel: the max-value covering feature is
    always lattice cell (r//s, c//s)."""
    rr = np.arange(GRID_COLS, dtype=np.int64)[:, None] // CELL_PX
    cc = np.arange(GRID_COLS, dtype=np.int64)[None, :] // CELL_PX
    return (rr * NJ + cc + 1).astype(np.uint16)


def _sawtooth_edge(x0, y0, x1, y1, pts, eps):
    """Vertices along (x0,y0)->(x1,y1) with alternating perpendicular
    offsets of ±eps — byte volume without changing coverage."""
    t = np.linspace(0.0, 1.0, pts, endpoint=False)
    xs = x0 + (x1 - x0) * t
    ys = y0 + (y1 - y0) * t
    saw = np.where(np.arange(pts) % 2 == 1, eps, -eps)
    saw[0] = 0.0  # keep the true corner
    if abs(x1 - x0) > abs(y1 - y0):  # horizontal edge: offset y
        ys = ys + saw
    else:
        xs = xs + saw
    return xs, ys


def feature_geometry(i: int, j: int) -> list:
    """Rectangle of lattice cell (i, j): pixel rows [i*s, i*s + 2s),
    cols [j*s, j*s + 2s) in world coordinates, sawtooth edges."""
    xres = GRID_WIDTH_DEG / GRID_COLS
    top = 10.0 - (i * CELL_PX) * xres
    bottom = 10.0 - (i * CELL_PX + 2 * CELL_PX) * xres
    left = 0.0 + (j * CELL_PX) * xres
    right = 0.0 + (j * CELL_PX + 2 * CELL_PX) * xres
    ring_x, ring_y = [], []
    for x0, y0, x1, y1 in [(left, top, right, top),
                           (right, top, right, bottom),
                           (right, bottom, left, bottom),
                           (left, bottom, left, top)]:
        xs, ys = _sawtooth_edge(x0, y0, x1, y1, PTS_PER_EDGE, SAW_EPS)
        ring_x.append(xs)
        ring_y.append(ys)
    xs = np.concatenate(ring_x + [np.array([left])])
    ys = np.concatenate(ring_y + [np.array([top])])
    return [np.column_stack([xs, ys]).tolist()]


def make_features(spark):
    """(feature_id, value, geom) for the full lattice — generated on the
    executors from the id range; ~101 MB of coordinate doubles."""
    import pandas as pd

    from ..plans.vector_pipe import GEOM_TYPE

    def gen(batches):
        for pdf in batches:
            ids, vals, geoms = [], [], []
            for fid in pdf["id"]:
                i, j = int(fid) // NJ, int(fid) % NJ
                ids.append(int(fid))
                vals.append(float(i * NJ + j + 1))
                geoms.append(feature_geometry(i, j))
            yield pd.DataFrame(
                {"feature_id": ids, "value": vals, "geom": geoms})

    return spark.range(NI * NJ).repartition(32).mapInPandas(
        gen, f"feature_id long, value double, geom {GEOM_TYPE}")


def run(spark, work_dir: str, n_salts: int = 4,
        blocks_per_window: int = 1) -> dict:
    """Execute the salted vector pipeline at size; returns facts."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ..grids import LatLngGrid
    from ..models import LayerModel
    from ..plans.vector_pipe import VectorPipe

    grid = LatLngGrid(GRID_WIDTH_DEG, GRID_COLS)
    layer = LayerModel(
        dataset="stress_vec", version="v1", source_type="vector",
        pixel_meaning="value", data_type="uint16", grid="10/40000",
        rasterize_method="value", order="asc", no_data=0,
    )
    pipe = VectorPipe(layer=layer, work_dir=work_dir, grid=grid,
                      blocks_per_window=blocks_per_window,
                      n_salts=n_salts)

    t0 = time.perf_counter()
    feats = make_features(spark).localCheckpoint()
    coord_bytes = feats.select(
        F.sum(F.size(F.flatten("geom")) * 16).alias("b")
    ).collect()[0].b
    t_gen = time.perf_counter() - t0

    # Stage 1: tap payload/batch sizes where the write exchange reads
    t0 = time.perf_counter()
    payloads = pipe.plan_payloads(spark, feats, subset=[TILE_ID])

    def measure(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "batch_bytes": [int(sum(len(p) for p in pdf["payload"]
                                        if p is not None))],
                "n_rows": [len(pdf)],
                "max_payload": [int(max((len(p) for p in pdf["payload"]
                                         if p is not None), default=0))],
            })

    stats = (
        payloads.mapInPandas(
            measure, "batch_bytes long, n_rows long, max_payload long")
        .agg(F.max("batch_bytes").alias("max_batch_bytes"),
             F.sum("n_rows").alias("n_windows"),
             F.max("max_payload").alias("max_window_payload"))
        .collect()[0]
    )
    t_burn = time.perf_counter() - t0

    # Stage 2: full production run (burn re-executed + write)
    t0 = time.perf_counter()
    status = {r.tile_id: r
              for r in pipe.run(spark, feats, subset=[TILE_ID]).collect()}
    t_write = time.perf_counter() - t0

    win = grid.blockxsize * blocks_per_window
    return {
        "n_features": NI * NJ,
        "coord_bytes": int(coord_bytes),
        "window_px": win,
        "windows_planned": (GRID_COLS // win) ** 2,
        "n_windows": int(stats.n_windows),
        "max_window_payload": int(stats.max_window_payload),
        "max_batch_bytes": int(stats.max_batch_bytes),
        "statuses": {t: status[t].status for t in status},
        "out_paths": {t: status[t].out_path for t in status
                      if status[t].out_path},
        "sec_feature_gen": round(t_gen, 3),
        "sec_burn_scan": round(t_burn, 3),
        "sec_full_pipeline": round(t_write, 3),
    }


def verify_outputs(facts: dict) -> list[str]:
    """Decode the written tile and compare all 16.7M pixels against the
    closed form; empty list = golden."""
    from ..sources.geotiff import read_tile

    problems = []
    if facts["coord_bytes"] < 100 * 2**20:
        problems.append(
            f"feature set only {facts['coord_bytes']} coord bytes")
    if facts["n_windows"] != facts["windows_planned"]:
        problems.append(
            f"windows {facts['n_windows']} != planned "
            f"{facts['windows_planned']}")
    # one window payload = win^2 uint16 + npy header
    win = facts["window_px"]
    if facts["max_window_payload"] > win * win * 2 + 256:
        problems.append(
            f"window payload {facts['max_window_payload']} exceeds one "
            f"window")
    if facts["statuses"] != {TILE_ID: "processed"}:
        problems.append(f"statuses {facts['statuses']}")
        return problems
    data, profile = read_tile(facts["out_paths"][TILE_ID])
    want = expected_tile()
    if data.shape != (1, GRID_COLS, GRID_COLS):
        problems.append(f"shape {data.shape}")
    elif not np.array_equal(data[0], want):
        problems.append(
            f"{int((data[0] != want).sum())} mismatched pixels")
    if profile["dtype"] != "uint16":
        problems.append(f"profile dtype {profile['dtype']}")
    return problems
