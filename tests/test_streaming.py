"""Structured Streaming operators drain deterministically with
availableNow; value parity vs DuckDB is gated in test_oracle_parity
(q39/q49) — here we check streaming-specific invariants."""

from __future__ import annotations

from gfw_pixetl_spark.streaming.events import (
    run_hourly_rollup_once, run_sessionize_once,
)
from tests.conftest import SF_SMOKE
from gfw_pixetl_spark.sources.geotiff import read_tile

EVENTS = f"{SF_SMOKE}/events.parquet"


def test_hourly_rollup_stream(spark):
    out = run_hourly_rollup_once(spark, EVENTS)
    rows = out.collect()
    assert len(rows) > 0
    assert set(out.columns) == {"bucket", "event_type", "n", "sum_value"}
    assert all(r.n > 0 for r in rows)


def test_sessionize_stream(spark):
    out = run_sessionize_once(spark, EVENTS)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.duration_sec >= 0 for r in rows)
    assert all(r.n_events >= 1 for r in rows)
    # single-event sessions have zero duration
    singles = [r for r in rows if r.n_events == 1]
    assert all(abs(r.duration_sec) < 1e-6 for r in singles)


def test_incremental_tiler_exactly_once(spark, tmp_path):
    """Two manifest drops, one checkpoint: each drop's tiles burn exactly
    once; a re-trigger with no new drops is a no-op (streaming F5)."""
    import json

    from gfw_pixetl_spark.grids import LatLngGrid
    from gfw_pixetl_spark.plans import raster_pipe as rp
    from gfw_pixetl_spark.sources.raster import SyntheticReader
    from gfw_pixetl_spark.streaming.incremental import IncrementalTiler
    from tests.test_raster_pipe import make_layer

    grid = LatLngGrid(10, 160)
    pipe = rp.RasterPipe(
        layer=make_layer(),
        reader=SyntheticReader(xres=grid.xres, yres=grid.yres),
        work_dir=str(tmp_path / "tiles"),
        grid=grid,
    )
    drops = tmp_path / "drops"
    drops.mkdir()
    tiler = IncrementalTiler(
        pipe=pipe,
        manifest_dir=str(drops),
        checkpoint_dir=str(tmp_path / "ckpt"),
        status_dir=str(tmp_path / "status"),
        subset=["00N_000E", "10N_000E", "00N_010E"],
    )

    (drops / "drop1.json").write_text(json.dumps(
        {"uri": "memory://a", "band": 1,
         "left": 0.0, "bottom": -10.0, "right": 10.0, "top": 10.0}
    ) + "\n")
    tiler.run_available_now(spark)
    ledger = {
        (r.tile_id, r.batch_id): r.status
        for r in tiler.statuses_of(spark).collect()
    }
    assert {t for t, _ in ledger} == {"00N_000E", "10N_000E"}
    assert all(s == "processed" for s in ledger.values())
    first_batches = {b for _, b in ledger}

    # no new drops -> re-trigger is a no-op
    tiler.run_available_now(spark)
    assert len(tiler.statuses_of(spark).collect()) == len(ledger)

    # second drop touches a new tile only; first drop is NOT re-processed
    (drops / "drop2.json").write_text(json.dumps(
        {"uri": "memory://b", "band": 1,
         "left": 10.0, "bottom": -10.0, "right": 20.0, "top": 0.0}
    ) + "\n")
    tiler.run_available_now(spark)
    after = {
        (r.tile_id, r.batch_id): r.status
        for r in tiler.statuses_of(spark).collect()
    }
    new = {k: v for k, v in after.items() if k not in ledger}
    assert {t for t, _ in new} == {"00N_010E"}
    assert all(b not in first_batches for _, b in new)


def test_incremental_vector_tiler(spark, tmp_path):
    """Feature drops re-burn only the tiles they touch, reading the full
    feature store so last-wins paint stays correct across batches."""
    import json

    import numpy as np

    from gfw_pixetl_spark.grids import LatLngGrid
    from gfw_pixetl_spark.plans.vector_pipe import GEOM_TYPE, VectorPipe
    from gfw_pixetl_spark.streaming.incremental import IncrementalVectorTiler
    from tests.test_vector_pipe import _vector_layer

    grid = LatLngGrid(10, 160)
    store = tmp_path / "features"
    drops = tmp_path / "drops"
    drops.mkdir()
    schema = f"feature_id long, value double, geom {GEOM_TYPE}"

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(
            str(store)
        )
        (drops / f"{name}.json").write_text(
            json.dumps({"path": str(store)}) + "\n"
        )

    tiler = IncrementalVectorTiler(
        pipe=VectorPipe(layer=_vector_layer(order="asc"),
                        work_dir=str(tmp_path / "tiles"), grid=grid),
        features_path=str(store),
        manifest_dir=str(drops),
        checkpoint_dir=str(tmp_path / "ckpt"),
        status_dir=str(tmp_path / "status"),
    )

    # batch 1: value-3 square in tile 10N_000E
    write_batch("drop1", [
        (1, 3.0, [[[1.0, 1.0], [5.0, 1.0], [5.0, 5.0], [1.0, 5.0], [1.0, 1.0]]]),
    ])
    tiler.run_available_now(spark)
    first = tiler.statuses_of(spark).collect()
    assert {r.tile_id for r in first} == {"10N_000E"}

    # batch 2: value-7 square overlapping the first, same tile — the
    # re-burn must see BOTH features (full store) for correct last-wins
    write_batch("drop2", [
        (2, 7.0, [[[2.0, 2.0], [6.0, 2.0], [6.0, 6.0], [2.0, 6.0], [2.0, 2.0]]]),
    ])
    tiler.run_available_now(spark)
    second = [
        r for r in tiler.statuses_of(spark).collect() if r not in first
    ]
    assert {r.tile_id for r in second} == {"10N_000E"}
    [r2] = second
    data = read_tile(r2.out_path)[0][0]
    # lon 1.5, lat 1.5 -> only feature 3; lon 3, lat 3 -> overlap, 7 wins
    assert data[int((10 - 1.5) / 0.0625), int(1.5 / 0.0625)] == 3
    assert data[int((10 - 3.0) / 0.0625), int(3.0 / 0.0625)] == 7


def test_sessionize_with_state_keeps_open_sessions(spark):
    """The stateful sessionizer emits closed sessions only: every user's
    chronologically-last session is withheld (still open in state)."""
    from gfw_pixetl_spark.streaming.events import (
        run_sessionize_once, run_sessionize_with_state_once,
    )

    closed = run_sessionize_with_state_once(spark, EVENTS).collect()
    all_sessions = run_sessionize_once(spark, EVENTS).collect()
    per_user_all = {}
    for r in all_sessions:
        per_user_all.setdefault(r.user_id, []).append(r)
    # exactly one session (the last) withheld per user
    assert len(closed) == sum(len(v) - 1 for v in per_user_all.values())
    last_starts = {
        u: max(r.session_start for r in v) for u, v in per_user_all.items()
    }
    for r in closed:
        assert r.session_start < last_starts[r.user_id].timestamp()


def test_stream_neardup_filter_matches_batch_rule(spark):
    """Streaming survivors == docs that are the hub (min doc) of every
    band bucket they occupy — i.e. never the non-hub end of a star edge."""
    from gfw_pixetl_spark.functions.dedup import (
        lsh_star_edges, minhash_signatures,
    )
    from gfw_pixetl_spark.harness import load
    from gfw_pixetl_spark.streaming.neardup import (
        run_stream_neardup_filter_once,
    )

    docs = load(spark, SF_SMOKE, "documents")
    survivors = {
        r.doc_id for r in run_stream_neardup_filter_once(
            spark, f"{SF_SMOKE}/documents.parquet"
        ).collect()
    }
    sigs = minhash_signatures(docs)
    demoted = {
        r.doc_id_a for r in lsh_star_edges(sigs).select("doc_id_a").collect()
    }
    with_bands = {r.doc_id for r in sigs.select("doc_id").collect()}
    assert survivors == with_bands - demoted
    assert 0 < len(survivors) < docs.count()


def test_stream_neardup_ttl_single_drain_unchanged(spark):
    """A TTL only evicts state across idle time; within one availableNow
    drain nothing times out, so the survivor set equals the no-TTL run."""
    from gfw_pixetl_spark.streaming.neardup import (
        run_stream_neardup_filter_once,
    )

    path = f"{SF_SMOKE}/documents.parquet"
    base = {r.doc_id for r in run_stream_neardup_filter_once(spark, path).collect()}
    ttl = {
        r.doc_id for r in run_stream_neardup_filter_once(
            spark, path, state_ttl_ms=3_600_000
        ).collect()
    }
    assert ttl == base


def test_stream_stream_join_restart_exactly_once(spark, tmp_path):
    """The attribution interval join survives a restart: drain, re-drain
    with no new data (no duplicate output), append a new input file and
    re-drain (only the new matches appear). This is the checkpoint
    contract a production stream relies on after executor loss."""
    import pandas as pd

    from gfw_pixetl_spark.streaming.events import view_purchase_stream_join

    src = tmp_path / "events"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def write_events(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type",
                           "value", "props"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf).coalesce(1).write.mode(
            "append").parquet(str(src))

    write_events("a", [
        (1, "2024-01-01 10:00:00", 7, "view", 1.0, "{}"),
        (2, "2024-01-01 10:10:00", 7, "purchase", 5.0, "{}"),
        (3, "2024-01-01 10:00:00", 8, "view", 1.0, "{}"),
    ])

    def drain():
        q = (
            view_purchase_stream_join(spark, f"{src}/*.parquet")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).collect()

    first = drain()
    assert len(first) == 1  # user 7's view->purchase within the horizon
    again = drain()
    assert len(again) == 1  # restart with no new data: no duplicates
    # late-arriving purchase for user 8 lands in a NEW file
    write_events("b", [
        (4, "2024-01-01 10:20:00", 8, "purchase", 9.0, "{}"),
    ])
    third = drain()
    assert len(third) == 2  # exactly the one new match appended
    users = sorted(r.user_id for r in third)
    assert users == [7, 8]
