"""Streaming keyed-upsert sink: multi-batch incremental merge equals the
one-shot batch compaction; re-runs are exactly-once; deletes suppress
and later upserts resurrect."""

from __future__ import annotations

from pyspark.sql import functions as F

from gfw_pixetl_spark.operators.cdc import compact_latest
from gfw_pixetl_spark.streaming.upsert import KeyedUpsertSink

CHANGES = [
    # (key, val, version, op)
    (1, "a1", 1, "U"),
    (2, "b1", 2, "U"),
    (1, "a2", 3, "U"),
    (3, "c1", 4, "U"),
    (2, None, 5, "D"),      # delete key 2
    (4, "d1", 6, "U"),
    (2, "b2", 7, "U"),      # resurrect key 2
    (3, None, 8, "D"),      # delete key 3 (stays deleted)
]
SCHEMA = "key long, val string, version long, op string"


def _write_feed(spark, tmp_path, n_files=4):
    feed = tmp_path / "feed"
    per = len(CHANGES) // n_files
    for i in range(n_files):
        chunk = CHANGES[i * per : (i + 1) * per]
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(feed / f"drop_{i}"))
    return feed


def _stream(spark, feed):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{feed}/drop_*")
    )


def test_incremental_merge_matches_batch_compaction(spark, tmp_path):
    feed = _write_feed(spark, tmp_path)
    sink = KeyedUpsertSink(
        str(tmp_path / "store"), str(tmp_path / "ckpt")
    )
    sink.run_available_now(_stream(spark, feed))

    got = {
        (r["key"], r["val"], r["version"])
        for r in sink.snapshot(spark).collect()
    }
    want_df = compact_latest(
        spark.createDataFrame(CHANGES, SCHEMA)
    ).drop("n_versions")
    want = {(r["key"], r["val"], r["version"]) for r in want_df.collect()}
    assert got == want
    # deleted key 3 gone, resurrected key 2 present at v7
    keys = {k for k, _, _ in got}
    assert 3 not in keys and (2, "b2", 7) in got


def test_rerun_is_exactly_once(spark, tmp_path):
    feed = _write_feed(spark, tmp_path)
    sink = KeyedUpsertSink(str(tmp_path / "store"), str(tmp_path / "ckpt"))
    sink.run_available_now(_stream(spark, feed))
    before = sink.current_version_dir()
    snap_before = sorted(
        map(tuple, sink.snapshot(spark).collect())
    )
    # same checkpoint: no new data -> no new batches, state unchanged
    sink.run_available_now(_stream(spark, feed))
    assert sink.current_version_dir() == before
    assert sorted(map(tuple, sink.snapshot(spark).collect())) == snap_before


def test_redelivered_batch_only_repoints(spark, tmp_path):
    feed = _write_feed(spark, tmp_path, n_files=2)
    sink = KeyedUpsertSink(str(tmp_path / "store"), str(tmp_path / "ckpt"))
    sink.run_available_now(_stream(spark, feed))
    last = sink.current_version_dir()
    snap = sorted(map(tuple, sink.snapshot(spark).collect()))
    # simulate redelivery of the committed last batch
    batch_id = int(last.name[1:])
    batch_df = spark.createDataFrame(CHANGES[-4:], SCHEMA)
    sink._process_batch(batch_df, batch_id)
    assert sink.current_version_dir() == last
    assert sorted(map(tuple, sink.snapshot(spark).collect())) == snap


def test_new_sink_on_existing_store_continues(spark, tmp_path):
    feed1 = _write_feed(spark, tmp_path, n_files=2)
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    sink = KeyedUpsertSink(store, ckpt)
    sink.run_available_now(_stream(spark, feed1))
    # late drop arrives: key 1 deleted at version 9
    extra = [(1, None, 9, "D")]
    spark.createDataFrame(extra, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(feed1 / "drop_9"))
    sink2 = KeyedUpsertSink(store, ckpt)
    sink2.run_available_now(_stream(spark, feed1))
    keys = {r["key"] for r in sink2.snapshot(spark).collect()}
    assert 1 not in keys


def test_additive_agg_sink_multibatch(spark, tmp_path):
    """Additive state merged over micro-batches equals the one-shot
    batch aggregate; a second drain with the same checkpoint is a
    no-op."""
    from pyspark.sql import functions as F

    from gfw_pixetl_spark.streaming.upsert import AdditiveAggSink

    rows = [(i % 5, float(i)) for i in range(100)]
    feed = tmp_path / "feed"
    for b in range(4):
        chunk = rows[b * 25 : (b + 1) * 25]
        spark.createDataFrame(chunk, "key long, value double").coalesce(
            1
        ).write.mode("overwrite").parquet(str(feed / f"drop_{b}"))
    stream = (
        spark.readStream.schema("key long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{feed}/drop_*")
    )
    sink = AdditiveAggSink(str(tmp_path / "store"), str(tmp_path / "ckpt"))
    sink.run_available_now(stream)
    got = {
        r["key"]: (r["n"], float(r["total"]))
        for r in sink.snapshot(spark).collect()
    }
    want_df = (
        spark.createDataFrame(rows, "key long, value double")
        .groupBy("key")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(28,2)")).alias("total"),
        )
    )
    want = {r["key"]: (r["n"], float(r["total"])) for r in want_df.collect()}
    assert got == want
    before = sink.current_version_dir()
    sink.run_available_now(stream)
    assert sink.current_version_dir() == before
