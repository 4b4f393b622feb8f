"""Row-interchange format queries: Avro OCF ingest/export.
(Round 8, sixth session.)

The 100 TB ingest story is row-major at the edges — Kafka topics,
CDC feeds, and upstream exports arrive as Avro — and columnar inside.
These queries run the in-tree pure-Python OCF codec
(``sources/avro.py``) on EXECUTORS, shard-per-task, and verify every
decoded value through the DuckDB oracle, which only ever sees the
parquet source: a wrong zigzag, block frame, union index, logical
type, or resolution rule shows up as a value mismatch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, register
from .lakeops import _derived_dir

# --------------------------------------------------------------------------
# q448 — AVRO EVENTS ROUND-TRIP with logical types and a nullable
# union: events become OCF shards (one per task — the Kafka-export
# shape) carrying ts as timestamp-micros longs and event_type as
# ["null","string"] (nulled for every 11th event id); a second
# distributed pass decodes the shards, restores the timestamp, and
# aggregates per type. The oracle replays the null-injection and the
# micros truncation from the parquet source.
# --------------------------------------------------------------------------
_AVRO_SHARDS = 8

_EVENTS_SCHEMA_JSON = """
{"type": "record", "name": "Event", "fields": [
  {"name": "event_id", "type": "long"},
  {"name": "ts", "type": {"type": "long",
                          "logicalType": "timestamp-micros"}},
  {"name": "user_id", "type": "long"},
  {"name": "event_type", "type": ["null", "string"], "default": null},
  {"name": "value", "type": "double"}
]}
"""


def _avro_events_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os
        import uuid as _uuid

        os.makedirs(d, exist_ok=True)
        df = (load(spark, sf_dir, "events")
              .select("event_id",
                      F.unix_micros("ts").alias("ts_us"),
                      "user_id",
                      F.when(F.col("event_id") % 11 != 0,
                             F.col("event_type")).alias("etype"),
                      "value")
              .repartition(_AVRO_SHARDS, "event_id"))

        def write_shard(batches: Iterator[pd.DataFrame]
                        ) -> Iterator[pd.DataFrame]:
            from ..sources import avro as av

            parts = [b for b in batches if len(b)]
            if not parts:
                return
            pdf = pd.concat(parts, ignore_index=True)
            rows = [
                {"event_id": int(e), "ts": int(t), "user_id": int(u),
                 "event_type": None if ty is None else str(ty),
                 "value": float(v)}
                for e, t, u, ty, v in zip(
                    pdf["event_id"], pdf["ts_us"], pdf["user_id"],
                    pdf["etype"], pdf["value"])
            ]
            path = os.path.join(d, f"shard-{_uuid.uuid4().hex}.avro")
            info = av.write_avro(path, _EVENTS_SCHEMA_JSON, rows)
            yield pd.DataFrame({"path": [path], "n": [info["n_rows"]]})

        # bounded collect: one row per shard
        df.mapInPandas(write_shard, "path string, n long").collect()

    return _derived_dir(sf_dir, "avroevents", build)


def _avro_paths_df(spark: SparkSession, d: str) -> DataFrame:
    import glob as _glob

    files = sorted(_glob.glob(d + "/*.avro"))
    return (spark.createDataFrame([(p,) for p in files], "path string")
            .repartition(len(files)))


@register(
    "q448_avro_roundtrip",
    oracle="""
    SELECT CASE WHEN event_id % 11 = 0 THEN NULL ELSE event_type END
             AS etype,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(ts) AS min_ts,
           MAX(ts) AS max_ts,
           CAST(SUM(user_id) AS BIGINT) AS sum_user,
           round(SUM(value), 2) + 0.0 AS sum_value
    FROM events GROUP BY 1
    """,
)
def q448(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _avro_events_dir(spark, sf_dir)

    def read_shard(batches: Iterator[pd.DataFrame]
                   ) -> Iterator[pd.DataFrame]:
        from ..sources import avro as av

        for pdf in batches:
            for path in pdf["path"]:
                rows = av.read_avro(path)
                yield pd.DataFrame({
                    "ts_us": pd.Series([r["ts"] for r in rows],
                                       dtype="int64"),
                    "user_id": pd.Series([r["user_id"] for r in rows],
                                         dtype="int64"),
                    "etype": [r["event_type"] for r in rows],
                    "value": pd.Series([r["value"] for r in rows],
                                       dtype="float64"),
                })

    decoded = _avro_paths_df(spark, d).mapInPandas(
        read_shard, "ts_us long, user_id long, etype string, value double")
    return (decoded
            .withColumn("ts", F.timestamp_micros("ts_us"))
            .groupBy("etype").agg(
                F.count("*").alias("n"),
                F.min("ts").alias("min_ts"),
                F.max("ts").alias("max_ts"),
                F.sum("user_id").alias("sum_user"),
                (F.round(F.sum("value"), 2) + 0.0).alias("sum_value")))


# --------------------------------------------------------------------------
# q449 — AVRO SCHEMA EVOLUTION, the rolling-upgrade shape a 100 TB
# corpus lives with: shards written under schema v1 (customer) are
# decoded under reader schema v2 — c_name REMOVED (writer field
# skipped), c_nationkey PROMOTED int->long, c_acctbal PROMOTED
# float->double, and a NEW field with a default. The oracle replays
# the v2 projection straight from parquet; a resolution bug (wrong
# skip width, missed promotion, default not applied) breaks values.
# --------------------------------------------------------------------------
_CUST_V1_JSON = """
{"type": "record", "name": "Customer", "fields": [
  {"name": "c_custkey", "type": "long"},
  {"name": "c_name", "type": "string"},
  {"name": "c_nationkey", "type": "int"},
  {"name": "c_acctbal", "type": "float"},
  {"name": "c_mktsegment", "type": "string"}
]}
"""

_CUST_V2_JSON = """
{"type": "record", "name": "Customer", "fields": [
  {"name": "c_custkey", "type": "long"},
  {"name": "c_nationkey", "type": "long"},
  {"name": "c_acctbal", "type": "double"},
  {"name": "c_mktsegment", "type": "string"},
  {"name": "tier", "type": "string", "default": "standard"}
]}
"""


def _avro_customer_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os
        import uuid as _uuid

        os.makedirs(d, exist_ok=True)
        df = (load(spark, sf_dir, "customer")
              .select("c_custkey", "c_name", "c_nationkey",
                      F.col("c_acctbal").cast("float").alias("bal_f"),
                      "c_mktsegment")
              .repartition(4, "c_custkey"))

        def write_shard(batches: Iterator[pd.DataFrame]
                        ) -> Iterator[pd.DataFrame]:
            from ..sources import avro as av

            parts = [b for b in batches if len(b)]
            if not parts:
                return
            pdf = pd.concat(parts, ignore_index=True)
            rows = [
                {"c_custkey": int(k), "c_name": str(n),
                 "c_nationkey": int(nk), "c_acctbal": float(b),
                 "c_mktsegment": str(m)}
                for k, n, nk, b, m in zip(
                    pdf["c_custkey"], pdf["c_name"], pdf["c_nationkey"],
                    pdf["bal_f"], pdf["c_mktsegment"])
            ]
            path = os.path.join(d, f"shard-{_uuid.uuid4().hex}.avro")
            av.write_avro(path, _CUST_V1_JSON, rows)
            yield pd.DataFrame({"path": [path]})

        df.mapInPandas(write_shard, "path string").collect()

    return _derived_dir(sf_dir, "avrocust", build)


@register(
    "q449_avro_schema_evolution",
    oracle="""
    SELECT c_mktsegment,
           'standard' AS tier,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(c_custkey) AS BIGINT) AS sum_key,
           CAST(SUM(c_nationkey) AS BIGINT) AS sum_nation,
           round(SUM(CAST(CAST(c_acctbal AS FLOAT) AS DOUBLE)), 2) + 0.0
             AS sum_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def q449(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _avro_customer_dir(spark, sf_dir)

    def read_shard(batches: Iterator[pd.DataFrame]
                   ) -> Iterator[pd.DataFrame]:
        from ..sources import avro as av

        for pdf in batches:
            for path in pdf["path"]:
                rows = av.read_avro(path, reader_schema=_CUST_V2_JSON)
                yield pd.DataFrame({
                    "c_custkey": pd.Series(
                        [r["c_custkey"] for r in rows], dtype="int64"),
                    "c_nationkey": pd.Series(
                        [r["c_nationkey"] for r in rows], dtype="int64"),
                    "c_acctbal": pd.Series(
                        [r["c_acctbal"] for r in rows], dtype="float64"),
                    "c_mktsegment": [r["c_mktsegment"] for r in rows],
                    "tier": [r["tier"] for r in rows],
                })

    decoded = _avro_paths_df(spark, d).mapInPandas(
        read_shard,
        "c_custkey long, c_nationkey long, c_acctbal double, "
        "c_mktsegment string, tier string")
    return decoded.groupBy("c_mktsegment", "tier").agg(
        F.count("*").alias("n"),
        F.sum("c_custkey").alias("sum_key"),
        F.sum("c_nationkey").alias("sum_nation"),
        (F.round(F.sum("c_acctbal"), 2) + 0.0).alias("sum_bal"))


# --------------------------------------------------------------------------
# q450 — AVRO ARRAY BLOCKS: embeddings (array<float>) through the
# block-encoded array path — the multimodal/vector-export shape. Each
# vector survives as exact float32 bits (re-read as doubles on both
# sides), checked via per-label counts, total dimension, and the sum
# of self-dot-products.
# --------------------------------------------------------------------------
_EMB_SCHEMA_JSON = """
{"type": "record", "name": "Emb", "fields": [
  {"name": "vec_id", "type": "long"},
  {"name": "label", "type": "int"},
  {"name": "embedding", "type": {"type": "array", "items": "float"}}
]}
"""


def _avro_emb_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os
        import uuid as _uuid

        os.makedirs(d, exist_ok=True)
        df = (load(spark, sf_dir, "embeddings")
              .repartition(4, "vec_id"))

        def write_shard(batches: Iterator[pd.DataFrame]
                        ) -> Iterator[pd.DataFrame]:
            from ..sources import avro as av

            parts = [b for b in batches if len(b)]
            if not parts:
                return
            pdf = pd.concat(parts, ignore_index=True)
            rows = [
                {"vec_id": int(v), "label": int(lb),
                 "embedding": [float(x) for x in emb]}
                for v, lb, emb in zip(pdf["vec_id"], pdf["label"],
                                      pdf["embedding"])
            ]
            path = os.path.join(d, f"shard-{_uuid.uuid4().hex}.avro")
            av.write_avro(path, _EMB_SCHEMA_JSON, rows)
            yield pd.DataFrame({"path": [path]})

        df.mapInPandas(write_shard, "path string").collect()

    return _derived_dir(sf_dir, "avroemb", build)


@register(
    "q450_avro_array_blocks",
    oracle="""
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(len(embedding)) AS BIGINT) AS sum_dim,
           round(SUM(list_dot_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[]))), 3)
             + 0.0 AS sum_sq
    FROM embeddings GROUP BY label
    """,
)
def q450(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _avro_emb_dir(spark, sf_dir)

    def read_shard(batches: Iterator[pd.DataFrame]
                   ) -> Iterator[pd.DataFrame]:
        from ..sources import avro as av

        for pdf in batches:
            for path in pdf["path"]:
                rows = av.read_avro(path)
                yield pd.DataFrame({
                    "label": pd.Series([r["label"] for r in rows],
                                       dtype="int32"),
                    "embedding": [r["embedding"] for r in rows],
                })

    decoded = _avro_paths_df(spark, d).mapInPandas(
        read_shard, "label int, embedding array<double>")
    dot = F.aggregate(
        F.zip_with("embedding", "embedding", lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)
    return (decoded
            .withColumn("dim", F.size("embedding"))
            .withColumn("sq", dot)
            .groupBy("label").agg(
                F.count("*").alias("n_vecs"),
                F.sum("dim").cast("long").alias("sum_dim"),
                (F.round(F.sum("sq"), 3) + 0.0).alias("sum_sq")))
