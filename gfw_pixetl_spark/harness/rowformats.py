"""Avro ingest/export queries beyond q390/q395: logical-type
round-trip, the snappy/zstandard codecs, and array-block encoding.
(Round 8, sixth session.)

The 100 TB ingest story is row-major at the edges — Kafka topics,
CDC feeds, upstream exports arrive as Avro — and columnar inside.
These queries run the in-tree OCF codec (``sources/avro.py``) on
EXECUTORS, shard-per-task, and verify every decoded value through
the DuckDB oracle, which only ever sees the parquet source: a wrong
zigzag, block frame, union index, CRC, or array block shows up as a
value mismatch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, register
from .lakeops import _derived_dir

# --------------------------------------------------------------------------
# q448 — AVRO TIMESTAMP-MICROS ROUND-TRIP with a nullable union:
# events become OCF shards (one per task — the Kafka-export shape)
# carrying ts as timestamp-micros longs and event_type as
# ["null","string"] (nulled for every 11th event id); a second
# distributed pass decodes the shards, restores the timestamp, and
# aggregates per type. The oracle replays the null-injection and the
# micros arithmetic from the parquet source. Complements q390 (flat
# round-trip) with the logical-type path every event-log ingest hits.
# --------------------------------------------------------------------------
_AVRO_SHARDS = 8


def _avro_events_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        from ..sources.avro import write_avro_shards

        df = (load(spark, sf_dir, "events")
              .select("event_id",
                      F.unix_micros("ts").alias("ts_us"),
                      "user_id",
                      F.when(F.col("event_id") % 11 != 0,
                             F.col("event_type")).alias("etype"),
                      "value"))
        # bounded collect: one row per shard
        write_avro_shards(df, d, n_shards=_AVRO_SHARDS).collect()

    return _derived_dir(sf_dir, "avroevents", build)


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
    from ..sources.avro import read_avro

    d = _avro_events_dir(spark, sf_dir)
    decoded = read_avro(
        spark, d + "/*.avro",
        "ts_us long, user_id long, etype string, value double")
    return (decoded
            .withColumn("ts", F.timestamp_micros("ts_us"))
            .groupBy("etype").agg(
                F.count("*").alias("n"),
                F.min("ts").alias("min_ts"),
                F.max("ts").alias("max_ts"),
                F.sum("user_id").alias("sum_user"),
                (F.round(F.sum("value"), 2) + 0.0).alias("sum_value")))


# --------------------------------------------------------------------------
# q449 — AVRO SNAPPY + ZSTANDARD CODECS: the same corpus slice written
# under both block codecs the Kafka world actually ships (snappy with
# its big-endian CRC32-of-uncompressed suffix, zstandard frames via
# the in-tree compressors), decoded back and aggregated per codec —
# the two result halves must be identical to each other AND to the
# parquet truth. Complements q390, which covers null/deflate.
# --------------------------------------------------------------------------
def _avro_codec_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os

        from ..sources.avro import write_avro_shards

        df = (load(spark, sf_dir, "documents")
              .select("doc_id", "lang",
                      F.when(F.col("doc_id") % 7 != 0,
                             F.col("source")).alias("src"),
                      "n_chars"))
        for codec in ("snappy", "zstandard"):
            sub = os.path.join(d, codec)
            write_avro_shards(df, sub, n_shards=4, codec=codec).collect()

    return _derived_dir(sf_dir, "avrocodec", build)


@register(
    "q449_avro_codecs",
    oracle="""
    SELECT c.codec, d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN doc_id % 7 != 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_src,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM documents d
    CROSS JOIN (VALUES ('snappy'), ('zstandard')) c(codec)
    GROUP BY c.codec, d.lang
    """,
)
def q449(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.avro import read_avro

    d = _avro_codec_dir(spark, sf_dir)
    parts = []
    for codec in ("snappy", "zstandard"):
        decoded = read_avro(
            spark, f"{d}/{codec}/*.avro",
            "doc_id long, lang string, src string, n_chars long")
        parts.append(decoded.withColumn("codec", F.lit(codec)))
    both = parts[0].unionByName(parts[1])
    return both.groupBy("codec", "lang").agg(
        F.count("*").alias("n_docs"),
        F.count("src").alias("n_src"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"))


# --------------------------------------------------------------------------
# q450 — AVRO ARRAY BLOCKS: embeddings (array<float>) through the
# block-encoded array path — the vector-export shape (schema_for is
# flat-only, so the shard writer here carries an explicit record
# schema with an array<float> field). Vectors survive as exact
# float32 bits, re-read as doubles on both sides and checked via
# per-label counts, total dimension, and self-dot-product sums.
# --------------------------------------------------------------------------
_EMB_SCHEMA = {
    "type": "record", "name": "emb", "fields": [
        {"name": "vec_id", "type": "long"},
        {"name": "label", "type": "int"},
        {"name": "embedding", "type": {"type": "array", "items": "float"}},
    ]}


def _avro_emb_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os
        import uuid as _uuid

        os.makedirs(d, exist_ok=True)
        df = load(spark, sf_dir, "embeddings").repartition(4, "vec_id")

        def write_shard(batches: Iterator[pd.DataFrame]
                        ) -> Iterator[pd.DataFrame]:
            from ..sources.avro import write_container

            parts = [b for b in batches if len(b)]
            if not parts:
                return
            pdf = pd.concat(parts, ignore_index=True)
            recs = [
                {"vec_id": int(v), "label": int(lb),
                 "embedding": [float(x) for x in emb]}
                for v, lb, emb in zip(pdf["vec_id"], pdf["label"],
                                      pdf["embedding"])
            ]
            path = os.path.join(d, f"part-{_uuid.uuid4().hex}.avro")
            with open(path, "wb") as fh:
                fh.write(write_container(recs, _EMB_SCHEMA))
            yield pd.DataFrame({"path": [path]})

        # bounded collect: one row per shard
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
    files = spark.read.format("binaryFile").load(d + "/*.avro")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..sources.avro import iter_container

        for pdf in batches:
            for blob in pdf["content"]:
                labels, embs = [], []
                for rec in iter_container(bytes(blob)):
                    labels.append(rec["label"])
                    embs.append(rec["embedding"])
                yield pd.DataFrame({
                    "label": pd.Series(labels, dtype="int32"),
                    "embedding": embs,
                })

    decoded = files.select("content").mapInPandas(
        kernel, "label int, embedding array<double>")
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


# --------------------------------------------------------------------------
# q461 — ANY-TO-ANY FORMAT MATRIX: one documents slice exported by
# the three IN-TREE writers — ORC (RLEv2/DIRECT_V2 generation,
# sources/orc.py), Avro OCF (deflate blocks, sources/avro.py),
# parquet (PLAIN v1 pages + thrift footer, sources/parquetdata.py) —
# then read back by the three IN-TREE readers, shard-per-task both
# ways. Per-format aggregates must agree with each other and with
# the parquet-side oracle: the full export->ingest portability loop
# with no foreign library on any leg.
# --------------------------------------------------------------------------
def _matrix_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os

        os.makedirs(d, exist_ok=True)
        df = (load(spark, sf_dir, "documents")
              .select("doc_id", "lang",
                      F.when(F.col("doc_id") % 6 != 0,
                             F.col("source")).alias("src"),
                      "n_chars")
              .repartition(4, "doc_id"))

        def write_shard(batches: Iterator[pd.DataFrame]
                        ) -> Iterator[pd.DataFrame]:
            import uuid as _uuid

            from ..sources import orc as o
            from ..sources.avro import write_container
            from ..sources.parquetdata import PColumn, write_parquet

            parts = [b for b in batches if len(b)]
            if not parts:
                return
            pdf = pd.concat(parts, ignore_index=True)
            tag = _uuid.uuid4().hex
            rows = list(zip(
                (int(v) for v in pdf["doc_id"]), pdf["lang"],
                (None if v is None else str(v) for v in pdf["src"]),
                (int(v) for v in pdf["n_chars"])))
            o.write_orc(
                os.path.join(d, f"{tag}.orc"),
                [o.OrcColumn("doc_id", o.K_LONG),
                 o.OrcColumn("lang", o.K_STRING),
                 o.OrcColumn("src", o.K_STRING),
                 o.OrcColumn("n_chars", o.K_LONG)],
                rows, rle_version=2)
            schema = {"type": "record", "name": "doc", "fields": [
                {"name": "doc_id", "type": "long"},
                {"name": "lang", "type": "string"},
                {"name": "src", "type": ["null", "string"]},
                {"name": "n_chars", "type": "long"}]}
            recs = [dict(zip(("doc_id", "lang", "src", "n_chars"), r))
                    for r in rows]
            with open(os.path.join(d, f"{tag}.avro"), "wb") as fh:
                fh.write(write_container(recs, schema))
            write_parquet(
                os.path.join(d, f"{tag}.parquet"),
                [PColumn("doc_id", "INT64"),
                 PColumn("lang", "BYTE_ARRAY"),
                 PColumn("src", "BYTE_ARRAY", nullable=True),
                 PColumn("n_chars", "INT64")],
                rows, codec="SNAPPY")
            yield pd.DataFrame({"tag": [tag]})

        # bounded collect: one row per shard
        df.mapInPandas(write_shard, "tag string").collect()

    return _derived_dir(sf_dir, "fmtmatrix", build)


@register(
    "q461_format_matrix",
    oracle="""
    SELECT f.fmt, d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN doc_id % 6 != 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_src,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(doc_id) AS BIGINT) AS sum_id
    FROM documents d
    CROSS JOIN (SELECT unnest(ARRAY['avro', 'orc', 'parquet'])
                AS fmt) f
    GROUP BY f.fmt, d.lang
    """,
)
def q461(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob

    d = _matrix_dir(spark, sf_dir)
    triples = []
    for fmt in ("avro", "orc", "parquet"):
        for p in sorted(_glob.glob(f"{d}/*.{fmt}")):
            triples.append((fmt, p))
    paths = (spark.createDataFrame(triples, "fmt string, path string")
             .repartition(len(triples)))

    def read_shard(batches: Iterator[pd.DataFrame]
                   ) -> Iterator[pd.DataFrame]:
        from ..sources import orc as o
        from ..sources.avro import iter_container
        from ..sources.parquetdata import read_parquet_rows

        for pdf in batches:
            for fmt, path in zip(pdf["fmt"], pdf["path"]):
                if fmt == "orc":
                    cols = o.read_orc(path)
                elif fmt == "parquet":
                    cols = read_parquet_rows(path)
                else:
                    with open(path, "rb") as fh:
                        recs = list(iter_container(fh.read()))
                    cols = {k: [r[k] for r in recs]
                            for k in ("doc_id", "lang", "src",
                                      "n_chars")}
                yield pd.DataFrame({
                    "fmt": fmt,
                    "doc_id": pd.Series(cols["doc_id"], dtype="int64"),
                    "lang": cols["lang"],
                    "src": cols["src"],
                    "n_chars": pd.Series(cols["n_chars"],
                                         dtype="int64"),
                })

    decoded = paths.mapInPandas(
        read_shard,
        "fmt string, doc_id long, lang string, src string, n_chars long")
    return decoded.groupBy("fmt", "lang").agg(
        F.count("*").alias("n_docs"),
        F.count("src").alias("n_src"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum("doc_id").alias("sum_id"))


# --------------------------------------------------------------------------
# q463 — AVRO DECIMAL + DATE LOGICAL TYPES: the money/date edge of
# the Kafka ingest path. Balances travel as decimal-on-bytes
# (minimal-length big-endian two's complement of the cents, the spec
# encoding Java's BigDecimal writer produces), dates as
# days-since-epoch ints; both logicalType-annotated in the schema.
# Decoded distributed and aggregated with EXACT integer cents — the
# money-safe loop with no float anywhere. The oracle replays the
# quantization and the synthetic signup-date rule.
# --------------------------------------------------------------------------
_AVRO_DEC_SCHEMA = """
{"type": "record", "name": "Bal", "fields": [
  {"name": "c_custkey", "type": "long"},
  {"name": "c_mktsegment", "type": "string"},
  {"name": "bal", "type": {"type": "bytes", "logicalType": "decimal",
                           "precision": 18, "scale": 2}},
  {"name": "signup", "type": {"type": "int", "logicalType": "date"}}
]}
"""


def _avro_decimal_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os
        import uuid as _uuid

        os.makedirs(d, exist_ok=True)
        df = (load(spark, sf_dir, "customer")
              .select("c_custkey", "c_mktsegment",
                      F.col("c_acctbal").cast("decimal(18,2)")
                      .alias("bal"),
                      (F.col("c_custkey") % 9000).cast("int")
                      .alias("signup"))
              .repartition(4, "c_custkey"))

        def write_shard(batches: Iterator[pd.DataFrame]
                        ) -> Iterator[pd.DataFrame]:
            from decimal import Decimal

            from ..sources.avro import decimal_to_bytes, write_container

            parts = [b for b in batches if len(b)]
            if not parts:
                return
            pdf = pd.concat(parts, ignore_index=True)
            recs = [
                {"c_custkey": int(k), "c_mktsegment": str(m),
                 "bal": decimal_to_bytes(Decimal(str(b)).scaleb(2)),
                 "signup": int(sd)}
                for k, m, b, sd in zip(pdf["c_custkey"],
                                       pdf["c_mktsegment"], pdf["bal"],
                                       pdf["signup"])]
            import json as _json

            path = os.path.join(d, f"{_uuid.uuid4().hex}.avro")
            with open(path, "wb") as fh:
                fh.write(write_container(
                    recs, _json.loads(_AVRO_DEC_SCHEMA)))
            yield pd.DataFrame({"path": [path]})

        # bounded collect: one row per shard
        df.mapInPandas(write_shard, "path string").collect()

    return _derived_dir(sf_dir, "avrodec", build)


@register(
    "q463_avro_decimal_date",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           CAST(MIN(c_custkey % 9000) AS BIGINT) AS min_signup,
           CAST(MAX(c_custkey % 9000) AS BIGINT) AS max_signup
    FROM customer GROUP BY c_mktsegment
    """,
)
def q463(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob

    d = _avro_decimal_dir(spark, sf_dir)
    files = sorted(_glob.glob(d + "/*.avro"))
    paths = (spark.createDataFrame([(p,) for p in files], "path string")
             .repartition(len(files)))

    def read_shard(batches: Iterator[pd.DataFrame]
                   ) -> Iterator[pd.DataFrame]:
        from ..sources.avro import bytes_to_decimal_int, iter_container

        for pdf in batches:
            for path in pdf["path"]:
                with open(path, "rb") as fh:
                    recs = list(iter_container(fh.read()))
                yield pd.DataFrame({
                    "c_mktsegment": [r["c_mktsegment"] for r in recs],
                    "cents": pd.Series(
                        [bytes_to_decimal_int(r["bal"]) for r in recs],
                        dtype="int64"),
                    "signup": pd.Series([r["signup"] for r in recs],
                                        dtype="int64"),
                })

    decoded = paths.mapInPandas(
        read_shard, "c_mktsegment string, cents long, signup long")
    return decoded.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("sum_cents"),
        F.min("signup").alias("min_signup"),
        F.max("signup").alias("max_signup"))
