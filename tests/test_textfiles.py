"""JSONL/CSV source round-trips: schema enforcement, corrupt-record
quarantine, and value fidelity against the parquet originals."""

from __future__ import annotations

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from gfw_pixetl_spark.sources import textfiles as tf
from tests.conftest import SF_SMOKE

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def test_jsonl_roundtrip_documents(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        [f.name for f in DOC_SCHEMA.fields]
    )
    path = str(tmp_path / "docs_jsonl")
    tf.write_jsonl(docs, path, partitions=2)
    back = tf.read_jsonl(spark, path, DOC_SCHEMA)  # default: DROPMALFORMED
    assert back.count() == docs.count()
    a = {r["doc_id"]: r["text"] for r in docs.collect()}
    b = {r["doc_id"]: r["text"] for r in back.collect()}
    assert a == b


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "a", "n_chars": 2}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "a", "n_chars": 7}\n'
    )
    df = tf.read_jsonl(spark, str(p), DOC_SCHEMA, on_corrupt="quarantine")
    assert tf.corrupt_count(df) == 1
    good = tf.clean(df)
    assert good.count() == 2  # count() must survive column pruning
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]


def test_csv_roundtrip_with_types(spark, tmp_path):
    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("name", StringType()),
        ]
    )
    df = spark.createDataFrame([(1, "alpha"), (2, "beta")], schema)
    path = str(tmp_path / "csv_out")
    tf.write_csv(df, path, partitions=1)
    back = tf.read_csv(spark, path, schema)
    assert back.schema["k"].dataType == LongType()
    assert sorted((r["k"], r["name"]) for r in back.collect()) == [
        (1, "alpha"),
        (2, "beta"),
    ]


def test_csv_malformed_row_quarantined(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("k,name\n1,alpha\nnot_a_number,beta\n2,gamma\n")
    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("name", StringType()),
        ]
    )
    df = tf.read_csv(spark, str(p), schema, on_corrupt="quarantine")
    assert tf.corrupt_count(df) == 1
    assert sorted(r["k"] for r in tf.clean(df).collect()) == [1, 2]
    # DROPMALFORMED path drops the bad line at read
    dropped = tf.read_csv(spark, str(p), schema)
    assert sorted(r["k"] for r in dropped.collect()) == [1, 2]
