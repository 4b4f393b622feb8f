"""WebDataset tar-shard sink/source (sinks/webdataset.py): grouping,
reproducibility, atomic publish, round-trip integrity."""

from __future__ import annotations

import os
import tarfile

import pytest
from pyspark.sql import functions as F

from gfw_pixetl_spark.sinks.webdataset import read_shards, write_shards


@pytest.fixture()
def df(spark):
    rows = [(i, f"text number {i}", bytes([i % 251] * (10 + i % 5)))
            for i in range(40)]
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 4),
        "doc_id long, text string, payload binary",
    )


def test_write_read_roundtrip(spark, df, tmp_path):
    out = str(tmp_path / "wds")
    statuses = write_shards(
        df, out, 4, columns={"text": "txt", "payload": "bin"},
        shard_expr=F.col("doc_id") % 4,
    ).collect()
    assert {r.shard_id for r in statuses} == {0, 1, 2, 3}
    assert sum(r.n_samples for r in statuses) == 40
    rows = read_shards(spark, sorted(r.path for r in statuses)).collect()
    # every sample contributes one .txt and one .bin member
    txt = {r.key: bytes(r.payload) for r in rows if r.suffix == "txt"}
    bin_ = {r.key: bytes(r.payload) for r in rows if r.suffix == "bin"}
    assert len(txt) == len(bin_) == 40
    for i in range(40):
        assert txt[str(i)] == f"text number {i}".encode()
        assert bin_[str(i)] == bytes([i % 251] * (10 + i % 5))


def test_shards_are_reproducible(spark, df, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for out in (a, b):
        write_shards(df, out, 2, columns={"text": "txt"},
                     shard_expr=F.col("doc_id") % 2).collect()
    for name in os.listdir(a):
        with open(os.path.join(a, name), "rb") as fa, \
                open(os.path.join(b, name), "rb") as fb:
            assert fa.read() == fb.read(), name  # byte-identical exports


def test_sample_files_grouped_by_key(spark, df, tmp_path):
    out = str(tmp_path / "g")
    [st] = write_shards(df.limit(5), out, 1,
                        columns={"text": "txt", "payload": "bin"},
                        shard_expr=F.lit(0)).collect()
    with tarfile.open(st.path) as tar:
        names = tar.getnames()
    # each key's members are adjacent (sample grouping contract)
    stems = [n.rsplit(".", 1)[0] for n in names]
    assert stems == sorted(set(stems), key=int) * 0 + [
        s for s in sorted(set(stems), key=int) for _ in range(2)]


def test_default_hash_sharding_covers_all_rows(spark, df, tmp_path):
    out = str(tmp_path / "h")
    statuses = write_shards(df, out, 3).collect()
    assert sum(r.n_samples for r in statuses) == 40


def test_missing_column_rejected(spark, df, tmp_path):
    with pytest.raises(ValueError, match="nope"):
        write_shards(df, str(tmp_path), 2, columns={"nope": "txt"})
