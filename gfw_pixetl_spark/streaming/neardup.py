"""Streaming NEAR-dup filter: MinHash-band state store.

Extends the exact streaming dedup (``stream_exact_dedup``) to near-dups:
each document's LSH band keys are computed ROW-LOCALLY (no streaming
aggregation needed — a document's words are all in its own row, so the
signature is a mapInPandas kernel, which is exactly what makes this
streamable in append mode), then a per-(band, key) state store records
the first document ever seen in that bucket. A document survives iff it
was first in EVERY one of its band buckets — i.e. no band collides with
anything seen before it.

Within one ``availableNow`` drain of a static table, "before" is
doc_id order (the stateful kernel processes each bucket's batch in
sorted order), which makes the survivor set deterministic and equal to
"doc_id == MIN(doc_id) in all its buckets" — the batch-SQL oracle
(harness q64). On a live stream, "before" is arrival order, the
natural streaming semantic.

Scale notes: state is one long per occupied (band, key) bucket — the
band space, not the corpus; the shuffle is the same (band, key) equi-
partitioning as batch LSH (q29), so skew behavior and sizing carry over.
The md5 math mirrors functions/hashing.py exactly (60-bit ints), so
Python's unbounded ints agree with the JVM's int64 path bit-for-bit.
"""

from __future__ import annotations

import hashlib
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dedup import N_BANDS, N_MINHASH
from ..functions.hashing import P31, minhash_coeffs

COEFFS = minhash_coeffs(N_MINHASH)
ROWS_PER_BAND = N_MINHASH // N_BANDS

BAND_SCHEMA = "doc_id long, band_id int, key long"
FIRST_SCHEMA = "doc_id long, band_id int, key long, first boolean"


def _band_rows(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Row-local MinHash signature + band keys (the md5-derived math of
    functions/hashing.py, reproduced in-process)."""
    for pdf in pdfs:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            ws = set(str(text).split(" ")) - {""}
            if not ws:
                continue
            hws = [
                int(hashlib.md5(w.encode()).hexdigest()[:15], 16) for w in ws
            ]
            sig = [
                min(((h % P31) * a + b) % P31 for h in hws)
                for a, b in COEFFS
            ]
            for bi in range(N_BANDS):
                parts = sig[bi * ROWS_PER_BAND:(bi + 1) * ROWS_PER_BAND]
                key = int(
                    hashlib.md5(
                        "_".join(str(p) for p in parts).encode()
                    ).hexdigest()[:15],
                    16,
                )
                rows.append((int(doc_id), bi, key))
        yield pd.DataFrame(rows, columns=["doc_id", "band_id", "key"])


def stream_band_firsts(spark: SparkSession, docs_path: str) -> DataFrame:
    """Stateful stage: per (band, key) bucket, flag the first-ever doc."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    schema = spark.read.parquet(docs_path).schema
    base, fname = docs_path.rsplit("/", 1)
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", fname)
        .parquet(base)
    )
    bands = stream.select("doc_id", "text").mapInPandas(
        _band_rows, BAND_SCHEMA
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        band_id, bkey = key
        occupied = state.exists
        out = []
        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["doc_id"])
        for d in sorted(ids):
            out.append((d, band_id, bkey, not occupied))
            occupied = True
        if ids:
            state.update((min(ids),))
        yield pd.DataFrame(out, columns=["doc_id", "band_id", "key", "first"])

    return bands.groupBy("band_id", "key").applyInPandasWithState(
        fn, FIRST_SCHEMA, "min_doc long", "append",
        GroupStateTimeout.NoTimeout,
    )


def run_stream_neardup_filter_once(
    spark: SparkSession, docs_path: str
) -> DataFrame:
    """Drain with availableNow; survivors = docs first in all bands."""
    name = f"neardup_{uuid.uuid4().hex[:8]}"
    q = (
        stream_band_firsts(spark, docs_path)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("doc_id")
        .agg(F.min("first").alias("all_first"))
        .filter(F.col("all_first"))
        .select("doc_id")
    )
