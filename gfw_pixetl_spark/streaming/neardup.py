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


def stream_band_firsts(
    spark: SparkSession, docs_path: str, state_ttl_ms: int | None = None
) -> DataFrame:
    """Stateful stage: per (band, key) bucket, flag the first-ever doc.

    ``state_ttl_ms`` bounds state for unbounded streams: a bucket whose
    last occupant is older than the TTL is evicted (processing-time
    timeout), after which the next arrival counts as first again. That
    turns "dup of anything ever seen" into "dup of anything seen in the
    last T" — the only state contract that holds at infinite stream
    length, and the standard windowed-dedup semantic. Default (None)
    keeps state forever, matching the batch oracle exactly.
    """
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
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                [], columns=["doc_id", "band_id", "key", "first"]
            )
            return
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
            if state_ttl_ms is not None:
                state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame(out, columns=["doc_id", "band_id", "key", "first"])

    return bands.groupBy("band_id", "key").applyInPandasWithState(
        fn, FIRST_SCHEMA, "min_doc long", "append",
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout,
    )


def run_stream_neardup_filter_once(
    spark: SparkSession, docs_path: str, state_ttl_ms: int | None = None
) -> DataFrame:
    """Drain with availableNow; survivors = docs first in all bands.

    With a TTL, ``availableNow`` + processing-time timeout never
    self-terminates: after the input drains, Spark keeps scheduling
    (empty) batches so the registered timers can eventually fire — for
    an hour-scale TTL that is an unbounded empty-batch spin. So the
    drain watches progress and stops the query at the first batch with
    zero input rows: by then every real record has been processed
    (availableNow admits all available data before any empty timer
    batch), which is exactly the drain-once contract.
    """
    import time

    name = f"neardup_{uuid.uuid4().hex[:8]}"
    q = (
        stream_band_firsts(spark, docs_path, state_ttl_ms)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if state_ttl_ms is None:
        q.awaitTermination()
    else:
        while q.isActive:
            p = q.lastProgress
            # a zero-input batch can only be a timer-spin batch: available
            # data is admitted before any empty batch, so stopping here
            # never drops input (and handles the empty-source case too)
            if p is not None and p["numInputRows"] == 0:
                q.stop()
                q.awaitTermination()
                break
            time.sleep(0.2)
    return (
        spark.table(name)
        .groupBy("doc_id")
        .agg(F.min("first").alias("all_first"))
        .filter(F.col("all_first"))
        .select("doc_id")
    )
