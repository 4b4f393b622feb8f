"""Sequence packing for LLM training data: concat-and-chunk documents
into fixed-capacity training sequences.

The standard pretraining layout (GPT/T5 style) concatenates documents in
a deterministic order and slices the stream into fixed-length sequences,
letting documents straddle boundaries. Relationally that is pure offset
math: a running sum gives each doc its start offset, and the chunks it
spans are ``floor(start/cap) .. floor((end-1)/cap)`` — an explode over
that range. No state machine, no driver loop.

Scale shape: the running sum is a window ORDER BY inside each *shard* —
packing is embarrassingly parallel across shards (source, path prefix,
hash bucket), which is also how real pipelines shard their output files.
A global (shard-free) pack would funnel the corpus through one ordered
partition; this API makes the shard column mandatory for exactly that
reason. The explode emits one row per (doc, chunk) overlap — output
volume is input tokens / capacity, the training-set size itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    shard_col: str,
    id_col: str,
    len_col: str,
    capacity: int,
) -> DataFrame:
    """Assign each document its span of fixed-``capacity`` chunks within
    its shard. Returns one row per (doc, chunk) with the slice layout:

    - ``chunk_id``: 0-based chunk index within the shard;
    - ``begin_in_chunk``: where the doc's slice starts inside the chunk;
    - ``begin_in_doc``: offset of the slice within the document;
    - ``n_in_chunk``: slice length (sums to ``len_col`` over the doc,
      and to ``capacity`` over full chunks).

    Deterministic for a fixed (shard, id) ordering — re-runs and
    re-partitionings produce the identical layout.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    length = F.col(len_col).cast("long")
    spans = (
        df.withColumn("_end", F.sum(length).over(w))
        .withColumn("_start", F.col("_end") - length)
        .filter(length > 0)
        # `div` keeps the math in exact int64 — float division can round
        # across a chunk boundary for non-power-of-two capacities.
        .withColumn("_c0", F.expr(f"_start div {capacity}"))
        .withColumn("_c1", F.expr(f"(_end - 1) div {capacity}"))
    )
    chunk = F.explode(F.sequence("_c0", "_c1")).alias("chunk_id")
    out = spans.select(
        shard_col, id_col, "_start", "_end", chunk
    )
    begin_abs = F.greatest(F.col("_start"), F.col("chunk_id") * capacity)
    end_abs = F.least(F.col("_end"), (F.col("chunk_id") + 1) * capacity)
    return out.select(
        shard_col,
        F.col(id_col),
        "chunk_id",
        (begin_abs - F.col("chunk_id") * capacity).alias("begin_in_chunk"),
        (begin_abs - F.col("_start")).alias("begin_in_doc"),
        (end_abs - begin_abs).alias("n_in_chunk"),
    )
