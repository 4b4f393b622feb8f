"""CDC compaction: collapse a base snapshot + change stream to the
latest row per key — the upsert/merge step every incrementally-loaded
100 TB table needs (the reference's analog is the prep-manifest
merge_existing union-dedup, ``gfw_pixetl/utils/utils.py`` via
``plans/prep.py``; this is the keyed, versioned generalization).

One union + one map-side-combinable aggregation (``max_by`` over the
version) — no window functions, no sort: the classic
row_number()-over-key formulation shuffles and sorts every partition,
while argmax compaction combines partials within each scan task, so the
shuffle carries one row per key per task. Deletes are rows whose ``op``
is ``'D'``: they win like any other version and suppress the key iff
they are the latest — a later upsert resurrects it (standard CDC
semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compact_latest(
    changes: DataFrame,
    key: str = "key",
    version: str = "version",
    op: str = "op",
    payload: tuple[str, ...] = ("val",),
) -> DataFrame:
    """Latest-wins compaction of a (possibly base-unioned) change set.

    Returns one row per surviving key: the payload of the highest
    version, keys whose latest op is a delete removed. ``version`` must
    be totally ordered per key (CDC log offset / commit timestamp).
    """
    agg = [
        F.max_by(c, F.col(version)).alias(c) for c in (*payload, op)
    ] + [
        F.max(version).alias(version),
        F.count("*").alias("n_versions"),
    ]
    out = changes.groupBy(key).agg(*agg)
    return out.filter(F.col(op) != "D").drop(op)
