"""Parallelism guards for compute-dense map stages.

Spark sizes scan partitions by BYTES (spark.sql.files.maxPartitionBytes),
which is the right call for IO-bound scans but undersizes CPU-bound ones:
a 1 MB parquet file of embeddings costs milliseconds to read and seconds
to push through an interpreted higher-order-function cosine, yet arrives
as a single partition and pins one core. The same plan over warehouse-
scale inputs (thousands of splits) parallelizes fine — the pathology is
specifically small-input / expensive-row stages.

``ensure_min_partitions`` round-robin repartitions ONLY when the plan's
current parallelism is below the session's shuffle width, so sprinkling
it on compute-bound operators is free at scale (no-op) and removes the
single-core cliff on small inputs. The added exchange is a round-robin
of the raw rows — for the operators that use this (cosine re-rank,
centroid scoring, signature folds) that is orders of magnitude cheaper
than the compute it unlocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def shuffle_width(df: DataFrame) -> int:
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))


# Partition-count memo keyed by (application id, semanticHash):
# ``df.rdd`` forces full physical planning (~0.1 s of driver work per
# call, measured), while ``semanticHash`` is analysis-only (~2 ms) and
# identical plans over the engine's static inputs recur thousands of
# times across a bench/oracle run. The memo only feeds the
# repartition-or-not decision — either branch is semantically safe — so
# a stale count can at worst cost parallelism, never correctness.
_NPART_MEMO: dict[tuple[str, int], int] = {}


def planned_num_partitions(df: DataFrame) -> int:
    key = (df.sparkSession.sparkContext.applicationId, df.semanticHash())
    hit = _NPART_MEMO.get(key)
    if hit is None:
        hit = df.rdd.getNumPartitions()
        _NPART_MEMO[key] = hit
    return hit


def ensure_min_partitions(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition iff current parallelism < ``min_parts`` (default: the
    session shuffle width). Explicit numPartitions pins the count so AQE
    does not re-coalesce the exchange back to one partition."""
    target = min_parts or shuffle_width(df)
    if planned_num_partitions(df) >= target:
        return df
    return df.repartition(target)


def morton_key(x, y, bits: int = 16):
    """Z-order (Morton) key: bit-interleave of two grid indices, as a
    pure column expression (unrolled shifts — whole-stage codegen, and
    the identical arithmetic replays in any SQL engine).

    Sorting or range-bucketing tiles by this key is the data-layout
    lever for spatial stores at scale: neighbors in 2-D land in the
    same file/byte-range, so a bbox query touches O(result) objects
    instead of striding the whole store. (The same trick parquet
    min/max skipping and Delta/Iceberg Z-ORDER clustering rely on.)
    """
    from pyspark.sql import functions as F

    k = F.lit(0).cast("bigint")
    for b in range(bits):
        k = (
            k
            + F.shiftright(x, b).bitwiseAND(1).cast("bigint")
            * (2 ** (2 * b))
            + F.shiftright(y, b).bitwiseAND(1).cast("bigint")
            * (2 ** (2 * b + 1))
        )
    return k


def morton_key_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`morton_key` (same unrolled arithmetic)."""
    terms = []
    for b in range(bits):
        terms.append(
            f"((({x_expr}) >> {b}) & 1) * {2 ** (2 * b)}"
            f" + ((({y_expr}) >> {b}) & 1) * {2 ** (2 * b + 1)}"
        )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def hilbert_key_py(x: int, y: int, bits: int) -> int:
    """Reference Hilbert xy->d (the classic iterative rotate-and-fold;
    e.g. Hamilton's compact algorithm as given on the curve's standard
    write-ups). Kept in pure Python so the column/SQL twins below are
    testable against an independent statement of the same recurrence."""
    d = 0
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = (x >> i) & 1
        ry = (y >> i) & 1
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
    return d


def hilbert_key(df, x_col: str, y_col: str, bits: int,
                out: str = "hkey"):
    """Hilbert-curve key as chained column expressions (one
    ``withColumns`` level per curve order — whole-stage codegen, no
    UDF). Hilbert beats Morton for range locality: consecutive keys
    are ALWAYS grid-adjacent (no Z-shape jumps), so range-bucketed
    shards have tighter spatial footprints — the layout lever behind
    Delta OPTIMIZE's Hilbert mode."""
    from pyspark.sql import functions as F

    df = df.withColumns({
        "_hx": F.col(x_col).cast("bigint"),
        "_hy": F.col(y_col).cast("bigint"),
        out: F.lit(0).cast("bigint"),
    })
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = F.shiftright(F.col("_hx"), i).bitwiseAND(1)
        ry = F.shiftright(F.col("_hy"), i).bitwiseAND(1)
        quad = (rx * 3).bitwiseXOR(ry).cast("bigint")
        nx = F.when(ry == 1, F.col("_hx")).otherwise(
            F.when(rx == 1, F.lit(s - 1) - F.col("_hy"))
            .otherwise(F.col("_hy")))
        ny = F.when(ry == 1, F.col("_hy")).otherwise(
            F.when(rx == 1, F.lit(s - 1) - F.col("_hx"))
            .otherwise(F.col("_hx")))
        df = df.withColumns({
            out: F.col(out) + F.lit(s * s) * quad,
            "_hx": nx,
            "_hy": ny,
        })
    return df.drop("_hx", "_hy")


def hilbert_key_sql(x_expr: str, y_expr: str, bits: int,
                    src: str) -> str:
    """DuckDB twin of :func:`hilbert_key`: a chain of CTE levels (one
    per curve order) ending in relation ``h0`` with columns (.., hkey).
    ``src`` must expose ``{x_expr}``/``{y_expr}`` plus any carried
    columns as ``*``."""
    lines = [f"h{bits} AS (SELECT *, CAST({x_expr} AS BIGINT) AS _hx, "
             f"CAST({y_expr} AS BIGINT) AS _hy, "
             f"CAST(0 AS BIGINT) AS hkey FROM {src})"]
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = f"((_hx >> {i}) & 1)"
        ry = f"((_hy >> {i}) & 1)"
        lines.append(
            f"h{i} AS (SELECT * REPLACE ("
            f"hkey + {s * s} * xor({rx} * 3, {ry}) AS hkey, "
            f"CASE WHEN {ry} = 1 THEN _hx WHEN {rx} = 1 "
            f"THEN {s - 1} - _hy ELSE _hy END AS _hx, "
            f"CASE WHEN {ry} = 1 THEN _hy WHEN {rx} = 1 "
            f"THEN {s - 1} - _hx ELSE _hx END AS _hy) FROM h{i + 1})")
    return ",\n    ".join(lines)
