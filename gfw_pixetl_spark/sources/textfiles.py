"""Line-delimited text sources and sinks: JSONL and CSV.

The reference ingests GeoJSON manifests (`gfw_pixetl/layers.py:114-128`)
and emits JSON sidecars; a training-data pipeline additionally ingests
raw corpora as JSONL/CSV drops. These wrappers encode the at-scale
discipline the bare readers don't enforce:

* **Schema is mandatory.** Inference is a full extra pass over the data
  (at 100 TB, a second 100 TB scan) and can silently flip types between
  drops. Callers declare the contract once.
* **Corrupt-record policy is explicit.** ``on_corrupt="drop"`` (default)
  reads DROPMALFORMED; ``"fail"`` aborts the batch; ``"quarantine"``
  captures unparseable lines in ``_corrupt_record`` for the DQ audit
  (q112-style counting via :func:`corrupt_count`).
* **Line-splittable formats stay parallel.** JSONL/CSV without
  multiline mode split on line boundaries, so ``maxPartitionBytes``
  controls scan parallelism exactly like parquet.

Spark refuses plans whose file scan references ONLY the internal corrupt
column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — column
pruning turns innocent ``clean(df).count()`` into exactly that shape, so
:func:`corrupt_count` and :func:`clean` deliberately keep one data column
alive in the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"

_MODES = {"drop": "DROPMALFORMED", "fail": "FAILFAST", "quarantine": "PERMISSIVE"}


def _schema_for(schema: StructType, on_corrupt: str) -> StructType:
    if on_corrupt != "quarantine" or any(
        f.name == CORRUPT_COL for f in schema.fields
    ):
        return schema
    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    on_corrupt: str = "drop",
) -> DataFrame:
    """Read line-delimited JSON with a declared schema and an explicit
    malformed-line policy (see module docstring)."""
    return (
        spark.read.schema(_schema_for(schema, on_corrupt))
        .option("mode", _MODES[on_corrupt])
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    delimiter: str = ",",
    on_corrupt: str = "drop",
) -> DataFrame:
    """Read CSV with a declared schema (no inference pass) and an
    explicit malformed-line policy."""
    return (
        spark.read.schema(_schema_for(schema, on_corrupt))
        .option("header", header)
        .option("sep", delimiter)
        .option("mode", _MODES[on_corrupt])
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def corrupt_count(df: DataFrame) -> int:
    """Number of quarantined lines in a ``on_corrupt="quarantine"`` read.

    Counts via an aggregate that also counts a real data column, so the
    file scan never references only the corrupt column (which Spark
    rejects) — still one pass."""
    if CORRUPT_COL not in df.columns:
        return 0
    data_col = next(c for c in df.columns if c != CORRUPT_COL)
    row = df.agg(
        F.sum(
            F.when(F.col(CORRUPT_COL).isNotNull(), 1).otherwise(0)
        ).alias("bad"),
        F.count(F.col(data_col)).alias("_keep_scan_legal"),
    ).first()
    return int(row["bad"] or 0)


def clean(df: DataFrame) -> DataFrame:
    """Drop quarantined rows and the quarantine column.

    The filter condition touches one data column through a no-op
    predicate so downstream ``count()``-style plans (which prune every
    data column) keep a legal scan."""
    if CORRUPT_COL not in df.columns:
        return df
    data_col = next(c for c in df.columns if c != CORRUPT_COL)
    keep_alive = F.length(
        F.coalesce(F.col(data_col).cast("string"), F.lit(""))
    ) >= 0
    return df.filter(F.col(CORRUPT_COL).isNull() & keep_alive).drop(CORRUPT_COL)


def write_jsonl(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """Write line-delimited JSON; ``partitions`` bounds output file count
    (sinks/compaction.py owns size-targeted compaction for parquet)."""
    out = df.repartition(partitions) if partitions else df
    out.write.mode("overwrite").json(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, partitions: int | None = None
) -> None:
    out = df.repartition(partitions) if partitions else df
    out.write.mode("overwrite").option("header", header).csv(path)


def read_evolved_parquet(spark, path: str) -> DataFrame:
    """Schema-evolution read: union a parquet directory whose files were
    written under DIFFERENT schema versions (columns added over time).
    ``mergeSchema`` makes the footer union the scan schema; rows from
    old files surface the added columns as NULL — the contract a 100 TB
    store accumulated over years of pipeline versions depends on
    (re-writing history on every column add is not an option).
    """
    return spark.read.option("mergeSchema", "true").parquet(path)
