"""Bucketed tile store: persistent, co-partitioned tables keyed by
``tile_id`` (ROADMAP #5).

At cluster scale the engine joins on ``tile_id`` constantly — the
target-exists anti-join (F5, ``gfw_pixetl/pipes/pipe.py:90-109``), status
ledgers (F10), window→tile assembly, and any cross-layer tile math. Each
such join of two plain parquet tables shuffles BOTH sides. Writing the
tables bucketed (``bucketBy(n, "tile_id")`` + ``sortBy``) pins a
deterministic hash-partitioning into the table layout, so Catalyst plans
co-bucketed joins as zero-shuffle sort-merge joins: at 100 TB the
difference is re-shuffling the full tile ledger per query vs reading
pre-placed buckets.

Bucket count guidance: buckets ≫ executors (for parallelism) but small
enough that each bucket file stays in the 100 MB – 1 GB parquet sweet
spot. 648 world tiles at 10° → 64 buckets; zoom-22's 268M tiles → 4096.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class TileStore:
    """Manage bucketed ``tile_id``-keyed tables in the session catalog.

    Requires a metastore-backed catalog (any warehouse dir works locally;
    on a cluster, Hive metastore or a lakehouse catalog). Bucketing info
    lives in the catalog, which is why plain ``.parquet()`` round-trips
    cannot express this.
    """

    spark: SparkSession
    database: str = "tilestore"
    n_buckets: int = 64

    def __post_init__(self) -> None:
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {self.database}")

    def _qualified(self, table: str) -> str:
        return f"{self.database}.{table}"

    def write(
        self, df: DataFrame, table: str, mode: str = "overwrite"
    ) -> None:
        """Persist ``df`` bucketed+sorted by ``tile_id``. Sorting within
        buckets lets the join skip its sort too (plan shows neither
        Exchange nor Sort on either side)."""
        (
            df.write.format("parquet")
            .bucketBy(self.n_buckets, "tile_id")
            .sortBy("tile_id")
            .mode(mode)
            .saveAsTable(self._qualified(table))
        )

    def read(self, table: str) -> DataFrame:
        return self.spark.table(self._qualified(table))

    def join(
        self, left: str, right: str, how: str = "inner"
    ) -> DataFrame:
        """Co-bucketed join on ``tile_id`` — both sides read pre-hashed
        buckets, so the plan contains no Exchange (verified in
        tests/test_sources_and_report.py)."""
        return self.read(left).join(self.read(right), "tile_id", how)

    def drop(self, table: str) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self._qualified(table)}")
