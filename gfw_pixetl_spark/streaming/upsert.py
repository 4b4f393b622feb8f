"""Streaming CDC upsert sink: materialize a change stream into a keyed
parquet store with exactly-once semantics.

The batch operator (`operators/cdc.py::compact_latest`) collapses a
change set to latest-row-per-key; this sink applies it incrementally
from a stream via ``foreachBatch``:

* each micro-batch merges into a NEW versioned directory
  (``store_dir/v{batch_id}``) — never an in-place rewrite;
* a pointer file (``_CURRENT``) is swapped AFTER the write commits, so
  readers always see a complete snapshot (parquet ``_SUCCESS`` +
  pointer ordering gives single-writer atomicity on any filesystem
  with atomic rename);
* re-delivered batches (crash between write and checkpoint commit) are
  detected by their committed marker and only re-point — the merge is
  never re-applied, making the sink idempotent per batch_id.

At warehouse scale this role is played by a table format (the pointer
file is a one-cell commit log); the merge plan itself — union + argmax
compaction, no windows — is exactly what a MERGE INTO executes.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..operators.cdc import compact_latest

POINTER = "_CURRENT"


class KeyedUpsertSink:
    def __init__(
        self,
        store_dir: str,
        checkpoint_dir: str,
        key: str = "key",
        version: str = "version",
        op: str = "op",
        payload: tuple[str, ...] = ("val",),
    ) -> None:
        self.store_dir = Path(store_dir)
        self.checkpoint_dir = checkpoint_dir
        self.key, self.version, self.op = key, version, op
        self.payload = payload
        self.store_dir.mkdir(parents=True, exist_ok=True)

    # -- snapshot management -------------------------------------------------
    def _pointer_path(self) -> Path:
        return self.store_dir / POINTER

    def current_version_dir(self) -> Path | None:
        p = self._pointer_path()
        if not p.exists():
            return None
        return self.store_dir / p.read_text().strip()

    def snapshot(self, spark: SparkSession) -> DataFrame | None:
        """The latest committed keyed state, or None before any batch."""
        cur = self.current_version_dir()
        if cur is None:
            return None
        return spark.read.parquet(str(cur))

    # -- foreachBatch body ---------------------------------------------------
    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        out_dir = self.store_dir / f"v{batch_id}"
        success = out_dir / "_SUCCESS"
        if success.exists():
            # redelivery after a crash between write and checkpoint commit:
            # the merge already committed — just make sure the pointer
            # advanced (idempotent re-point, never a re-merge)
            self._swap_pointer(out_dir)
            return
        spark = batch_df.sparkSession
        cols = [self.key, *self.payload, self.version, self.op]
        changes = batch_df.select(*cols)
        base = self.snapshot(spark)
        if base is not None:
            from pyspark.sql import functions as F

            # surviving store rows re-enter the merge as upserts at their
            # stored version — a newer change (incl. a delete) outranks them
            base_as_changes = base.select(
                self.key, *self.payload, self.version,
                F.lit("U").alias(self.op),
            )
            changes = base_as_changes.unionByName(changes)
        merged = compact_latest(
            changes,
            key=self.key,
            version=self.version,
            op=self.op,
            payload=self.payload,
        ).drop("n_versions")
        merged.write.mode("overwrite").parquet(str(out_dir))
        self._swap_pointer(out_dir)

    def _swap_pointer(self, out_dir: Path) -> None:
        tmp = self._pointer_path().with_suffix(".tmp")
        tmp.write_text(out_dir.name)
        os.replace(tmp, self._pointer_path())  # atomic on POSIX

    # -- drivers -------------------------------------------------------------
    def run_available_now(self, stream: DataFrame) -> None:
        q = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


class AdditiveAggSink(KeyedUpsertSink):
    """Incremental aggregate materialization: maintain per-key algebraic
    aggregate state (count + decimal sum here) under a change stream —
    the streaming materialized view. Where :class:`KeyedUpsertSink`
    resolves conflicts by latest-wins, this sink MERGES: each batch
    pre-aggregates map-side, then folds into the store by summing
    partials — the same commutative-merge contract Spark's own partial
    aggregation relies on, applied across batches. Versioned directories
    and the atomic pointer swap are inherited, so exactly-once holds per
    batch_id.
    """

    def __init__(
        self,
        store_dir: str,
        checkpoint_dir: str,
        key: str = "key",
        value: str = "value",
    ) -> None:
        super().__init__(store_dir, checkpoint_dir, key=key)
        self.value = value

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        out_dir = self.store_dir / f"v{batch_id}"
        if (out_dir / "_SUCCESS").exists():
            self._swap_pointer(out_dir)
            return
        spark = batch_df.sparkSession
        partial = batch_df.groupBy(self.key).agg(
            F.count("*").alias("n"),
            F.sum(F.col(self.value).cast("decimal(28,2)")).alias("total"),
        )
        base = self.snapshot(spark)
        if base is not None:
            merged = (
                base.unionByName(partial)
                .groupBy(self.key)
                .agg(
                    F.sum("n").alias("n"),
                    F.sum("total")
                    .cast("decimal(28,2)")
                    .alias("total"),
                )
            )
        else:
            merged = partial
        merged.write.mode("overwrite").parquet(str(out_dir))
        self._swap_pointer(out_dir)
