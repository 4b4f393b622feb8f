"""Streaming ingest into a snapshot-versioned table: ``foreachBatch``
-> ``snapshot_append`` with exactly-once semantics per micro-batch.

This closes the loop between the two durability subsystems: the
streaming engine's checkpoint guarantees at-least-once delivery of each
batch_id, and the snapshot table's manifest commit makes the append
atomic — so recording the batch_id IN the manifest turns replays into
no-ops (the Delta/Iceberg ``txnAppId``/``txnVersion`` idempotent-write
trick). A crash between append and checkpoint commit re-delivers the
batch; the sink sees its batch_id already committed and skips, so the
table never double-counts.

Scale shape: each micro-batch is one manifest commit (O(1) planning for
readers regardless of batch count); downstream incremental consumers
read the new snapshot versions via ``read_diff`` — the full
stream-to-lakehouse ingestion path with O(delta) fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.snapshots import (
    latest_version, read_manifest, snapshot_append,
)


class SnapshotTableSink:
    """Exactly-once streaming appender for a snapshot table."""

    def __init__(
        self,
        table_dir: str,
        checkpoint_dir: str,
        stats_cols: list[str] | None = None,
        app_id: str | None = None,
    ) -> None:
        self.table_dir = table_dir
        self.checkpoint_dir = checkpoint_dir
        self.stats_cols = stats_cols
        # The sink's durable identity (Delta's txnAppId): batch ids are
        # only monotone WITHIN one checkpoint, so the replay mark must
        # be keyed per sink — a second streaming query (fresh
        # checkpoint, batch ids restarting at 0) writing to the same
        # table must never be filtered by this one's mark. The
        # checkpoint dir is the natural default identity: one
        # checkpoint == one batch-id sequence.
        self.app_id = str(app_id or checkpoint_dir)

    def committed_batch_ids(self) -> set[int]:
        """batch_ids recorded by THIS sink's prior commits (manifest
        scan; a production table would index these, but the scan is one
        small json per version and only runs once per micro-batch).
        Commits tagged with another sink's txn_app_id are ignored;
        untagged commits (pre-upgrade, single-writer by contract)
        count."""
        out = set()
        for v in range(1, latest_version(self.table_dir) + 1):
            try:
                m = read_manifest(self.table_dir, v)
            except FileNotFoundError:
                continue  # version vacuumed below the retention horizon
            b = m.get("batch_id")
            app = m.get("txn_app_id")
            if b is not None and (app is None or str(app) == self.app_id):
                out.add(int(b))
        return out

    def batch_high_water_mark(self) -> int:
        """Highest batch_id THIS sink ever committed, read from the
        HEAD manifest's ``batch_hwms[app_id]`` — which every commit
        (including compaction) carries forward like sequence numbers,
        so ``snapshot_vacuum`` removing old manifests can never erase
        the idempotence record. Falls back to the legacy global
        ``max_batch_id`` only for pre-upgrade tables (no per-app marks
        at all), which were single-writer by contract."""
        head = latest_version(self.table_dir)
        if not head:
            return -1
        m = read_manifest(self.table_dir, head)
        hwms = m.get("batch_hwms")
        if hwms is not None:
            if self.app_id in hwms:
                return int(hwms[self.app_id])
            # Per-writer marks exist but none for THIS sink: the table
            # may still hold pre-upgrade (untagged) commits that ARE
            # this sink's history — a pre-upgrade writer resuming after
            # some other new-identity sink committed once must not see
            # -1 and re-append. Scan (untagged commits count there);
            # the legacy global max_batch_id cannot be used here — it
            # absorbs the OTHER sinks' tagged batch ids.
            return max(self.committed_batch_ids(), default=-1)
        if m.get("max_batch_id") is not None:
            return int(m["max_batch_id"])
        return max(self.committed_batch_ids(), default=-1)

    def process_batch(self, df: DataFrame, batch_id: int) -> None:
        # Structured Streaming batch_ids are monotonically increasing
        # per checkpoint, so a durable per-sink high-water mark is a
        # complete replay filter — and unlike the per-version scan it
        # survives vacuum (the mark rides in every retained manifest).
        if int(batch_id) <= self.batch_high_water_mark():
            return  # re-delivered batch: the append already committed
        snapshot_append(
            df, self.table_dir, stats_cols=self.stats_cols,
            extra={"batch_id": int(batch_id), "txn_app_id": self.app_id},
        )

    def run_available_now(self, stream_df: DataFrame) -> None:
        (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )


class ChangeFeedConsumer:
    """Cursor-persisted incremental consumer of a snapshot table — the
    downstream half of the ingest loop: each ``poll`` returns the
    change feed since the last committed cursor (tagged insert/delete
    rows via ``read_changes``) and ``commit`` advances the cursor
    atomically (tmp + rename), so a crashed consumer re-reads the same
    window instead of skipping it. At-least-once by construction;
    consumers dedupe on (_commit_version, key) if they need effectively
    exactly-once."""

    def __init__(self, table_dir: str, cursor_path: str) -> None:
        self.table_dir = table_dir
        self.cursor_path = cursor_path

    def position(self) -> int:
        try:
            with open(self.cursor_path) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def poll(self, spark):
        """(changes DataFrame or None, head version) since the cursor."""
        from ..sources.snapshots import read_changes

        start = self.position()
        head = latest_version(self.table_dir)
        if head <= start:
            return None, head
        try:
            return read_changes(spark, self.table_dir, start, head), head
        except ValueError:  # only compactions in the window
            return None, head

    def commit(self, version: int) -> None:
        import os

        tmp = f"{self.cursor_path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(str(int(version)))
        os.replace(tmp, self.cursor_path)
