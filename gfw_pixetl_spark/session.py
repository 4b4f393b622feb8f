"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[N]``; the same config block is what we would ship
to a 1000-executor cluster — AQE on (runtime re-planning, skew-join
splitting, partition coalescing), Arrow enabled for the pandas-UDF kernels,
and a UTC session timezone so timestamp semantics match external oracles and
naive-parquet producers.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_memory() -> str:
    """Size the driver heap to the machine: in ``local[N]`` the driver
    JVM IS every executor, so the 32 concurrent tasks' execution+storage
    memory all come out of this one heap. A fixed small heap turns the
    heavy join/aggregation queries GC-bound (measured ~40% slower at
    8 g vs 24 g on a 128 GiB box). Take ~25% of physical RAM, clamped
    to [8 g, 32 g]; on a real cluster the driver does no data work and
    ``SPARK_DRIVER_MEMORY`` overrides this entirely.
    """
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemTotal:"):
                    total_gib = int(line.split()[1]) / (1024 * 1024)
                    return f"{max(8, min(32, int(total_gib // 4)))}g"
    except OSError:
        pass
    return "8g"


def get_spark(
    app_name: str = "gfw_pixetl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the engine.

    ``shuffle_partitions`` defaults to the parallelism of the master; on a
    real cluster you would size it to ~2-3x total cores and let AQE coalesce.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- optimizer / runtime ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Prefer shuffled-hash over sort-merge when the per-partition
        # build side fits (guide: SHJ skips both sorts; SMJ remains the
        # planner's fallback when sizes don't qualify), and let AQE
        # rewrite SMJ -> SHJ at runtime when every post-shuffle partition
        # is under the threshold. Join strategy never changes results.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(64 * 1024 * 1024),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        # --- Arrow for pandas_udf / mapInPandas kernels ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- deterministic timestamp semantics (naive parquet == UTC) ---
        .config("spark.sql.session.timeZone", "UTC")
        # read TIMESTAMP(NANOS) parquet as long; loaders truncate to micros
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- scan sizing: 128 MiB splits is the parquet sweet spot ---
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get(
            "SPARK_DRIVER_MEMORY", _default_driver_memory()))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)) -> dict:
    """Load the harness parquet tables and register them as temp views."""
    out = {}
    for name in names:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
