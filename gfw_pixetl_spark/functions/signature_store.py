"""Bucketed MinHash signature store: the persisted, storage-partitioned
index that makes incremental dedup O(batch) END TO END.

q323 established the asymmetric batch x index band join — but its index
side is re-signed and re-shuffled every run. At 100 TB the historical
index is the big side: re-hashing it per batch costs a full corpus
pass, and re-shuffling it costs an Exchange of billions of band keys.
The production answer is a storage-partitioned join: persist the index
ALREADY partitioned by its join key, so every future batch join reads
the index in place and only the (small) batch side moves.

Spark-native mechanics: ``bucketBy(n, cols).sortBy(cols).saveAsTable``
records the hash-partitioning in the catalog; a join on exactly the
bucket columns then plans the bucketed side with NO Exchange (the
FileScan shows ``Bucketed: true`` and the only Exchange in the plan is
the batch side being hashed into the same n buckets). This is the same
contract as Iceberg's storage-partitioned joins / Hive bucketed joins,
expressed through Spark's own catalog. The bucket spec is the physical
twin of the snapshot-table zone maps (``sources/snapshots.py``): there
the manifest prunes WHICH files a reader opens; here the bucket hash
pins WHERE each key lives so the join never reshuffles the stored side.

Two tables per store:

* ``<name>_bands`` — (doc_id, band_id, key), bucketed by (band_id, key):
  the LSH probe side. Batch band-keys join it to find candidates.
* ``<name>_sigs`` — (doc_id, mh0..mh15), bucketed by (doc_id): the
  verification side. Candidate index ids join it to score n_match.

``append_signatures`` extends the index with ``insertInto``, which
preserves the bucket spec — the nightly index-maintenance op; new files
land in the right buckets and the next batch join still skips the
index-side Exchange.

Verified by ``tests/test_signature_store.py`` (plan assertions: zero
Exchange above either store scan) and oracle-checked by q362 (same
DuckDB replay as q323 — identical results, storage-partitioned plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dedup as D

N_BUCKETS = 16


def band_key_cols(sigs: DataFrame, k: int = D.N_MINHASH,
                  bands: int = D.N_BANDS) -> DataFrame:
    """(doc_id, band_id, key) band keys from a signature frame — the
    md5-conv band hash q28/q323 use, factored so the store writer and
    the batch prober compute bit-identical keys."""
    rows = k // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows + r}").cast("string")
                 for r in range(rows)]
        band_cols.append(
            F.conv(F.substring(F.md5(F.concat_ws("_", *parts)), 1, 15),
                   16, 10).cast("bigint").alias(f"band{b}"))
    return sigs.select("doc_id", *band_cols).select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_id"),
                     F.col(f"band{b}").alias("key"))
            for b in range(bands)])).alias("bk"),
    ).select("doc_id", "bk.band_id", "bk.key")


def _reset_table(spark: SparkSession, table: str) -> None:
    """Drop the catalog entry AND any orphaned managed location (a
    crashed writer can leave the directory without the catalog row,
    which blocks the next saveAsTable)."""
    import os
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(wh.removeprefix("file:"), table.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)


def store_signatures(
    spark: SparkSession, docs: DataFrame, name: str,
    n_buckets: int = N_BUCKETS, text_col: str = "text",
) -> dict:
    """Sign ``docs`` once and persist the index as two bucketed tables.
    The signature pass runs exactly once (localCheckpoint) and each
    table is written pre-partitioned on its join key."""
    _reset_table(spark, f"{name}_sigs")
    _reset_table(spark, f"{name}_bands")
    sigs = D.minhash_signatures(docs, text_col).localCheckpoint(
        eager=False)
    (sigs.write.format("parquet").mode("overwrite")
         .bucketBy(n_buckets, "doc_id").sortBy("doc_id")
         .saveAsTable(f"{name}_sigs"))
    (band_key_cols(sigs).write.format("parquet").mode("overwrite")
         .bucketBy(n_buckets, "band_id", "key").sortBy("band_id", "key")
         .saveAsTable(f"{name}_bands"))
    return {
        "sigs_table": f"{name}_sigs",
        "bands_table": f"{name}_bands",
        "n_docs": spark.table(f"{name}_sigs").count(),
        "n_buckets": n_buckets,
    }


def append_signatures(spark: SparkSession, docs: DataFrame, name: str,
                      text_col: str = "text") -> int:
    """Nightly index maintenance: sign only the new docs and
    ``insertInto`` both tables — bucketing is preserved, so future
    batch joins keep the no-Exchange index scan. Returns rows added."""
    sigs = D.minhash_signatures(docs, text_col).localCheckpoint(
        eager=False)
    sigs.write.format("parquet").insertInto(f"{name}_sigs")
    band_key_cols(sigs).write.format("parquet").insertInto(
        f"{name}_bands")
    # invalidate cached file listings explicitly: when the append runs
    # inside foreachBatch (a cloned session) the caller's session may
    # hold a stale relation cache for the store tables
    spark.catalog.refreshTable(f"{name}_sigs")
    spark.catalog.refreshTable(f"{name}_bands")
    return sigs.count()


def incremental_dedup_against_store(
    spark: SparkSession, batch_docs: DataFrame, name: str,
    text_col: str = "text", k: int = D.N_MINHASH,
) -> DataFrame:
    """q323's semantics against the PERSISTED index: sign only the
    batch, probe the bucketed band table (index side never reshuffles —
    its Exchange is eliminated by the bucket spec), verify candidates
    against the bucketed signature table, best match per batch doc.

    Join hints pin sort-merge so the storage-partitioned shape is what
    executes (a broadcast of the batch would also skip the index
    Exchange, but SMJ is the shape that still works when the batch is
    10 TB of daily crawl). Output: (batch_id, match_id, n_match,
    est_jaccard, is_dup) — identical to q323.
    """
    batch_sigs = D.minhash_signatures(batch_docs, text_col) \
        .localCheckpoint(eager=False)
    batch_keys = band_key_cols(batch_sigs).select(
        F.col("doc_id").alias("batch_id"), "band_id", "key")

    index_bands = spark.table(f"{name}_bands").select(
        F.col("doc_id").alias("index_id"), "band_id", "key")
    cand = (index_bands.join(batch_keys.hint("merge"),
                             ["band_id", "key"])
            .select("batch_id", "index_id").distinct())

    index_sigs = spark.table(f"{name}_sigs").select(
        F.col("doc_id").alias("index_id"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(k)])
    sb = batch_sigs.select(
        F.col("doc_id").alias("batch_id"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(k)])

    cand_by_index = cand.select(F.col("index_id").alias("doc_id"),
                                "batch_id")
    scored = index_sigs.withColumnRenamed("index_id", "doc_id").join(
        cand_by_index.hint("merge"), "doc_id")
    n_match = None
    for i in range(k):
        t = (F.col(f"a{i}") == F.col(f"b{i}")).cast("int")
        n_match = t if n_match is None else n_match + t
    m = (scored.withColumnRenamed("doc_id", "index_id")
         .join(sb, "batch_id")
         .select("batch_id", "index_id", n_match.alias("n_match")))
    best = (
        m.groupBy("batch_id")
        .agg(F.max(F.struct(F.col("n_match"),
                            (-F.col("index_id")).alias("ni"))).alias("t"))
        .select("batch_id", (-F.col("t.ni")).alias("match_id"),
                F.col("t.n_match").alias("n_match"))
    )
    return best.select(
        "batch_id", "match_id",
        F.col("n_match").cast("bigint").alias("n_match"),
        F.round(F.col("n_match") / float(k), 6).alias("est_jaccard"),
        (F.col("n_match") >= k // 2).alias("is_dup"),
    ).orderBy("batch_id")
