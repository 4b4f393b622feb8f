"""Columnar-format metadata audits: parquet footers, zone maps,
row-group pruning. (Round 8, sixth session.)

The 100 TB planning story depends on scan-free facts: a petabyte
catalog is planned from footers, not data pages. These queries decode
parquet FileMetaData with the in-tree Thrift-compact reader
(``sources/parquetmeta.py``) on EXECUTORS and verify every decoded
statistic against the data itself via the DuckDB oracle — a wrong
varint, field id, or stats blob shows up as a value mismatch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, register
from .lakeops import _derived_dir

# --------------------------------------------------------------------------
# q441 — PARQUET FOOTER STATS AUDIT over the four shipped tables the
# engine scans most: the pure-Python footer decode runs as a
# distributed mapInPandas over a DataFrame of file paths (one task per
# file — exactly how a 100 TB catalog would fan out over millions of
# objects), emits per-column num_values / null_count / min / max from
# the FOOTER ONLY, and the oracle recomputes the same facts from the
# rows. Repeated types are covered: embedding.list.element's
# num_values must equal SUM(len(embedding)). Doubles are normalized
# (+0) so a stats blob holding -0.0 compares equal in both engines.
# --------------------------------------------------------------------------
_AUDIT_COLS: dict[str, list[str]] = {
    "orders": ["o_orderkey", "o_custkey", "o_totalprice",
               "o_orderstatus", "o_orderpriority"],
    "lineitem": ["l_orderkey", "l_partkey", "l_quantity",
                 "l_extendedprice", "l_returnflag", "l_linestatus"],
    "documents": ["doc_id", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "label", "embedding.list.element"],
}

_Q441_SCHEMA = ("table_name string, column_path string, n_values long, "
                "n_nulls long, min_num double, max_num double, "
                "min_str string, max_str string")


@register(
    "q441_parquet_footer_audit",
    oracle="""
    WITH facts AS (
      SELECT 'orders' AS table_name, 'o_orderkey' AS column_path,
             COUNT(*) AS n_values, 0 AS n_nulls,
             MIN(o_orderkey) + 0.0 AS min_num, MAX(o_orderkey) + 0.0 AS max_num,
             NULL AS min_str, NULL AS max_str FROM orders
      UNION ALL
      SELECT 'orders', 'o_custkey', COUNT(*), 0,
             MIN(o_custkey) + 0.0, MAX(o_custkey) + 0.0, NULL, NULL FROM orders
      UNION ALL
      SELECT 'orders', 'o_totalprice', COUNT(*), 0,
             MIN(o_totalprice) + 0, MAX(o_totalprice) + 0, NULL, NULL FROM orders
      UNION ALL
      SELECT 'orders', 'o_orderstatus', COUNT(*), 0, NULL, NULL,
             MIN(o_orderstatus), MAX(o_orderstatus) FROM orders
      UNION ALL
      SELECT 'orders', 'o_orderpriority', COUNT(*), 0, NULL, NULL,
             MIN(o_orderpriority), MAX(o_orderpriority) FROM orders
      UNION ALL
      SELECT 'lineitem', 'l_orderkey', COUNT(*), 0,
             MIN(l_orderkey) + 0.0, MAX(l_orderkey) + 0.0, NULL, NULL FROM lineitem
      UNION ALL
      SELECT 'lineitem', 'l_partkey', COUNT(*), 0,
             MIN(l_partkey) + 0.0, MAX(l_partkey) + 0.0, NULL, NULL FROM lineitem
      UNION ALL
      SELECT 'lineitem', 'l_quantity', COUNT(*), 0,
             MIN(l_quantity) + 0, MAX(l_quantity) + 0, NULL, NULL FROM lineitem
      UNION ALL
      SELECT 'lineitem', 'l_extendedprice', COUNT(*), 0,
             MIN(l_extendedprice) + 0, MAX(l_extendedprice) + 0, NULL, NULL
      FROM lineitem
      UNION ALL
      SELECT 'lineitem', 'l_returnflag', COUNT(*), 0, NULL, NULL,
             MIN(l_returnflag), MAX(l_returnflag) FROM lineitem
      UNION ALL
      SELECT 'lineitem', 'l_linestatus', COUNT(*), 0, NULL, NULL,
             MIN(l_linestatus), MAX(l_linestatus) FROM lineitem
      UNION ALL
      SELECT 'documents', 'doc_id', COUNT(*), 0,
             MIN(doc_id) + 0.0, MAX(doc_id) + 0.0, NULL, NULL FROM documents
      UNION ALL
      SELECT 'documents', 'lang', COUNT(*), 0, NULL, NULL,
             MIN(lang), MAX(lang) FROM documents
      UNION ALL
      SELECT 'documents', 'source', COUNT(*), 0, NULL, NULL,
             MIN(source), MAX(source) FROM documents
      UNION ALL
      SELECT 'documents', 'n_chars', COUNT(*), 0,
             MIN(n_chars) + 0.0, MAX(n_chars) + 0.0, NULL, NULL FROM documents
      UNION ALL
      SELECT 'embeddings', 'vec_id', COUNT(*), 0,
             MIN(vec_id) + 0.0, MAX(vec_id) + 0.0, NULL, NULL FROM embeddings
      UNION ALL
      SELECT 'embeddings', 'label', COUNT(*), 0,
             MIN(label) + 0.0, MAX(label) + 0.0, NULL, NULL FROM embeddings
      UNION ALL
      SELECT 'embeddings', 'embedding.list.element',
             (SELECT SUM(len(embedding)) FROM embeddings), 0,
             (SELECT MIN(e) + 0 FROM (SELECT UNNEST(embedding) AS e
                                      FROM embeddings)),
             (SELECT MAX(e) + 0 FROM (SELECT UNNEST(embedding) AS e
                                      FROM embeddings)),
             NULL, NULL
    )
    SELECT table_name, column_path,
           CAST(n_values AS BIGINT) AS n_values,
           CAST(n_nulls AS BIGINT) AS n_nulls,
           CAST(min_num AS DOUBLE) AS min_num,
           CAST(max_num AS DOUBLE) AS max_num,
           CAST(min_str AS VARCHAR) AS min_str,
           CAST(max_str AS VARCHAR) AS max_str
    FROM facts
    """,
)
def q441(spark: SparkSession, sf_dir: str) -> DataFrame:
    targets = [(t, f"{sf_dir}/{t}.parquet", cols)
               for t, cols in _AUDIT_COLS.items()]
    paths = spark.createDataFrame(
        [(t, p, cols) for t, p, cols in targets],
        "table_name string, path string, wanted array<string>",
    ).repartition(len(targets))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..sources.parquetmeta import audit_rows

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "table_name", "column_path", "n_values", "n_nulls",
                "min_num", "max_num", "min_str", "max_str")}
            for tname, path, wanted in zip(
                    pdf["table_name"], pdf["path"], pdf["wanted"]):
                per: dict[str, dict] = {}
                for r in audit_rows(path):
                    cp = r["path_in_schema"]
                    if cp not in set(wanted):
                        continue
                    agg = per.setdefault(cp, {
                        "n_values": 0, "n_nulls": 0,
                        "mins": [], "maxs": [], "numeric": None})
                    agg["n_values"] += r["num_values"]
                    agg["n_nulls"] += r["null_count"] or 0
                    agg["mins"].append(r["stat_min"])
                    agg["maxs"].append(r["stat_max"])
                    agg["numeric"] = r["phys_type"] not in (
                        "BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY")
                for cp, agg in per.items():
                    mn, mx = min(agg["mins"]), max(agg["maxs"])
                    out["table_name"].append(tname)
                    out["column_path"].append(cp)
                    out["n_values"].append(agg["n_values"])
                    out["n_nulls"].append(agg["n_nulls"])
                    # +0 folds -0.0 to 0.0 — the oracle does the same.
                    out["min_num"].append(
                        float(mn) + 0 if agg["numeric"] else None)
                    out["max_num"].append(
                        float(mx) + 0 if agg["numeric"] else None)
                    out["min_str"].append(mn if not agg["numeric"] else None)
                    out["max_str"].append(mx if not agg["numeric"] else None)
            yield pd.DataFrame(out)

    return paths.mapInPandas(kernel, _Q441_SCHEMA)


# --------------------------------------------------------------------------
# q442 — ZONE-MAP AUDIT at row-group granularity. A copy of orders
# (key, custkey, price) is sorted by o_orderkey and written with
# row_group_size=1000 (pyarrow — deterministic group boundaries:
# group i holds sorted rows [1000*i, 1000*(i+1))). The footer decode
# then emits each group's row count and min/max zone values, and the
# oracle RECONSTRUCTS the identical zones from the rows with
# ROW_NUMBER() bucketing — proving both the decode and the writer's
# stats are exact at the granularity the pruner uses.
# --------------------------------------------------------------------------
_RG_SIZE = 1000


def _zoned_orders(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pq.read_table(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_custkey",
                                     "o_totalprice"])
        tbl = tbl.sort_by("o_orderkey")
        os.makedirs(d, exist_ok=True)
        pq.write_table(tbl, f"{d}/orders_zoned.parquet",
                       row_group_size=_RG_SIZE)
        _ = pa  # keep import explicit

    return _derived_dir(sf_dir, "zoned", build) + "/orders_zoned.parquet"


_Q442_SCHEMA = ("row_group_id int, n_rows long, min_key long, max_key long, "
                "min_price double, max_price double")

_Q442_ORACLE = f"""
    WITH ranked AS (
      SELECT o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS rn
      FROM orders
    )
    SELECT CAST(rn // {_RG_SIZE} AS INTEGER) AS row_group_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
           MIN(o_totalprice) + 0 AS min_price,
           MAX(o_totalprice) + 0 AS max_price
    FROM ranked GROUP BY 1
"""


@register("q442_zone_map_audit", oracle=_Q442_ORACLE)
def q442(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _zoned_orders(spark, sf_dir)
    paths = spark.createDataFrame([(path,)], "path string")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..sources.parquetmeta import audit_rows

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "row_group_id", "n_rows", "min_key", "max_key",
                "min_price", "max_price")}
            for path in pdf["path"]:
                groups: dict[int, dict] = {}
                for r in audit_rows(path):
                    g = groups.setdefault(
                        r["row_group_id"], {"n_rows": r["rg_num_rows"]})
                    if r["path_in_schema"] == "o_orderkey":
                        g["min_key"], g["max_key"] = r["stat_min"], r["stat_max"]
                    elif r["path_in_schema"] == "o_totalprice":
                        g["min_price"] = float(r["stat_min"]) + 0
                        g["max_price"] = float(r["stat_max"]) + 0
                for gid in sorted(groups):
                    g = groups[gid]
                    out["row_group_id"].append(gid)
                    out["n_rows"].append(g["n_rows"])
                    out["min_key"].append(g["min_key"])
                    out["max_key"].append(g["max_key"])
                    out["min_price"].append(g["min_price"])
                    out["max_price"].append(g["max_price"])
            yield pd.DataFrame(out)

    return paths.mapInPandas(kernel, _Q442_SCHEMA)


# --------------------------------------------------------------------------
# q443 — ROW-GROUP PRUNING EFFECTIVENESS: the footer-only planner
# (sources/parquetmeta.py::prune_row_groups) decides which groups of
# the zoned file survive two predicates — a range on the SORT KEY
# (clustered zones: prunes to ~1 group per 1000 keys) and a high
# price threshold (unclustered zones: prunes nothing — every group's
# [min,max] straddles the threshold). Emits the plan (groups kept,
# row upper bound) plus the TRUE match count from scanning, so the
# oracle checks both the zone arithmetic and the guarantee
# kept_rows >= n_matches. This is the measurement that tells a 100 TB
# operator whether re-clustering a table is worth it.
# --------------------------------------------------------------------------
_KEY_LO, _KEY_HI = 100, 299
_PRICE_LO = 400_000.0

_Q443_ORACLE = f"""
    WITH ranked AS (
      SELECT o_orderkey, o_totalprice,
             (ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) // {_RG_SIZE}
               AS gid
      FROM orders
    ), zones AS (
      SELECT gid, COUNT(*) AS n_rows,
             MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
             MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
      FROM ranked GROUP BY gid
    )
    SELECT 'key_range' AS scenario,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN max_key >= {_KEY_LO} AND min_key <= {_KEY_HI}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN max_key >= {_KEY_LO} AND min_key <= {_KEY_HI}
                         THEN n_rows ELSE 0 END) AS BIGINT) AS kept_rows,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
            WHERE o_orderkey BETWEEN {_KEY_LO} AND {_KEY_HI}) AS n_matches
    FROM zones
    UNION ALL
    SELECT 'price_threshold',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN max_price >= {_PRICE_LO} THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(SUM(CASE WHEN max_price >= {_PRICE_LO} THEN n_rows ELSE 0 END)
                AS BIGINT),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
            WHERE o_totalprice >= {_PRICE_LO})
    FROM zones
"""


@register("q443_rowgroup_pruning", oracle=_Q443_ORACLE)
def q443(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.parquetmeta import prune_row_groups

    path = _zoned_orders(spark, sf_dir)
    # Footer-only plan (driver-side: two ranged reads of ONE footer —
    # bounded, not a data scan).
    key_plan = prune_row_groups(path, "o_orderkey",
                                lower=_KEY_LO, upper=_KEY_HI)
    price_plan = prune_row_groups(path, "o_totalprice", lower=_PRICE_LO)

    zoned = spark.read.parquet(path)
    matches = zoned.select(
        F.sum(((F.col("o_orderkey") >= _KEY_LO)
               & (F.col("o_orderkey") <= _KEY_HI)).cast("long"))
        .alias("key_matches"),
        F.sum((F.col("o_totalprice") >= _PRICE_LO).cast("long"))
        .alias("price_matches"),
    ).collect()[0]  # bounded: one row of two counters

    rows = [
        ("key_range", key_plan["n_groups"], key_plan["n_kept"],
         key_plan["kept_rows"], int(matches["key_matches"])),
        ("price_threshold", price_plan["n_groups"], price_plan["n_kept"],
         price_plan["kept_rows"], int(matches["price_matches"])),
    ]
    return spark.createDataFrame(
        rows, "scenario string, n_groups long, n_kept long, "
              "kept_rows long, n_matches long")


# --------------------------------------------------------------------------
# q444 — ORC ROUND-TRIP through the in-tree codec (sources/orc.py):
# documents is hash-repartitioned and each EXECUTOR task writes one
# ORC shard with our writer (RLEv2/DIRECT_V2 — the modern
# generation: SHORT_REPEAT/DELTA/DIRECT integer runs — PRESENT null
# streams, ZLIB chunk framing), then a second distributed pass decodes the shards
# with our reader and aggregates per language. Any bit wrong in
# either direction — varint, zigzag, RLE run header, bool bit-RLE,
# chunk frame, protobuf footer — breaks the value hash against the
# oracle, which never sees ORC at all. The shard-per-task layout is
# exactly how a 100 TB export fans out over an object store.
# --------------------------------------------------------------------------
_ORC_SHARDS = 8


def _orc_docs_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os
        import uuid as _uuid

        os.makedirs(d, exist_ok=True)
        df = (load(spark, sf_dir, "documents")
              .select("doc_id", "lang", "source", "n_chars")
              .withColumn("src_opt", F.when(F.col("doc_id") % 7 != 0,
                                            F.col("source")))
              .withColumn("chars_d", F.col("n_chars") * 0.5)
              .withColumn("even", F.col("doc_id") % 2 == 0)
              .repartition(_ORC_SHARDS, "doc_id"))

        def write_shard(batches: Iterator[pd.DataFrame]
                        ) -> Iterator[pd.DataFrame]:
            from ..sources import orc as o

            parts = [b for b in batches if len(b)]
            if not parts:
                return
            pdf = pd.concat(parts, ignore_index=True)
            rows = list(zip(
                (int(v) for v in pdf["doc_id"]),
                pdf["lang"],
                (None if v is None else str(v) for v in pdf["src_opt"]),
                (float(v) for v in pdf["chars_d"]),
                (int(v) for v in pdf["n_chars"]),
                (bool(v) for v in pdf["even"]),
            ))
            cols = [o.OrcColumn("doc_id", o.K_LONG),
                    o.OrcColumn("lang", o.K_STRING),
                    o.OrcColumn("src_opt", o.K_STRING),
                    o.OrcColumn("chars_d", o.K_DOUBLE),
                    o.OrcColumn("n_chars", o.K_LONG),
                    o.OrcColumn("even", o.K_BOOLEAN)]
            path = os.path.join(d, f"shard-{_uuid.uuid4().hex}.orc")
            info = o.write_orc(path, cols, rows, stripe_rows=4096,
                               rle_version=2)
            yield pd.DataFrame({"path": [path],
                                "n_rows": [info["n_rows"]]})

        # bounded collect: one row per shard
        df.mapInPandas(write_shard, "path string, n_rows long").collect()

    return _derived_dir(sf_dir, "orcdocs2", build)


@register(
    "q444_orc_roundtrip",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN doc_id % 7 != 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_src,
           CAST(SUM(CAST(n_chars * 0.5 AS DECIMAL(18,1))) AS DOUBLE)
             AS sum_chars_d,
           CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_even,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM documents GROUP BY lang
    """,
)
def q444(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob

    d = _orc_docs_dir(spark, sf_dir)
    files = sorted(_glob.glob(d + "/*.orc"))
    paths = spark.createDataFrame([(p,) for p in files],
                                  "path string").repartition(len(files))

    def read_shard(batches: Iterator[pd.DataFrame]
                   ) -> Iterator[pd.DataFrame]:
        from ..sources import orc as o

        for pdf in batches:
            for path in pdf["path"]:
                cols = o.read_orc(path)
                yield pd.DataFrame({
                    "doc_id": pd.Series(cols["doc_id"], dtype="int64"),
                    "lang": cols["lang"],
                    "src_opt": cols["src_opt"],
                    "chars_d": pd.Series(cols["chars_d"], dtype="float64"),
                    "even": pd.Series(
                        [bool(v) for v in cols["even"]], dtype="bool"),
                })

    decoded = paths.mapInPandas(
        read_shard,
        "doc_id long, lang string, src_opt string, chars_d double, "
        "even boolean")
    return decoded.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.count("src_opt").alias("n_src"),
        F.sum(F.col("chars_d").cast("decimal(18,1)")).cast("double")
         .alias("sum_chars_d"),
        F.sum(F.col("even").cast("long")).alias("n_even"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


# --------------------------------------------------------------------------
# q445 — SPARK-NATIVE ORC -> OUR READER: Spark's own ORC writer emits
# the v2 generation of the format (RLEv2 SHORT_REPEAT/DIRECT/DELTA
# integer runs, DICTIONARY_V2 strings, zlib chunks) — none of which
# our writer produces, so this is a genuinely independent bitstream
# exercising the other half of the reader. Decoded rows are
# aggregated per order priority and checked against the oracle's
# recompute from the parquet source.
# --------------------------------------------------------------------------
def _orc_orders_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        (load(spark, sf_dir, "orders")
         .select("o_orderkey", "o_custkey", "o_totalprice",
                 "o_orderpriority")
         .repartition(4)
         .write.mode("overwrite").orc(d))

    return _derived_dir(sf_dir, "orcnative", build)


@register(
    "q445_orc_spark_native",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
           MIN(o_totalprice) + 0 AS min_price,
           MAX(o_totalprice) + 0 AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def q445(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob

    d = _orc_orders_dir(spark, sf_dir)
    files = sorted(_glob.glob(d + "/*.orc"))
    paths = spark.createDataFrame([(p,) for p in files],
                                  "path string").repartition(len(files))

    def read_shard(batches: Iterator[pd.DataFrame]
                   ) -> Iterator[pd.DataFrame]:
        from ..sources import orc as o

        for pdf in batches:
            for path in pdf["path"]:
                cols = o.read_orc(path)
                yield pd.DataFrame({
                    "o_orderkey": pd.Series(cols["o_orderkey"],
                                            dtype="int64"),
                    "o_custkey": pd.Series(cols["o_custkey"],
                                           dtype="int64"),
                    "o_totalprice": pd.Series(cols["o_totalprice"],
                                              dtype="float64"),
                    "o_orderpriority": cols["o_orderpriority"],
                })

    decoded = paths.mapInPandas(
        read_shard,
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderpriority string")
    return decoded.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum("o_orderkey").alias("sum_key"),
        F.sum("o_custkey").alias("sum_cust"),
        (F.min("o_totalprice") + 0).alias("min_price"),
        (F.max("o_totalprice") + 0).alias("max_price"),
    )


# --------------------------------------------------------------------------
# q446 — ORC STRIPE-STATS AUDIT: the ORC twin of q442's parquet zone
# maps. A sorted copy of orders is written by OUR writer with 2000-row
# stripes; the query then reads ONLY the footer + StripeStatistics
# metadata (never a data stream) and emits each stripe's row count and
# min/max/sum of the sort key — which the oracle reconstructs from the
# rows with ROW_NUMBER bucketing. Proves the writer's protobuf stats,
# the stripe framing, and the reader's metadata path are all exact at
# the granularity an ORC predicate-pushdown planner uses.
# --------------------------------------------------------------------------
_ORC_STRIPE_ROWS = 2000


def _orc_zoned_path(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os

        import pyarrow.parquet as pq

        from ..sources import orc as o

        tbl = pq.read_table(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_custkey"])
        tbl = tbl.sort_by("o_orderkey")
        rows = list(zip(tbl.column("o_orderkey").to_pylist(),
                        tbl.column("o_custkey").to_pylist()))
        os.makedirs(d, exist_ok=True)
        o.write_orc(d + "/orders_zoned.orc",
                    [o.OrcColumn("o_orderkey", o.K_LONG),
                     o.OrcColumn("o_custkey", o.K_LONG)],
                    rows, stripe_rows=_ORC_STRIPE_ROWS)

    return _derived_dir(sf_dir, "orczoned", build) + "/orders_zoned.orc"


_Q446_ORACLE = f"""
    WITH ranked AS (
      SELECT o_orderkey,
             (ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1)
               // {_ORC_STRIPE_ROWS} AS sid
      FROM orders
    )
    SELECT CAST(sid AS INTEGER) AS stripe_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
    FROM ranked GROUP BY 1
"""


@register("q446_orc_stripe_stats", oracle=_Q446_ORACLE)
def q446(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import orc as o

    path = _orc_zoned_path(spark, sf_dir)
    with open(path, "rb") as fh:
        f = o.OrcFile(fh.read())
    # metadata only: stripes[] row counts + StripeStatistics col 1
    rows = []
    for si, s in enumerate(f.stripes):
        st = f.stripe_stats[si][1]  # column id 1 = o_orderkey
        rows.append((si, s["numberOfRows"],
                     st["min"], st["max"], st["sum"]))
    return spark.createDataFrame(
        rows, "stripe_id int, n_rows long, min_key long, max_key long, "
              "sum_key long")


# --------------------------------------------------------------------------
# q447 — ORC STRIPE-PRUNING EFFECTIVENESS, mirroring q443's parquet
# planner: the footer-only plan (sources/orc.py::prune_stripes, a
# tail-ranged read that never touches a data stream) decides which
# stripes of the sorted file survive a range on the SORT KEY
# (clustered zones: ~1 stripe per 2000 keys) and a floor on the
# UNCLUSTERED o_custkey (every stripe's zone straddles it — prunes
# nothing). True match counts come from Spark's own ORC scan of the
# same file (native reader on our writer's output — interop is load-
# bearing here too), and the oracle re-derives both the zone
# arithmetic and the kept_rows >= n_matches guarantee.
# --------------------------------------------------------------------------
_OKEY_LO, _OKEY_HI = 100, 299
_CUST_LO = 50


_Q447_ORACLE = f"""
    WITH ranked AS (
      SELECT o_orderkey, o_custkey,
             (ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1)
               // {_ORC_STRIPE_ROWS} AS sid
      FROM orders
    ), zones AS (
      SELECT sid, COUNT(*) AS n_rows,
             MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
             MIN(o_custkey) AS min_cust, MAX(o_custkey) AS max_cust
      FROM ranked GROUP BY sid
    )
    SELECT 'key_range' AS scenario,
           CAST(COUNT(*) AS BIGINT) AS n_stripes,
           CAST(SUM(CASE WHEN max_key >= {_OKEY_LO} AND min_key <= {_OKEY_HI}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN max_key >= {_OKEY_LO} AND min_key <= {_OKEY_HI}
                         THEN n_rows ELSE 0 END) AS BIGINT) AS kept_rows,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
            WHERE o_orderkey BETWEEN {_OKEY_LO} AND {_OKEY_HI}) AS n_matches
    FROM zones
    UNION ALL
    SELECT 'cust_floor',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN max_cust >= {_CUST_LO} THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(SUM(CASE WHEN max_cust >= {_CUST_LO} THEN n_rows ELSE 0 END)
                AS BIGINT),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
            WHERE o_custkey >= {_CUST_LO})
    FROM zones
"""


@register("q447_orc_stripe_pruning", oracle=_Q447_ORACLE)
def q447(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.orc import prune_stripes

    path = _orc_zoned_path(spark, sf_dir)
    key_plan = prune_stripes(path, "o_orderkey",
                             lower=_OKEY_LO, upper=_OKEY_HI)
    cust_plan = prune_stripes(path, "o_custkey", lower=_CUST_LO)

    zoned = spark.read.orc(path)
    matches = zoned.select(
        F.sum(((F.col("o_orderkey") >= _OKEY_LO)
               & (F.col("o_orderkey") <= _OKEY_HI)).cast("long"))
        .alias("key_matches"),
        F.sum((F.col("o_custkey") >= _CUST_LO).cast("long"))
        .alias("cust_matches"),
    ).collect()[0]  # bounded: one row of two counters

    rows = [
        ("key_range", key_plan["n_stripes"], key_plan["n_kept"],
         key_plan["kept_rows"], int(matches["key_matches"])),
        ("cust_floor", cust_plan["n_stripes"], cust_plan["n_kept"],
         cust_plan["kept_rows"], int(matches["cust_matches"])),
    ]
    return spark.createDataFrame(
        rows, "scenario string, n_stripes long, n_kept long, "
              "kept_rows long, n_matches long")


# --------------------------------------------------------------------------
# q458 — PARQUET DATA-PAGE DECODE (sources/parquetdata.py): with the
# footer decoded in-tree since q441, this closes the read path — no
# pyarrow on it at all. Three independent writers produce the same
# orders slice (pyarrow v1 dictionary+snappy, pyarrow
# data-page-v2/DELTA_BINARY_PACKED+zstd with dictionary off, DuckDB
# COPY TO), one EXECUTOR task decodes each variant with the pure-
# Python page walker (RLE/bit-packed hybrid levels, dictionary
# indices, PLAIN, DELTA runs, per-page codec), and all three decoded
# aggregates must equal one parquet-side oracle. An injected nullable
# column exercises definition levels under every writer.
# --------------------------------------------------------------------------
_PQ_VARIANTS = ("pyarrow_v1", "pyarrow_v2", "duckdb")


def _pq_variants_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os

        import duckdb as _duck
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(d, exist_ok=True)
        con = _duck.connect()
        tbl = con.sql(f"""
            SELECT o_orderkey, o_custkey, o_totalprice,
                   CASE WHEN o_orderkey % 9 = 0 THEN NULL
                        ELSE o_orderstatus END AS status
            FROM read_parquet('{sf_dir}/orders.parquet')
            ORDER BY o_orderkey
        """).arrow()
        pq.write_table(tbl, f"{d}/pyarrow_v1.parquet",
                       compression="snappy", row_group_size=50000)
        pq.write_table(tbl, f"{d}/pyarrow_v2.parquet",
                       compression="zstd", data_page_version="2.0",
                       version="2.6", use_dictionary=False)
        con.register("t", pa.Table.from_batches(tbl.to_batches()))
        con.sql(f"COPY t TO '{d}/duckdb.parquet' (FORMAT PARQUET)")

    return _derived_dir(sf_dir, "pqvariants", build)


@register(
    "q458_parquet_page_decode",
    oracle=f"""
    SELECT v.variant,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           CAST(SUM(CASE WHEN o_orderkey % 9 = 0 THEN 0 ELSE 1 END)
                AS BIGINT) AS n_status,
           MIN(o_totalprice) + 0 AS min_price,
           MAX(o_totalprice) + 0 AS max_price
    FROM orders
    CROSS JOIN (SELECT unnest(ARRAY[{", ".join(
        repr(v) for v in _PQ_VARIANTS)}]) AS variant) v
    GROUP BY v.variant
    """,
)
def q458(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _pq_variants_dir(spark, sf_dir)
    paths = spark.createDataFrame(
        [(v, f"{d}/{v}.parquet") for v in _PQ_VARIANTS],
        "variant string, path string").repartition(len(_PQ_VARIANTS))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..sources.parquetdata import read_parquet_rows

        for pdf in batches:
            for variant, path in zip(pdf["variant"], pdf["path"]):
                cols = read_parquet_rows(
                    path, columns=["o_orderkey", "o_totalprice", "status"])
                yield pd.DataFrame({
                    "variant": variant,
                    "o_orderkey": pd.Series(cols["o_orderkey"],
                                            dtype="int64"),
                    "o_totalprice": pd.Series(cols["o_totalprice"],
                                              dtype="float64"),
                    "status": cols["status"],
                })

    decoded = paths.mapInPandas(
        kernel, "variant string, o_orderkey long, o_totalprice double, "
                "status string")
    return decoded.groupBy("variant").agg(
        F.count("*").alias("n"),
        F.sum("o_orderkey").alias("sum_key"),
        F.count("status").alias("n_status"),
        (F.min("o_totalprice") + 0).alias("min_price"),
        (F.max("o_totalprice") + 0).alias("max_price"))


# --------------------------------------------------------------------------
# q459 — PARQUET WRITE-BACK: the in-tree writer (thrift-compact
# footer encoder, PLAIN v1 pages, RLE definition levels, per-column
# statistics under TypeDefinedOrder) emits shard-per-task files that
# SPARK'S OWN parquet-mr reader then consumes — the strongest interop
# statement available: a foreign production reader validates every
# byte of our footer and pages, and the aggregate must equal the
# parquet-side oracle. An injected nullable column exercises the
# level encoder under nulls; zstd pages exercise the in-tree
# compressor on the write side.
# --------------------------------------------------------------------------
def _pqw_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os
        import uuid as _uuid

        os.makedirs(d, exist_ok=True)
        df = (load(spark, sf_dir, "lineitem")
              .select("l_orderkey", "l_partkey", "l_quantity",
                      F.when(F.col("l_orderkey") % 8 != 0,
                             F.col("l_returnflag")).alias("rflag"))
              .repartition(6, "l_orderkey"))

        def write_shard(batches: Iterator[pd.DataFrame]
                        ) -> Iterator[pd.DataFrame]:
            from ..sources.parquetdata import PColumn, write_parquet

            parts = [b for b in batches if len(b)]
            if not parts:
                return
            pdf = pd.concat(parts, ignore_index=True)
            rows = list(zip(
                (int(v) for v in pdf["l_orderkey"]),
                (int(v) for v in pdf["l_partkey"]),
                (float(v) for v in pdf["l_quantity"]),
                (None if v is None else str(v) for v in pdf["rflag"]),
            ))
            cols = [PColumn("l_orderkey", "INT64"),
                    PColumn("l_partkey", "INT64"),
                    PColumn("l_quantity", "DOUBLE"),
                    PColumn("rflag", "BYTE_ARRAY", nullable=True)]
            path = os.path.join(d, f"part-{_uuid.uuid4().hex}.parquet")
            info = write_parquet(path, cols, rows, codec="ZSTD")
            yield pd.DataFrame({"path": [path], "n": [info["n_rows"]]})

        # bounded collect: one row per shard
        df.mapInPandas(write_shard, "path string, n long").collect()

    return _derived_dir(sf_dir, "pqwriter", build)


@register(
    "q459_parquet_write_back",
    oracle="""
    SELECT CASE WHEN l_orderkey % 8 = 0 THEN NULL ELSE l_returnflag END
             AS rflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(l_orderkey) AS BIGINT) AS sum_order,
           CAST(SUM(l_partkey) AS BIGINT) AS sum_part,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_qty
    FROM lineitem GROUP BY 1
    """,
)
def q459(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _pqw_dir(spark, sf_dir)
    # Spark's parquet-mr reader consumes the in-tree writer's bytes
    df = spark.read.parquet(d + "/*.parquet")
    return df.groupBy("rflag").agg(
        F.count("*").alias("n"),
        F.sum("l_orderkey").alias("sum_order"),
        F.sum("l_partkey").alias("sum_part"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
        .alias("sum_qty"))


# --------------------------------------------------------------------------
# q462 — ORC TEMPORAL + DECIMAL TYPES: events exported to ORC by our
# writer with a real TIMESTAMP column (seconds-from-2015 DATA +
# trailing-zero-packed nanos SECONDARY, the epoch-boundary ceiling
# convention of the Java writer) and the value as DECIMAL(18,2)
# (unbounded zigzag-varint mantissas + per-value scale SECONDARY),
# decoded back distributed and aggregated per event type. Exact
# decimal sums — no float discipline needed, the round trip IS the
# money-safe path. Oracle replays the 2-decimal quantization.
# --------------------------------------------------------------------------
@register(
    "q462_orc_temporal_decimal",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(ts) AS min_ts,
           MAX(ts) AS max_ts,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
    FROM events GROUP BY event_type
    """,
)
def q462(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob

    def build(d: str) -> None:
        import os
        import uuid as _uuid
        from decimal import Decimal

        os.makedirs(d, exist_ok=True)
        df = (load(spark, sf_dir, "events")
              .select(F.unix_micros("ts").alias("ts_us"), "event_type",
                      F.col("value").cast("decimal(18,2)").alias("val"))
              .repartition(4, "event_type"))

        def write_shard(batches: Iterator[pd.DataFrame]
                        ) -> Iterator[pd.DataFrame]:
            from ..sources import orc as o

            parts = [b for b in batches if len(b)]
            if not parts:
                return
            pdf = pd.concat(parts, ignore_index=True)
            rows = [(int(t), str(e), Decimal(str(v)))
                    for t, e, v in zip(pdf["ts_us"], pdf["event_type"],
                                       pdf["val"])]
            path = os.path.join(d, f"{_uuid.uuid4().hex}.orc")
            o.write_orc(path, [o.OrcColumn("ts_us", o.K_TIMESTAMP),
                               o.OrcColumn("etype", o.K_STRING),
                               o.OrcColumn("val", o.K_DECIMAL, 18, 2)],
                        rows, rle_version=2)
            yield pd.DataFrame({"path": [path]})

        # bounded collect: one row per shard
        df.mapInPandas(write_shard, "path string").collect()

    d = _derived_dir(sf_dir, "orctemporal", build)
    files = sorted(_glob.glob(d + "/*.orc"))
    paths = spark.createDataFrame([(p,) for p in files],
                                  "path string").repartition(len(files))

    def read_shard(batches: Iterator[pd.DataFrame]
                   ) -> Iterator[pd.DataFrame]:
        from ..sources import orc as o

        for pdf in batches:
            for path in pdf["path"]:
                cols = o.read_orc(path)
                yield pd.DataFrame({
                    "ts_us": pd.Series(cols["ts_us"], dtype="int64"),
                    "event_type": cols["etype"],
                    # exact: decimal(18,2) scaled to integer cents
                    "cents": pd.Series(
                        [int(v.scaleb(2)) for v in cols["val"]],
                        dtype="int64"),
                })

    decoded = paths.mapInPandas(
        read_shard, "ts_us long, event_type string, cents long")
    return (decoded
            .withColumn("ts", F.timestamp_micros("ts_us"))
            .groupBy("event_type").agg(
                F.count("*").alias("n"),
                F.min("ts").alias("min_ts"),
                F.max("ts").alias("max_ts"),
                (F.sum("cents") / 100.0).alias("sum_val")))
