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
