"""Ad-hoc SQL / registry-query front door.

The third CLI entry point (beside the layer runner ``cli.py`` and the
prep job ``prep_cli.py``): run any registered harness query, or
arbitrary Spark SQL with the testdata tables pre-registered as temp
views — the "just give me a SQL prompt over the warehouse" surface.

Usage:
    # run a registry query and print it
    python -m gfw_pixetl_spark.sql_cli --query q01_pricing_summary \
        [--sf-dir /root/testdata/sf0.01] [--format table|csv|json] [-n 50]

    # run arbitrary SQL over the registered tables
    python -m gfw_pixetl_spark.sql_cli --sql \
        "SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1"

    # list what's runnable
    python -m gfw_pixetl_spark.sql_cli --list
"""

from __future__ import annotations

import argparse
import sys

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="gfw_pixetl_spark.sql")
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--query", help="registry query name (see --list)")
    g.add_argument("--sql", help="Spark SQL over the registered tables")
    g.add_argument("--list", action="store_true",
                   help="list registry queries and exit")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--rasters", default=None,
                   help="comma-separated COG paths to register as the "
                        "'pixels' view (uri, band, row, col, x, y, value)")
    p.add_argument("--format", choices=("table", "csv", "json"),
                   default="table")
    p.add_argument("-n", "--limit", type=int, default=50,
                   help="max rows to print (table format only)")
    return p


def register_tables(spark, sf_dir: str) -> None:
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def emit(df, fmt: str, limit: int) -> None:
    if fmt == "table":
        df.show(limit, truncate=False)
        return
    rows = df.collect()
    cols = df.columns
    if fmt == "csv":
        print(",".join(cols))
        for r in rows:
            print(",".join("" if v is None else str(v) for v in r))
    else:
        import json

        for r in rows:
            print(json.dumps(dict(zip(cols, r)), default=str))


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from . import harness

    if args.list:
        for name in sorted(harness.QUERIES):
            print(name)
        return 0

    from .session import get_spark

    spark = get_spark("gfw_pixetl_spark-sql")
    spark.sparkContext.setLogLevel("ERROR")
    if args.query:
        if args.query not in harness.QUERIES:
            print(f"unknown query {args.query!r}; see --list",
                  file=sys.stderr)
            return 2
        df = harness.QUERIES[args.query](spark, args.sf_dir)
    else:
        register_tables(spark, args.sf_dir)
        if args.rasters:
            from .sources.raster_table import raster_catalog, read_pixels

            cat = raster_catalog(spark, args.rasters.split(","))
            read_pixels(cat).createOrReplaceTempView("pixels")
        df = spark.sql(args.sql)
    emit(df, args.format, args.limit)
    return 0


if __name__ == "__main__":
    sys.exit(main())
