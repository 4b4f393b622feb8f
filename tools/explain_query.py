"""Explain a harness query: formatted physical plan + scale heuristics.

Usage:
    python tools/explain_query.py q01_pricing_summary [sf_dir]

Prints the Catalyst formatted plan, then a summary of what matters at
scale: exchange (shuffle) count, broadcast joins, whole-stage-codegen
spans, Python/Arrow kernel stages, and pushed filters / read schemas of
every parquet scan — the checklist `.explain` reviews walk by hand.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    if len(sys.argv) < 2:
        from gfw_pixetl_spark import harness

        print(__doc__)
        print("available queries:")
        for name in sorted(harness.QUERIES):
            print(" ", name)
        return
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

    from gfw_pixetl_spark import harness
    from gfw_pixetl_spark.session import get_spark

    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    df = harness.QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    print(plan)

    print("=" * 64)
    print(f"scale summary for {name}:")
    n_exchange = len(re.findall(r"\bExchange\b", plan))
    n_single = len(re.findall(r"Exchange SinglePartition", plan))
    n_bcast = len(re.findall(r"BroadcastExchange|BroadcastHashJoin"
                             r"|BroadcastNestedLoopJoin", plan))
    n_codegen = len(re.findall(r"WholeStageCodegen", plan))
    n_arrow = len(re.findall(r"MapInPandas|FlatMapGroupsInPandas"
                             r"|ArrowEvalPython", plan))
    n_pyudf = len(re.findall(r"BatchEvalPython", plan))
    n_cart = len(re.findall(r"CartesianProduct", plan))
    print(f"  shuffles (Exchange):        {n_exchange}"
          f"  (single-partition: {n_single})")
    print(f"  broadcast joins/exchanges:  {n_bcast}")
    print(f"  whole-stage-codegen spans:  {n_codegen}")
    print(f"  Arrow (pandas) kernels:     {n_arrow}")
    print(f"  row-at-a-time Python UDFs:  {n_pyudf}"
          + ("  <-- BANNED" if n_pyudf else ""))
    print(f"  cartesian products:         {n_cart}"
          + ("  <-- check join keys" if n_cart else ""))
    for m in re.finditer(
        r"PushedFilters: (\[[^\]]*\])|ReadSchema: (\S+)", plan
    ):
        label = "pushed" if m.group(1) else "schema"
        print(f"  scan {label}: {(m.group(1) or m.group(2))[:100]}")
    spark.stop()


if __name__ == "__main__":
    main()
