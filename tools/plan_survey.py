"""Plan-shape survey: detect duplicated expensive subtrees across queries.

For each registry query (or the names given on argv), builds the DataFrame
and walks the ANALYZED logical plan (`df._jdf.queryExecution().analyzed()`),
hashing every subtree by its string rendering. A subtree that appears more
than once inside one query AND contains an expensive operator (Aggregate,
Join, Window, Sort, Generate/explode, FlatMapsInPandas) is reported —
Catalyst does no cross-subtree CSE, so each occurrence is planned and
EXECUTED independently unless the builder checkpoints it.

Usage: python tools/plan_survey.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import re

_ID_RE = re.compile(r"#\d+")

EXPENSIVE = (
    "Aggregate",
    "Join",
    "Window",
    "Sort",
    "Generate",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "Deduplicate",
)


def survey_plan(plan) -> list[tuple[int, int, str]]:
    """Return [(n_occurrences, n_expensive_ops, head_line)] for duplicated
    expensive subtrees, largest first, nested duplicates suppressed."""
    seen: dict[str, list] = {}

    def walk(node):
        # LogicalRDD = an already-materialized / checkpointed RDD: multiple
        # references share stages, so duplication is free — skip the node
        # itself (parents above it still participate).
        if node.nodeName() != "LogicalRDD":
            # normalize exprIds: DeduplicateRelations re-numbers attributes
            # per reference, so identical subtrees differ only in #NNN ids
            s = _ID_RE.sub("#", node.toString())
            seen.setdefault(s, []).append(node)
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next())
        # subquery expressions hide plans inside expressions; skip (rare)

    walk(plan)
    dups = {
        s: nodes for s, nodes in seen.items() if len(nodes) > 1
    }
    # suppress subtrees wholly contained in a larger duplicated subtree
    strs = sorted(dups, key=len, reverse=True)
    out = []
    covered: list[str] = []
    for s in strs:
        if any(s in big and s != big for big in covered):
            continue
        n_exp = sum(s.count(op) for op in EXPENSIVE)
        if n_exp == 0:
            continue
        covered.append(s)
        head = s.splitlines()[0][:110]
        out.append((len(dups[s]), n_exp, head))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)

    import __spark_entry__ as entry_mod
    from gfw_pixetl_spark.session import get_spark

    spark = get_spark("plan-survey")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    flagged = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().analyzed()
            dups = survey_plan(plan)
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {name}: {type(exc).__name__}: {exc}")
            continue
        if dups:
            flagged += 1
            print(f"DUP  {name}:")
            for n_occ, n_exp, head in dups:
                print(f"     x{n_occ} expensive_ops={n_exp}  {head}")
        else:
            print(f"ok   {name}")
    print(f"\nflagged: {flagged}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
