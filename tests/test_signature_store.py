"""Bucketed signature store (functions/signature_store.py): the
storage-partitioned incremental-dedup join must plan with NO Exchange
above either store scan, results must match a brute-force reference,
and insertInto appends must preserve the bucket spec."""

import pytest
from pyspark.sql import functions as F

from gfw_pixetl_spark.functions import dedup as D
from gfw_pixetl_spark.functions import signature_store as SS


def _docs(spark, n=120):
    # 5 duplicate families + unique tails so near-dups exist
    rows = [
        (i, f"alpha beta gamma delta epsilon family{i % 5} "
            + (f"unique{i} " * (1 if i % 7 == 0 else 0)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _plan_lines(df):
    return df._jdf.queryExecution().executedPlan().toString().splitlines()


def _node_text(line):
    """Strip tree glyphs (':- ', '+- ', ': ') and the WholeStageCodegen
    '*(n) ' prefix, leaving the bare operator name + args."""
    import re

    t = line.lstrip(" :+-")
    return re.sub(r"^\*\(\d+\)\s*", "", t)


def _ancestors_of(lines, needle):
    """Node names on the path from the root down to each line matching
    ``needle``, using the indentation of Spark's tree rendering."""
    def indent(line):
        return len(line) - len(line.lstrip(" :+-"))

    out = []
    stack = []  # (indent, text)
    for line in lines:
        d = indent(line)
        while stack and stack[-1][0] >= d:
            stack.pop()
        if needle in line:
            out.append([t for _, t in stack])
        stack.append((d, _node_text(line)))
    return out


@pytest.fixture(scope="module")
def store(spark):
    docs = _docs(spark)
    SS.store_signatures(spark, docs.filter("doc_id % 5 != 0"),
                        "t_sigstore", n_buckets=8)
    return docs


def test_store_tables_are_bucketed(spark, store):
    for table, cols in [("t_sigstore_bands", "band_id, key"),
                        ("t_sigstore_sigs", "doc_id")]:
        desc = spark.sql(f"DESCRIBE EXTENDED {table}").collect()
        info = {r.col_name: r.data_type for r in desc}
        assert info.get("Num Buckets") == "8", table
        assert info.get("Bucket Columns", "").replace("`", "") \
            == f"[{cols}]", table


def test_no_exchange_above_store_scans(spark, store):
    """The storage-partitioned contract: every FileScan of a store
    table is Bucketed: true and has NO Exchange ancestor — only the
    batch side shuffles."""
    batch = _docs(spark).filter("doc_id % 5 = 0")
    out = SS.incremental_dedup_against_store(spark, batch, "t_sigstore")
    lines = _plan_lines(out)
    scans = [ln for ln in lines if "FileScan" in ln
             and "t_sigstore" in ln]
    assert len(scans) == 2, "expected scans of both store tables"
    for ln in scans:
        assert "Bucketed: true" in ln, ln
    # no Exchange between each store scan and the join that consumes it
    # (Exchanges above the join move O(batch) candidate rows — allowed;
    # an Exchange below the join would mean the index got reshuffled)
    for anc in _ancestors_of(lines, "t_sigstore"):
        below_join = []
        for node in reversed(anc):  # walk upward from the scan
            if "Join" in node.split("[")[0]:
                break
            below_join.append(node)
        assert not any(a.startswith("Exchange") for a in below_join), \
            below_join
    # the batch side DOES shuffle (that's the one allowed Exchange set)
    assert any(_node_text(ln).startswith("Exchange") for ln in lines)


def test_results_match_brute_force(spark, store):
    docs = store
    batch = docs.filter("doc_id % 5 = 0")
    got = {r.batch_id: (r.match_id, r.n_match, r.is_dup)
           for r in SS.incremental_dedup_against_store(
               spark, batch, "t_sigstore").collect()}

    # brute force: every batch x index pair sharing a band key
    sigs = D.minhash_signatures(docs).collect()
    by_id = {r.doc_id: [r[f"mh{i}"] for i in range(D.N_MINHASH)]
             for r in sigs}
    bands = {r.doc_id: r for r in SS.band_key_cols(
        D.minhash_signatures(docs)).collect()}
    keys = SS.band_key_cols(D.minhash_signatures(docs)).collect()
    from collections import defaultdict
    buckets = defaultdict(set)
    for r in keys:
        buckets[(r.band_id, r.key)].add(r.doc_id)
    expected = {}
    for (b, k), ids in buckets.items():
        idx = [i for i in ids if i % 5 != 0]
        bat = [i for i in ids if i % 5 == 0]
        for bi in bat:
            for ii in idx:
                nm = sum(1 for a, c in zip(by_id[ii], by_id[bi])
                         if a == c)
                cur = expected.get(bi)
                if cur is None or (nm, -ii) > (cur[1], -cur[0]):
                    expected[bi] = (ii, nm)
    assert set(got) == set(expected)
    for bi, (ii, nm) in expected.items():
        assert got[bi] == (ii, nm, nm >= D.N_MINHASH // 2), bi


def test_streaming_dedup_against_store(spark, tmp_path):
    """The full production loop: micro-batches of new docs probe the
    PERSISTED index (no index-side Exchange), then their signatures are
    appended so the NEXT batch dedups against them too — stream ->
    probe -> index-maintain, exactly the nightly+realtime shape."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"{c}{i // 2}" for c in "abcdefgh"))
         for i in range(40)],
        "doc_id long, text string")
    # initial index: the first 10 odd docs
    SS.store_signatures(spark, docs.filter("doc_id < 20 and doc_id % 2 = 1"),
                        "t_sigstore_stream", n_buckets=4)

    src = str(tmp_path / "src")
    # stream carries the remaining docs: evens (dups of indexed or
    # future docs) and late odds
    docs.filter("doc_id % 2 = 0 or doc_id >= 20").write.parquet(src)
    schema = spark.read.parquet(src).schema
    matches = {}

    def process(batch_df, batch_id):
        found = SS.incremental_dedup_against_store(
            spark, batch_df, "t_sigstore_stream")
        for r in found.collect():
            matches[r.batch_id] = r.match_id
        SS.append_signatures(spark, batch_df, "t_sigstore_stream")

    (spark.readStream.schema(schema).parquet(src)
     .writeStream.foreachBatch(process)
     .option("checkpointLocation", str(tmp_path / "ckpt"))
     .trigger(availableNow=True).start().awaitTermination())

    # every even doc < 20 has its exact twin (2k+1 < 20) in the initial
    # index and must have matched with n_match = 16 (match_id = twin)
    for b in range(0, 20, 2):
        assert matches.get(b) == b + 1, (b, matches.get(b))
    # the index absorbed the streamed signatures: a fresh batch of
    # twins of STREAMED docs now matches them
    probe = spark.createDataFrame(
        [(100 + i, " ".join(f"{c}{(20 + i) // 2}" for c in "abcdefgh"))
         for i in range(4)],
        "doc_id long, text string")
    out = {r.batch_id: r.match_id for r in
           SS.incremental_dedup_against_store(
               spark, probe, "t_sigstore_stream").collect()}
    assert all(out[100 + i] in (20 + i - i % 2, 20 + i - i % 2 + 1)
               for i in range(4))


def test_append_preserves_bucketing_and_results(spark):
    # pairs (2k, 2k+1) are exact twins; evens probe, odds index
    docs = spark.createDataFrame(
        [(i, " ".join(f"{c}{i // 2}" for c in "abcdefgh"))
         for i in range(60)],
        "doc_id long, text string")
    SS.store_signatures(spark, docs.filter("doc_id < 30 and doc_id % 2 = 1"),
                        "t_sigstore_app", n_buckets=4)
    n = SS.append_signatures(
        spark, docs.filter("doc_id >= 30 and doc_id % 2 = 1"),
        "t_sigstore_app")
    assert n > 0
    desc = {r.col_name: r.data_type for r in
            spark.sql("DESCRIBE EXTENDED t_sigstore_app_bands").collect()}
    assert desc.get("Num Buckets") == "4"
    # a batch doc whose only near-dup arrived in the append is matched
    out = SS.incremental_dedup_against_store(
        spark, docs.filter("doc_id % 2 = 0"), "t_sigstore_app")
    lines = _plan_lines(out)
    for anc in _ancestors_of(lines, "t_sigstore_app"):
        below_join = []
        for node in reversed(anc):
            if "Join" in node.split("[")[0]:
                break
            below_join.append(node)
        assert not any(a.startswith("Exchange") for a in below_join)
    rows = {r.batch_id: r.match_id for r in out.collect()}
    late_matches = {b: m for b, m in rows.items() if m >= 30}
    assert late_matches, "appended index rows never matched"
