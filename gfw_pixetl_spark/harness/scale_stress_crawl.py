"""Crawl-curation scale-stress golden run: the round-5 crawl family
COMPOSED as one pipeline over a >=100 MB WARC fixture —

    WARC shards -> member index -> HTTP split -> HTML text extract
    -> language ID -> quality filter -> domain-blocklist gate
    -> MinHash dedup (in-batch band self-join)
    -> bucketed signature-store probe (wave B vs wave A's index)
    -> snapshot append

Each stage exists as its own oracle-checked query (q371/q372/q32/q33/
q368/q29/q362/q239); this module proves they compose at size with a
CLOSED-FORM golden, the raster/vector ``scale_stress`` pattern.

Fixture: ``N_DOCS`` synthetic pages written distributedly as
per-record-gzip WARC shards (never materialized on the driver). Every
curation decision is a modular-arithmetic class of the doc id, so the
surviving set is computable in closed form:

* text source j(i): doc ``i`` with ``i % 4 == 1`` duplicates doc
  ``i-1`` (in-wave near-dup pair); wave-B doc ``i`` with ``i % 8 == 2``
  duplicates wave-A doc ``i - WAVE`` (store-probe hit); else ``j = i``,
* language: ``j % 3 == 0`` -> French stopwords (language gate drops),
* quality: ``j % 5 == 4`` -> punctuation junk that still votes 'en'
  (quality gate drops; margins engineered ~0.3 vs ~0.6 around the 0.5
  threshold so the class decision is never borderline),
* blocklist: hosts ``site{h}`` with ``h % 10 == 7`` (suffix-join gate
  drops — the host is the DOC's own, independent of the text source),
* dedup: identical texts have identical minhash signatures, distinct
  docs share only stopwords (verify step ``n_match >= k//2`` cannot
  fire across distinct fillers), so a dup survives exactly when its
  source was itself dropped upstream.

``verify_outputs`` checks byte volume, record accounting, the exact
survivor COUNT and doc-id SUM against the closed form, the store size,
and the snapshot-table read-back. ``tests/test_scale_stress_crawl.py``
asserts these (marked slow); ``bench.py`` records wall time
(``scale_stress_crawl`` entry, golden flag).
"""

from __future__ import annotations

import os
import time

import numpy as np

_SCALE = int(__import__("os").environ.get("SPARK_GRAFT_STRESS_SCALE", "1"))
N_DOCS = 24_000 * _SCALE
WAVE = N_DOCS // 2
N_SHARDS = 32
N_HOSTS = 100
BODY_WORDS = 700
QUALITY_MIN = 0.5
STORE = "crawl_stress_store"

EN_STOPS = ("the", "a", "of", "and", "to")
FR_STOPS = ("le", "la", "et", "les", "des")


def _letters(n: int) -> str:
    """Base-26 letter encoding — fillers must be ALPHABETIC so good
    pages clear the quality gate's alpha_ratio term (~0.60 vs junk's
    ~0.32 around the 0.5 threshold)."""
    s = ""
    while True:
        s += chr(97 + n % 26)
        n //= 26
        if not n:
            return s


def text_source(i: int) -> int:
    if i % 4 == 1:
        return i - 1
    if i >= WAVE and i % 8 == 2:
        return i - WAVE
    return i


def make_text(j: int) -> str:
    """Deterministic page body for source id ``j`` (class by modular
    arithmetic; fillers are j-specific so distinct docs share almost no
    vocabulary)."""
    if j % 5 == 4:  # junk: 'en' stopwords keep langid happy, the
        # punctuation soup sinks alpha_ratio -> quality ~0.3
        toks = []
        for t in range(BODY_WORDS):
            if t % 5 == 0:
                toks.append(EN_STOPS[(t // 5) % 5])
            else:
                toks.append(f"!!%%$$##@@{(j * 13 + t) % 97:02d}")
        return " ".join(toks)
    stops = FR_STOPS if j % 3 == 0 else EN_STOPS
    mark = "f" if j % 3 == 0 else "w"
    toks = []
    jl = _letters(j)
    for t in range(BODY_WORDS):
        if t % 6 == 0:
            toks.append(stops[(t // 6) % 5])
        else:
            # the doc id rides in EVERY filler token: distinct docs
            # share only stopwords (word-set jaccard ~0.004), so the
            # minhash verify step can never group non-copies
            toks.append(f"{mark}{jl}q{_letters(t)}")
    return " ".join(toks)


def expected_survivors() -> np.ndarray:
    """Boolean mask over doc ids: the closed-form output of the whole
    pipeline."""
    i = np.arange(N_DOCS)
    j = np.where(i % 4 == 1, i - 1,
                 np.where((i >= WAVE) & (i % 8 == 2), i - WAVE, i))
    junk = (j % 5) == 4
    french = ~junk & ((j % 3) == 0)
    host_ok = (i % N_HOSTS) % 10 != 7
    pool = ~french & ~junk & host_ok
    # in-wave adjacent dedup: dup i dropped iff its source is in pool
    adj_dup = (i % 4 == 1) & pool
    adj_dup &= np.concatenate([[False], pool[:-1]])
    in_store = pool & ~adj_dup & (i < WAVE)
    cross_dup = (i >= WAVE) & (i % 8 == 2) & pool
    cross_dup &= np.concatenate([in_store[:WAVE], in_store[:WAVE]])
    return pool & ~adj_dup & ~cross_dup


def _generate_shards(spark, shard_dir: str):
    """Write the WARC shards distributedly; returns (paths DF facts)."""
    import pandas as pd
    from pyspark.sql import functions as F

    os.makedirs(shard_dir, exist_ok=True)

    def kernel(batches):
        from ..sources.warc import http_response_bytes, write_warc

        for pdf in batches:
            ids = sorted(int(x) for x in pdf["id"])
            if not ids:
                continue
            recs = []
            raw_bytes = 0
            for i in ids:
                body = (f"<html><head><title>Page {i}</title></head>"
                        f"<body><p>{make_text(text_source(i))}</p>"
                        f"</body></html>").encode()
                raw_bytes += len(body)
                recs.append({
                    "uri": f"http://site{i % N_HOSTS}.example.com"
                           f"/page/{i}",
                    "payload": http_response_bytes(body),
                })
            blob = write_warc(recs, gzip_members=True)
            path = os.path.join(shard_dir,
                                f"shard-{ids[0]:06d}.warc.gz")
            with open(path, "w+b") as f:
                f.write(blob)
            yield pd.DataFrame({
                "path": [path], "n_records": [len(recs)],
                "uncompressed_bytes": [raw_bytes],
                "compressed_bytes": [len(blob)],
            })

    ids = spark.range(N_DOCS).select(F.col("id"))
    # contiguous ranges per shard keep shard contents deterministic
    ids = ids.repartitionByRange(N_SHARDS, "id")
    return ids.mapInPandas(
        kernel,
        "path string, n_records long, uncompressed_bytes long, "
        "compressed_bytes long",
    )


def _ingest(spark, shard_dir: str):
    """binaryFile scan -> member index -> WARC/HTTP parse -> visible
    text; one Arrow kernel per shard, record work stays executor-side."""

    def kernel(batches):
        import pandas as pd

        from ..functions.html import extract_text
        from ..sources.warc import (
            iter_warc, member_index, parse_http_response,
        )

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "host", "text",
                                   "n_members", "html_bytes")}
            for blob in pdf["content"]:
                data = bytes(blob)
                n_members = len(member_index(data))
                for headers, payload in iter_warc(data):
                    if headers.get("WARC-Type") != "response":
                        continue
                    uri = headers.get("WARC-Target-URI", "")
                    status, _h, body = parse_http_response(payload)
                    host = uri.split("//", 1)[1].split("/", 1)[0]
                    doc_id = int(uri.rsplit("/", 1)[1])
                    text, _nv, _nl = extract_text(
                        body.decode("utf-8", "replace"))
                    out["doc_id"].append(doc_id)
                    out["host"].append(host)
                    out["text"].append(text)
                    out["n_members"].append(n_members)
                    out["html_bytes"].append(len(body))
            yield pd.DataFrame(out)

    return (
        spark.read.format("binaryFile")
        .load(os.path.join(shard_dir, "*.warc.gz"))
        .select("content")
        .mapInPandas(kernel, "doc_id long, host string, text string, "
                             "n_members long, html_bytes long")
    )


def _dedup_in_batch(df, spark):
    """In-batch near-dup removal: band self-join candidates, signature
    verify (n_match >= k//2), keep the smallest doc_id of each match."""
    from pyspark.sql import functions as F

    from ..functions import dedup as D
    from ..functions.signature_store import band_key_cols

    k = D.N_MINHASH
    sigs = D.minhash_signatures(df).localCheckpoint(eager=False)
    bands = band_key_cols(sigs)
    cand = (
        bands.select(F.col("doc_id").alias("a"), "band_id", "key")
        .join(bands.select(F.col("doc_id").alias("b"), "band_id", "key"),
              ["band_id", "key"])
        .filter("a < b").select("a", "b").distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("a"),
                     *[F.col(f"mh{i}").alias(f"xa{i}") for i in range(k)])
    sb = sigs.select(F.col("doc_id").alias("b"),
                     *[F.col(f"mh{i}").alias(f"xb{i}") for i in range(k)])
    n_match = sum(
        F.when(F.col(f"xa{i}") == F.col(f"xb{i}"), 1).otherwise(0)
        for i in range(k))
    dups = (cand.join(sa, "a").join(sb, "b")
            .select("b", n_match.alias("n_match"))
            .filter(F.col("n_match") >= k // 2)
            .select(F.col("b").alias("doc_id")).distinct())
    return df.join(dups, "doc_id", "left_anti")


def run(spark, work_dir: str) -> dict:
    """Execute the composed crawl-curation pipeline; returns facts."""
    from pyspark.sql import functions as F

    from ..functions import dedup as D
    from ..functions.signature_store import (
        append_signatures, incremental_dedup_against_store,
        store_signatures,
    )
    from ..functions.text import language_id, quality_features
    from ..sources.snapshots import read_snapshot, snapshot_append

    shard_dir = os.path.join(work_dir, "shards")

    t0 = time.perf_counter()
    shards = _generate_shards(spark, shard_dir).collect()  # one/shard
    warc_bytes = sum(r.uncompressed_bytes for r in shards)
    t_gen = time.perf_counter() - t0

    t0 = time.perf_counter()
    docs = _ingest(spark, shard_dir).localCheckpoint()
    ing = docs.agg(
        F.count("*").alias("n"),
        F.sum("html_bytes").alias("html_bytes"),
        F.max("n_members").alias("max_members_per_shard"),
    ).collect()[0]
    t_ingest = time.perf_counter() - t0

    t0 = time.perf_counter()
    lang = language_id(docs).filter(F.col("pred_lang") == "en") \
        .select("doc_id")
    qual = (quality_features(docs, keep_cols=("host", "text"))
            .filter(F.col("quality_score") >= QUALITY_MIN)
            .select("doc_id", "host", "text"))
    kept = qual.join(lang, "doc_id")
    # blocklist gate: dot-suffix explode + broadcast equi-join (the
    # q368 shape — survives a 100M-rule list, unlike a LIKE join)
    blocked = spark.createDataFrame(
        [(f"site{h}.example.com",) for h in range(N_HOSTS)
         if h % 10 == 7], "rule string")
    suffixes = F.expr(
        "transform(sequence(1, size(split(host, '[.]'))), "
        "i -> array_join(slice(split(host, '[.]'), i, 99), '.'))")
    hits = (kept.select("doc_id", F.explode(suffixes).alias("rule"))
            .join(F.broadcast(blocked), "rule")
            .select("doc_id").distinct())
    pool = kept.join(hits, "doc_id", "left_anti").localCheckpoint()
    t_filter = time.perf_counter() - t0

    t0 = time.perf_counter()
    wave_a = _dedup_in_batch(pool.filter(F.col("doc_id") < WAVE), spark) \
        .localCheckpoint()
    store_facts = store_signatures(spark, wave_a, STORE)
    wave_b = _dedup_in_batch(pool.filter(F.col("doc_id") >= WAVE), spark)
    probe = incremental_dedup_against_store(spark, wave_b, STORE)
    b_dups = probe.filter("is_dup").select(
        F.col("batch_id").alias("doc_id")).distinct()
    wave_b = wave_b.join(b_dups, "doc_id", "left_anti").localCheckpoint()
    n_appended = append_signatures(spark, wave_b, STORE)
    t_dedup = time.perf_counter() - t0

    t0 = time.perf_counter()
    survivors = wave_a.unionByName(wave_b).select(
        "doc_id", "host", F.length("text").alias("n_chars"))
    table_dir = os.path.join(work_dir, "curated")
    snapshot_append(survivors, table_dir, stats_cols=["doc_id"])
    back = read_snapshot(spark, table_dir).agg(
        F.count("*").alias("n"), F.sum("doc_id").alias("id_sum")
    ).collect()[0]
    t_sink = time.perf_counter() - t0

    # producer-side Arrow batch bound at the widest row (html text)
    import pandas as pd

    def measure(batches):
        for pdf in batches:
            yield pd.DataFrame({"batch_bytes": [
                int(sum(len(t) for t in pdf["text"]))]})

    max_batch = docs.mapInPandas(measure, "batch_bytes long").agg(
        F.max("batch_bytes")).collect()[0][0]

    return {
        "n_docs": N_DOCS,
        "warc_bytes_uncompressed": int(warc_bytes),
        "n_shards": len(shards),
        "n_ingested": int(ing.n),
        "html_bytes": int(ing.html_bytes),
        "store_docs_wave_a": int(store_facts["n_docs"]),
        "store_appended_wave_b": int(n_appended),
        "snapshot_rows": int(back.n),
        "snapshot_id_sum": int(back.id_sum),
        "max_batch_bytes": int(max_batch),
        "sec_generate": round(t_gen, 3),
        "sec_ingest": round(t_ingest, 3),
        "sec_filters": round(t_filter, 3),
        "sec_dedup_store": round(t_dedup, 3),
        "sec_sink": round(t_sink, 3),
        "sec_full_pipeline": round(t_ingest + t_filter + t_dedup
                                   + t_sink, 3),
    }


def verify_outputs(facts: dict) -> list[str]:
    """Compare every accounting fact against the closed form; empty
    list = golden."""
    problems = []
    if facts["warc_bytes_uncompressed"] < 100 * 2**20:
        problems.append(
            f"fixture only {facts['warc_bytes_uncompressed']} bytes")
    if facts["n_ingested"] != N_DOCS:
        problems.append(f"ingested {facts['n_ingested']} != {N_DOCS}")
    mask = expected_survivors()
    ids = np.arange(N_DOCS)
    want_n = int(mask.sum())
    want_sum = int(ids[mask].sum())
    if facts["snapshot_rows"] != want_n:
        problems.append(
            f"survivors {facts['snapshot_rows']} != closed form {want_n}")
    if facts["snapshot_id_sum"] != want_sum:
        problems.append(
            f"survivor id sum {facts['snapshot_id_sum']} != {want_sum}")
    want_a = int((mask & (ids < WAVE)).sum())
    want_b = int((mask & (ids >= WAVE)).sum())
    if facts["store_docs_wave_a"] != want_a:
        problems.append(
            f"store wave A {facts['store_docs_wave_a']} != {want_a}")
    if facts["store_appended_wave_b"] != want_b:
        problems.append(
            f"store appended {facts['store_appended_wave_b']} != {want_b}")
    return problems
