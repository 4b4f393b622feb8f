"""Trainer-export scale-stress golden run: the round-7 export formats
at size —

    documents -> tf.train.Example encode -> TFRecord shards (executor-
    side, one per range partition) -> damage injection -> lenient
    scan ingest (CRC-gated resync) -> protobuf decode -> accounting

plus a parallel `.jsonl.zst` leg through OUR zstd COMPRESSOR (LZ77 +
predefined-FSE sequences + Huffman literals) at tens of MB — the
compressed bytes are re-decoded by the in-tree decoder, closing the
loop write->read entirely within the engine.

Every fact is closed-form: doc texts are fixed-width token grids
(959 bytes each), ids are dense, the injected damage is exactly 4
junk bytes + one zero-id tail record per shard. ``verify_outputs``
checks byte volume, record accounting (main vs tail), exact id/byte
sums, strict-vs-lenient agreement (record_index on the clean blob),
the zstd compression ratio, and the producer-side Arrow batch bound.
``tests/test_scale_stress_export.py`` asserts these (marked slow);
``bench.py`` records wall time (``scale_stress_export`` entry,
golden flag).
"""

from __future__ import annotations

import os
import time

_SCALE = int(__import__("os").environ.get("SPARK_GRAFT_STRESS_SCALE", "1"))
N_DOCS = 120_000 * _SCALE
N_SHARDS = 32
TOKENS = 64
BODY_LEN = TOKENS * 14 + (TOKENS - 1)  # "w%08dx%04d" grid: 959 bytes
ZSTD_MOD = 3  # the .jsonl.zst leg takes docs with id % 3 == 0


def make_text(i: int) -> str:
    return " ".join(f"w{i:08d}x{t:04d}" for t in range(TOKENS))


def _generate_shards(spark, shard_dir: str):
    """TFRecord shards written executor-side; each shard is audited
    strict (record_index over the clean blob) BEFORE 4 junk bytes and
    a zero-id tail record are appended — the damage the lenient read
    leg must charge precisely."""
    import pandas as pd
    from pyspark.sql import functions as F

    os.makedirs(shard_dir, exist_ok=True)

    def kernel(batches):
        from ..sources.tfrecord import (
            encode_example, record_index, write_tfrecord,
        )

        for pdf in batches:
            ids = sorted(int(x) for x in pdf["id"])
            if not ids:
                continue
            recs = []
            for i in ids:
                body = make_text(i).encode()
                recs.append(encode_example(
                    {"ids": [i, len(body)], "text": [body]}))
            blob = write_tfrecord(recs)
            n_index = len(record_index(blob))  # strict walk, clean blob
            tail = write_tfrecord([encode_example({"ids": [0]})])
            damaged = blob + b"\xde\xad\xbe\xef" + tail
            path = os.path.join(shard_dir, f"shard-{ids[0]:06d}.tfrecord")
            with open(path, "w+b") as f:
                f.write(damaged)
            yield pd.DataFrame({
                "path": [path], "n_records": [len(recs)],
                "n_index": [n_index],
                "framed_bytes": [len(damaged)],
            })

    ids = spark.range(N_DOCS).select(F.col("id"))
    ids = ids.repartitionByRange(N_SHARDS, "id")
    return ids.mapInPandas(
        kernel, "path string, n_records long, n_index long, "
                "framed_bytes long")


def _ingest(spark, shard_dir: str):
    """binaryFile scan -> lenient scan_tfrecord -> protobuf decode."""

    def kernel(batches):
        import pandas as pd

        from ..sources.tfrecord import decode_example, scan_tfrecord

        for pdf in batches:
            out = {k: [] for k in ("n_main", "n_tail", "bad_records",
                                   "junk_bytes", "id_sum", "byte_sum")}
            for blob in pdf["content"]:
                records, c = scan_tfrecord(bytes(blob))
                n_main = n_tail = id_sum = byte_sum = 0
                for r in records:
                    d = decode_example(r)
                    ids = d.get("ids", [])
                    if len(ids) == 2:
                        n_main += 1
                        id_sum += ids[0]
                        byte_sum += len(d["text"][0])
                    else:
                        n_tail += 1
                        id_sum += ids[0]
                out["n_main"].append(n_main)
                out["n_tail"].append(n_tail)
                out["bad_records"].append(c["bad_records"])
                out["junk_bytes"].append(c["junk_bytes"])
                out["id_sum"].append(id_sum)
                out["byte_sum"].append(byte_sum)
            yield pd.DataFrame(out)

    return (spark.read.format("binaryFile")
            .load(os.path.join(shard_dir, "*.tfrecord"))
            .select("content")
            .mapInPandas(kernel,
                         "n_main long, n_tail long, bad_records long, "
                         "junk_bytes long, id_sum long, byte_sum long"))


def _zstd_leg(spark, zdir: str):
    """documents (id % 3 == 0) -> JSONL -> OUR zstd compressor, one
    .jsonl.zst per partition -> in-tree decoder read-back."""
    import pandas as pd
    from pyspark.sql import functions as F

    os.makedirs(zdir, exist_ok=True)

    def writer(batches):
        import json

        from ..sources.zstd import compress

        for pdf in batches:
            ids = sorted(int(x) for x in pdf["id"])
            if not ids:
                continue
            raw = "\n".join(
                json.dumps({"id": i, "text": make_text(i)})
                for i in ids).encode()
            blob = compress(raw, checksum=True)
            path = os.path.join(zdir, f"part-{ids[0]:06d}.jsonl.zst")
            with open(path, "w+b") as f:
                f.write(blob)
            yield pd.DataFrame({"raw_bytes": [len(raw)],
                                "comp_bytes": [len(blob)]})

    ids = (spark.range(N_DOCS)
           .filter(F.col("id") % ZSTD_MOD == 0)
           .repartitionByRange(N_SHARDS, "id"))
    gen = ids.mapInPandas(writer, "raw_bytes long, comp_bytes long")

    def reader(batches):
        import json

        from ..sources.zstd import decompress

        for pdf in batches:
            n = s = 0
            for blob in pdf["content"]:
                for line in decompress(bytes(blob)).splitlines():
                    rec = json.loads(line)
                    n += 1
                    s += rec["id"]
            yield __import__("pandas").DataFrame(
                {"n": [n], "id_sum": [s]})

    def read_back():
        return (spark.read.format("binaryFile")
                .load(os.path.join(zdir, "*.jsonl.zst"))
                .select("content")
                .mapInPandas(reader, "n long, id_sum long"))

    return gen, read_back


def run(spark, work_dir: str) -> dict:
    from pyspark.sql import functions as F

    shard_dir = os.path.join(work_dir, "tfshards")
    zdir = os.path.join(work_dir, "zshards")

    t0 = time.perf_counter()
    gen = _generate_shards(spark, shard_dir).collect()  # one row/shard
    t_gen = time.perf_counter() - t0

    t0 = time.perf_counter()
    ing = _ingest(spark, shard_dir).agg(
        F.sum("n_main").alias("n_main"),
        F.sum("n_tail").alias("n_tail"),
        F.sum("bad_records").alias("bad"),
        F.sum("junk_bytes").alias("junk"),
        F.sum("id_sum").alias("id_sum"),
        F.sum("byte_sum").alias("byte_sum"),
    ).collect()[0]
    t_ingest = time.perf_counter() - t0

    t0 = time.perf_counter()
    zgen_df, zread_back = _zstd_leg(spark, zdir)
    zgen = zgen_df.agg(F.sum("raw_bytes").alias("raw"),
                       F.sum("comp_bytes").alias("comp")).collect()[0]
    zread = zread_back().agg(
        F.sum("n").alias("n"),
        F.sum("id_sum").alias("id_sum")).collect()[0]
    t_zstd = time.perf_counter() - t0

    # producer-side Arrow batch bound at the widest stage (shard blobs
    # ride whole through binaryFile, so the bound is the shard size)
    max_shard = max(r.framed_bytes for r in gen)

    return {
        "n_shards": len(gen),
        "export_bytes": int(sum(r.framed_bytes for r in gen)),
        "gen_n_records": int(sum(r.n_records for r in gen)),
        "gen_n_index": int(sum(r.n_index for r in gen)),
        "n_main": int(ing.n_main), "n_tail": int(ing.n_tail),
        "bad_records": int(ing.bad), "junk_bytes": int(ing.junk),
        "id_sum": int(ing.id_sum), "byte_sum": int(ing.byte_sum),
        "zstd_raw_bytes": int(zgen.raw),
        "zstd_comp_bytes": int(zgen.comp),
        "zstd_n": int(zread.n), "zstd_id_sum": int(zread.id_sum),
        "max_shard_bytes": int(max_shard),
        "sec_generate": round(t_gen, 3),
        "sec_ingest": round(t_ingest, 3),
        "sec_zstd": round(t_zstd, 3),
        "sec_full_pipeline": round(t_gen + t_ingest + t_zstd, 3),
    }


def verify_outputs(facts: dict) -> list[str]:
    problems: list[str] = []

    def want(key, expected):
        if facts.get(key) != expected:
            problems.append(f"{key}: got {facts.get(key)!r}, "
                            f"want {expected!r}")

    want("n_shards", N_SHARDS)
    want("gen_n_records", N_DOCS)
    want("gen_n_index", N_DOCS)
    want("n_main", N_DOCS)
    want("n_tail", N_SHARDS)
    want("bad_records", N_SHARDS)       # one junk run per shard
    want("junk_bytes", 4 * N_SHARDS)
    want("id_sum", N_DOCS * (N_DOCS - 1) // 2)  # tails add zero
    want("byte_sum", N_DOCS * BODY_LEN)
    n_z = (N_DOCS + ZSTD_MOD - 1) // ZSTD_MOD
    want("zstd_n", n_z)
    want("zstd_id_sum", ZSTD_MOD * (n_z - 1) * n_z // 2)
    if facts["export_bytes"] < 100 << 20:
        problems.append(
            f"export under 100 MB: {facts['export_bytes']}")
    if facts["zstd_comp_bytes"] >= 0.6 * facts["zstd_raw_bytes"]:
        problems.append("zstd leg did not compress below 0.6x")
    if facts["max_shard_bytes"] > 8 << 20:
        problems.append(
            f"shard exceeds the 8 MB batch bound: "
            f"{facts['max_shard_bytes']}")
    return problems
