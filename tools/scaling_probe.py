"""Empirical scaling probe: run representative corpus-bound queries at
sf0.001 / sf0.01 / sf0.1 (10x data steps) and report the time ratios.

A data-bound operator on this 32-thread box should scale sublinearly at
these sizes (fixed per-job overhead dominates small SFs and amortizes
at larger ones); a super-linear ratio (>> 10x per step) is the smell of
an accidental quadratic. Results land in stdout as one JSON line; the
SCALING.md table quotes a representative run.

Usage: python tools/scaling_probe.py [query ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path
from statistics import median

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gfw_pixetl_spark import harness
from gfw_pixetl_spark.session import get_spark

DEFAULT_QUERIES = [
    "q01_pricing_summary",   # full-scan aggregation
    "q26_dedup_exact",       # digest groupBy
    "q29_minhash_lsh_pairs", # signature + bucket self-join (output-bound)
    "q34_token_counts",      # explode-heavy text pass
    "q36_embed_topk",        # broadcast-scored ANN baseline
    "q83_zonal_stats",       # join + rollup
    "q136_prefix_ssjoin",    # PPJoin prefix filter (sub-quadratic claim)
    "q233_snapshot_delete",  # snapshot build + merge-on-read delete read
    "q240_snapshot_cdf",     # change-feed replay (O(delta) claim)
    "q242_k_anonymity",      # shrinking double aggregation
    "q362_bucketed_incremental_dedup",  # storage-partitioned probe
    "q371_warc_ingest",      # per-doc container kernel (linear claim)
    "q373_pdf_extract",      # per-doc parser kernel (linear claim)
    "q381_pdf_xref_stream",  # PDF 1.5 xref-stream/ObjStm kernel
    "q382_zstd_jsonl",       # zstd decode kernel (linear claim)
    "q383_unigram_train",    # EM on the word table (vocab-bound claim)
    "q385_ntv2_datum_shift", # broadcast-grid vectorized shift
    "q387_gif_frames",       # GIF LZW codec kernel (linear claim)
    "q388_unigram_apply",    # distinct-word Viterbi + broadcast join
    "q389_tfrecord_shards",  # TFRecord+protobuf kernel (linear claim)
    "q390_avro_roundtrip",   # Avro container export->ingest gate
    "q391_lz4_jsonl",        # LZ4 frame kernel (linear claim)
    "q392_kcore",            # fixpoint peel (rounds bounded claim)
    "q397_avi_mjpeg_frames",  # AVI index walk + JPEG decode kernel
    "q399_bz2_xz_jsonl",     # multi-stream decompressor walk
    "q403_webp_decode",      # VP8L decode kernel (linear claim)
    "q404_bleu",             # (doc, gram)-keyed clipped-count joins
    "q418_content_encoding_br",  # brotli decode kernel (linear claim)
    "q419_cdx_lookup",       # index-as-table join + ranged fetch
    "q421_delta_log",        # log replay planning (O(delta) claim)
    "q422_iceberg_interop",  # manifest planning (O(manifests) claim)
    "q425_dict_training",    # shingle top-k (map-side combine claim)
    "q429_wikipedia_dump",   # streaming XML + wikitext kernel
]

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    harness.QUERIES["q01_pricing_summary"](spark, SF_DIRS[0]).count()

    out: dict[str, dict] = {}
    for name in names:
        fn = harness.QUERIES[name]
        times = []
        for sf_dir in SF_DIRS:
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                samples.append(time.perf_counter() - t0)
            times.append(round(median(samples), 3))
        ratios = [
            round(times[i + 1] / times[i], 2) for i in range(len(times) - 1)
        ]
        out[name] = {"sec": times, "ratio_per_10x": ratios}
        print(f"{name}: {times} ratios {ratios}", file=sys.stderr)
    print(json.dumps({"sf": [0.001, 0.01, 0.1], "queries": out}))


if __name__ == "__main__":
    main()
