"""At-size stress for the dedup family (marked slow): a 200k-doc
synthetic corpus with PLANTED exact and near duplicates, generated
entirely with JVM-side expressions (no driver loop), pushed through the
production exact-dedup and MinHash+LSH pipelines. Asserts the
scale-shaped facts the tiny sf fixtures cannot: planted-dup recall,
candidate-set boundedness (sub-quadratic output), and exact distinct
accounting — the text-family twin of tests/test_scale_stress.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gfw_pixetl_spark.functions.dedup import (
    exact_dedup, lsh_candidate_pairs, minhash_signatures,
)

pytestmark = pytest.mark.slow

N_DOCS = 200_000  # 1/4 exact dups, 1/4 near dups, 1/2 unique


def _corpus(spark):
    """id % 4 == 1 -> exact copy of doc id-1; id % 4 == 3 -> near copy
    (first word replaced) of doc id-1; else unique 40-word text. All
    built from md5 expressions, fully distributed."""
    base_of = "id - CASE WHEN id % 2 = 1 THEN 1 ELSE 0 END"
    words = (f"transform(sequence(1, 40), j -> "
             f"substr(md5(concat(CAST(({base_of}) AS STRING), ':', "
             f"CAST(j AS STRING))), 1, 8))")
    return spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"CASE WHEN id % 4 = 3 THEN concat_ws(' ', concat('zz', "
            f"element_at({words}, 1)), slice({words}, 2, 39)) "
            f"ELSE concat_ws(' ', {words}) END"
        ).alias("text"),
    )


def test_dedup_stress_200k(spark):
    docs = _corpus(spark)

    # exact dedup: each (4k, 4k+1) pair shares text -> N - N/4 distinct
    n_distinct = exact_dedup(docs).count()
    assert n_distinct == N_DOCS - N_DOCS // 4

    sigs = minhash_signatures(docs)
    pairs = lsh_candidate_pairs(sigs).select("doc_id_a", "doc_id_b")
    pairs.localCheckpoint(eager=True)
    n_pairs = pairs.count()

    # planted pairs: (4k, 4k+1) identical and (4k+2, 4k+3) near-identical
    planted = spark.range(N_DOCS // 2).select(
        (F.col("id") * 2).alias("doc_id_a"),
        (F.col("id") * 2 + 1).alias("doc_id_b"),
    )
    hit = pairs.join(planted, ["doc_id_a", "doc_id_b"], "left_semi").count()
    exact_hit = (
        pairs.join(planted.filter(F.col("doc_id_a") % 4 == 0),
                   ["doc_id_a", "doc_id_b"], "left_semi").count()
    )

    # every exact-dup pair collides in all bands; near-dup pairs
    # (39/41 Jaccard) must clear 95% recall with 4 bands x 4 rows
    assert exact_hit == N_DOCS // 4
    assert hit >= int(0.95 * (N_DOCS // 2))

    # sub-quadratic candidate bound: LSH output stays within a small
    # multiple of the planted-pair count (no bucket degenerated into an
    # all-pairs blowup)
    assert n_pairs < 4 * (N_DOCS // 2)
