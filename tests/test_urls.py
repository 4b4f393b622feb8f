"""canonical_url edge cases: the ladder every crawl-dedup pipeline needs
(case, default ports, fragments, tracking params, slash collapse)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gfw_pixetl_spark.functions.text import canonical_url

CASES = [
    # (input, canonical)
    ("https://www.Example.COM/a/b?b=2&a=1",
     "https://example.com/a/b?a=1&b=2"),
    ("HTTPS://EXAMPLE.com:443/a/?utm_source=x&a=1#frag",
     "https://example.com/a?a=1"),
    ("http://example.com:80/", "http://example.com/"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("https://example.com", "https://example.com/"),
    ("https://example.com/x///", "https://example.com/x"),
    ("https://example.com/?gclid=1&fbclid=2&msclkid=3&utm_campaign=c",
     "https://example.com/"),
    ("https://example.com/?keep=1&utm_x=2", "https://example.com/?keep=1"),
    # https on port 80 is NOT default — must survive
    ("https://example.com:80/x", "https://example.com:80/x"),
    # empty param segments from '&&' are dropped
    ("https://example.com/?a=1&&b=2", "https://example.com/?a=1&b=2"),
    # sort is bytewise on the whole 'k=v' pair
    ("https://example.com/?b=1&a=2&a=1",
     "https://example.com/?a=1&a=2&b=1"),
]


@pytest.mark.parametrize("raw,expect", CASES)
def test_canonical_url(spark, raw, expect):
    df = spark.createDataFrame([(raw,)], "url string").coalesce(1)
    got = df.select(canonical_url("url").alias("c")).collect()[0].c
    assert got == expect, f"{raw!r} -> {got!r}, want {expect!r}"


def test_canonical_url_is_idempotent(spark):
    raws = [r for r, _ in CASES]
    df = spark.createDataFrame([(r,) for r in raws], "url string").coalesce(1)
    once = [r.c for r in df.select(canonical_url("url").alias("c")).collect()]
    df2 = spark.createDataFrame([(c,) for c in once], "url string").coalesce(1)
    twice = [r.c for r in df2.select(canonical_url("url").alias("c")).collect()]
    assert once == twice


# ---- fold_text properties (same file: the string-cleaning pair) ----

FOLD_CASES = [
    ("ＨＥＬＬＯ　Ｗｏｒｌｄ！", "HELLO World!"),
    ("a b c d", "a b c d"),
    ("“quoted” – dash — em − minus", '"quoted" - dash - em - minus'),
    ("dots…and «guillemets»", 'dots...and "guillemets"'),
    ("  spaced\t\tout\n\n", "spaced out"),
    ("plain ascii stays", "plain ascii stays"),
]


@pytest.mark.parametrize("raw,expect", FOLD_CASES)
def test_fold_text(spark, raw, expect):
    from gfw_pixetl_spark.functions.text import fold_text

    df = spark.createDataFrame([(raw,)], "t string").coalesce(1)
    got = df.select(fold_text("t").alias("f")).collect()[0].f
    assert got == expect, f"{raw!r} -> {got!r}, want {expect!r}"


def test_fold_text_is_idempotent(spark):
    from gfw_pixetl_spark.functions.text import fold_text

    raws = [r for r, _ in FOLD_CASES]
    df = spark.createDataFrame([(r,) for r in raws], "t string").coalesce(1)
    once = [r.f for r in df.select(fold_text("t").alias("f")).collect()]
    df2 = spark.createDataFrame([(o,) for o in once], "t string").coalesce(1)
    twice = [r.f for r in df2.select(fold_text("t").alias("f")).collect()]
    assert once == twice


# ---- registrable_domain (eTLD+1, PSL-subset longest-suffix-wins) ----

DOMAIN_CASES = [
    ("www.example.com", "example.com"),
    ("a.b.example.co.uk", "example.co.uk"),        # multi-label suffix wins
    ("user.github.io", "user.github.io"),          # private suffix
    ("deep.sub.user.github.io", "user.github.io"),
    ("EXAMPLE.ORG", "example.org"),                # case-folded
    ("example.com", "example.com"),                # already registrable
    ("com", None),                                 # bare public suffix
    ("co.uk", None),                               # bare multi-label suffix
    ("localhost", None),                           # no matching suffix
    ("bucket.s3.amazonaws.com", "bucket.s3.amazonaws.com"),
]


@pytest.mark.parametrize("host,expect", DOMAIN_CASES)
def test_registrable_domain(spark, host, expect):
    from gfw_pixetl_spark.functions.text import registrable_domain

    df = spark.createDataFrame([(host,)], "h string").coalesce(1)
    got = df.select(registrable_domain("h").alias("d")).collect()[0].d
    assert got == expect, f"{host!r} -> {got!r}, want {expect!r}"


def test_bpe_train_classic(spark):
    """The textbook BPE example: corpus where 'lo' then 'low' emerge."""
    from gfw_pixetl_spark.functions.text import bpe_train

    rows = [("low low low lower lower newest newest newest widest",)]
    df = spark.createDataFrame(rows, "text string")
    out = bpe_train(df, n_merges=3).collect()
    merges = [(r.p1, r.p2) for r in out]
    # word-frequency table: low:3 lower:2 newest:3 widest:1
    # it1 pairs: (l,o)=5 (o,w)=5 (w,e)=5 (e,s)=4 (s,t)=4 (n,e)=3 (e,w)=3
    # (e,r)=2 ... -> three-way tie at 5, pair-ASC tie-break picks (l,o)
    assert merges[0] == ("l", "o")
    assert out[0].n == 5
    # it2: (lo,w)=5 now beats everything else -> 'low' emerges
    assert merges[1] == ("lo", "w")
    assert out[1].n == 5
    assert len(merges) == 3
    assert all(out[i].total_tokens > out[i + 1].total_tokens
               for i in range(len(out) - 1))


def test_readability_known_value(spark):
    from gfw_pixetl_spark.functions.text import readability_features

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran fast!")], "doc_id long, text string")
    r = readability_features(df).collect()[0]
    assert (r.n_words, r.n_sentences, r.n_syllables) == (7, 2, 7)
    # grade = 0.39*(7/2) + 11.8*(7/7) - 15.59
    expect = round(0.39 * 3.5 + 11.8 - 15.59, 6)
    assert r.fk_grade == expect
