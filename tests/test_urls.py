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
