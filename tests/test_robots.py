"""robots.txt evaluation (functions/robots.py) against RFC 9309
semantics: group selection, wildcard/anchor matching, longest-match
with Allow tie-break, and the Spark kernel."""

from gfw_pixetl_spark.functions.robots import (
    _pattern_matches, parse_robots, robots_allowed,
)

BASIC = """
User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /*.tmp$
"""


def test_longest_match_allow_beats_shorter_disallow():
    assert robots_allowed(BASIC, "/data/x")
    assert not robots_allowed(BASIC, "/private/a")
    assert robots_allowed(BASIC, "/private/ok/b")  # 12 > 9


def test_wildcard_and_anchor():
    assert not robots_allowed(BASIC, "/files/c.tmp")
    assert robots_allowed(BASIC, "/files/c.tmpx")  # $ anchors the match
    assert _pattern_matches("/*.tmp$", "/a/b/c.tmp")
    assert not _pattern_matches("/*.tmp$", "/a/b/c.tmp.bak")
    assert _pattern_matches("/a*b", "/aXXXb-and-more")  # prefix, no $


def test_allow_wins_exact_length_tie():
    txt = "User-agent: *\nDisallow: /page\nAllow: /page"
    assert robots_allowed(txt, "/page")


def test_empty_disallow_allows_everything():
    txt = "User-agent: *\nDisallow:"
    assert robots_allowed(txt, "/anything")


def test_group_selection_most_specific_agent():
    txt = ("User-agent: gfwbot-fast\nDisallow: /fastonly/\n\n"
           "User-agent: gfwbot\nDisallow: /botonly/\n\n"
           "User-agent: *\nDisallow: /all/\n")
    # token 'gfwbot' matches the 'gfwbot' group only
    assert not robots_allowed(txt, "/botonly/x", agent="gfwbot")
    assert robots_allowed(txt, "/all/x", agent="gfwbot")
    assert robots_allowed(txt, "/fastonly/x", agent="gfwbot")
    # token 'gfwbot-fast-2' matches the most specific prefix
    assert not robots_allowed(txt, "/fastonly/x", agent="gfwbot-fast-2")
    # unknown crawler falls back to *
    assert not robots_allowed(txt, "/all/x", agent="otherbot")
    assert robots_allowed(txt, "/botonly/x", agent="otherbot")


def test_stacked_user_agents_share_one_group():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x/\n"
    assert not robots_allowed(txt, "/x/1", agent="a")
    assert not robots_allowed(txt, "/x/1", agent="b")


def test_comments_unknown_directives_and_rules_before_group():
    txt = ("Disallow: /ignored-no-group/\n"
           "User-agent: *  # trailing comment\n"
           "Crawl-delay: 10\nSitemap: https://x/s.xml\n"
           "Disallow: /real/\n")
    rules = parse_robots(txt)
    assert rules == [(False, "/real/")]
    assert robots_allowed(txt, "/ignored-no-group/a")
    assert not robots_allowed(txt, "/real/a")


def test_no_robots_means_allowed():
    assert robots_allowed("", "/anything")


def test_spark_kernel(spark):
    from gfw_pixetl_spark.functions.robots import robots_filter

    df = spark.createDataFrame(
        [(1, BASIC, "/private/a"), (2, BASIC, "/private/ok/b"),
         (3, BASIC, "/data/x"), (4, BASIC, "/files/c.tmp")],
        "doc_id long, robots_txt string, path string")
    got = {r.doc_id: r.allowed
           for r in robots_filter(df).select("doc_id", "allowed").collect()}
    assert got == {1: False, 2: True, 3: True, 4: False}


def test_equal_groups_are_combined_rfc():
    """RFC 9309 §2.2.1: multiple groups matching the agent equally MUST
    be combined (concatenated robots files repeat 'User-agent: *')."""
    txt = ("User-agent: *\nDisallow: /a\n\n"
           "Sitemap: https://x/s.xml\n\n"
           "User-agent: *\nDisallow: /b\n")
    assert not robots_allowed(txt, "/a/x")
    assert not robots_allowed(txt, "/b/x")
    assert robots_allowed(txt, "/c/x")
