"""MediaWiki dump ingest + wikitext cleaning (sources/mediawiki.py):
writer/reader round trip, streaming page iteration, and the markup
stripper's rule-by-rule surface."""

from __future__ import annotations

from gfw_pixetl_spark.sources.mediawiki import (
    extract_links, iter_pages, wikitext_to_text, write_dump,
)


def test_dump_roundtrip_and_redirect():
    pages = [
        {"title": "Alpha", "id": 1, "text": "plain body"},
        {"title": "Beta", "id": 2, "text": "#REDIRECT [[Alpha]]",
         "redirect": "Alpha"},
        {"title": "Talk:Gamma", "id": 3, "ns": 1,
         "text": "discussion & <escaping> test"},
    ]
    got = list(iter_pages(write_dump(pages)))
    assert [p["title"] for p in got] == ["Alpha", "Beta", "Talk:Gamma"]
    assert got[0]["redirect"] is None
    assert got[1]["redirect"] == "Alpha"
    assert got[2]["ns"] == 1
    assert got[2]["text"] == "discussion & <escaping> test"


def test_wikitext_links():
    s = "See [[Spark]] and [[Apache Iceberg|Iceberg]] for details."
    assert wikitext_to_text(s) == \
        "See Spark and Iceberg for details."
    assert extract_links(s) == ["Spark", "Apache Iceberg"]


def test_wikitext_templates_nested():
    s = "Before {{infobox|a={{nested|x}}|b=2}} after."
    assert wikitext_to_text(s) == "Before after."


def test_wikitext_file_links_with_nested_caption():
    s = ("Text [[File:pic.jpg|thumb|A [[caption link]] here]] more "
         "[[Category:Things]] end.")
    assert wikitext_to_text(s) == "Text more end."
    # the caption's nested link is NOT a page link
    assert extract_links(s) == []


def test_wikitext_refs_comments_headings_lists():
    s = ("== History ==\n"
         "Line one.<ref name=a>cite</ref>\n"
         "<!-- hidden -->\n"
         "* item one\n"
         "# item two\n"
         "Self-closed.<ref name=b />")
    assert wikitext_to_text(s) == \
        "History Line one. item one item two Self-closed."


def test_wikitext_quotes_tables_external_links():
    s = ("'''Bold''' and ''italic'' text.\n"
         "{|\n| cell\n|}\n"
         "Visit [https://example.org the site] or "
         "[https://bare.example.org] now.")
    assert wikitext_to_text(s) == \
        "Bold and italic text. Visit the site or now."


def test_streaming_many_pages():
    pages = [{"title": f"P{i}", "id": i + 1, "text": f"body {i}"}
             for i in range(500)]
    seen = 0
    for p in iter_pages(write_dump(pages)):
        assert p["text"] == f"body {p['id'] - 1}"
        seen += 1
    assert seen == 500
