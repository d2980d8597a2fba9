"""Sitemap parsing: spec arms, entity decoding, index expansion, errors."""

from __future__ import annotations

import pytest

from core_spark.operators.sitemaps import parse_sitemaps

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://a.example.com/p0?x=1&amp;y=2</loc>
    <lastmod>2024-01-03</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>
      https://a.example.com/p1
  </loc></url>
  <url><loc>https://a.example.com/amp-&amp;lt;-literal</loc></url>
</urlset>"""

INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap>
    <loc>https://b.example.com/sm_0.xml</loc>
    <lastmod>2024-02-01</lastmod>
  </sitemap>
  <sitemap><loc>https://b.example.com/sm_1.xml</loc></sitemap>
</sitemapindex>"""

CHILD = """<urlset><url><loc>https://b.example.com/c0</loc></url></urlset>"""

EMPTY = """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"></urlset>"""

BAD = "<html>not a sitemap</html>"

DIRECTORY = [
    ("a.example.com", "https://a.example.com/sitemap.xml", URLSET),
    ("b.example.com", "https://b.example.com/sitemap.xml", INDEX),
    ("b.example.com", "https://b.example.com/sm_0.xml", CHILD),
    ("c.example.com", "https://c.example.com/sitemap.xml", EMPTY),
    ("bad.example.com", "https://bad.example.com/sitemap.xml", BAD),
]


@pytest.fixture(scope="module")
def parsed(spark):
    df = spark.createDataFrame(DIRECTORY, ["host", "sitemap_url", "xml"])
    rows = parse_sitemaps(df).collect()
    return {
        (r["sitemap_url"], r["pos"]): r for r in rows
    }, rows


@pytest.mark.spark
def test_urlset_entries(parsed):
    by_key, _ = parsed
    r0 = by_key[("https://a.example.com/sitemap.xml", 0)]
    assert r0["kind"] == "urlset"
    assert r0["loc"] == "https://a.example.com/p0?x=1&y=2"  # &amp; decoded
    assert r0["lastmod"] == "2024-01-03"
    assert r0["changefreq"] == "daily"
    assert r0["priority"] == "0.8"
    assert r0["child_present"] is None
    r1 = by_key[("https://a.example.com/sitemap.xml", 1)]
    assert r1["loc"] == "https://a.example.com/p1"  # whitespace trimmed
    assert r1["lastmod"] is None and r1["priority"] is None
    # double-escaped stays literal: &amp;lt; -> &lt;
    r2 = by_key[("https://a.example.com/sitemap.xml", 2)]
    assert r2["loc"] == "https://a.example.com/amp-&lt;-literal"


@pytest.mark.spark
def test_index_entries_and_child_presence(parsed):
    by_key, _ = parsed
    r0 = by_key[("https://b.example.com/sitemap.xml", 0)]
    assert r0["kind"] == "sitemapindex"
    assert r0["loc"] == "https://b.example.com/sm_0.xml"
    assert r0["lastmod"] == "2024-02-01"
    assert r0["child_present"] == 1  # fetched — in the directory
    r1 = by_key[("https://b.example.com/sitemap.xml", 1)]
    assert r1["loc"] == "https://b.example.com/sm_1.xml"
    assert r1["child_present"] == 0  # referenced but never fetched
    child = by_key[("https://b.example.com/sm_0.xml", 0)]
    assert child["kind"] == "urlset"
    assert child["loc"] == "https://b.example.com/c0"


@pytest.mark.spark
def test_empty_and_error_documents_kept(parsed):
    by_key, rows = parsed
    empty = by_key[("https://c.example.com/sitemap.xml", None)]
    assert empty["kind"] == "urlset" and empty["loc"] is None
    bad = by_key[("https://bad.example.com/sitemap.xml", None)]
    assert bad["kind"] == "error"
    assert bad["loc"] is None and bad["child_present"] is None
    # exactly one row per document entry + one per empty/error document
    assert len(rows) == 3 + 2 + 1 + 1 + 1


@pytest.mark.spark
def test_url_tag_never_matches_urlset(spark):
    """The \\b in the block regex: a one-entry urlset yields ONE block,
    not a bogus match of the <urlset> wrapper."""
    df = spark.createDataFrame(
        [("h", "s", "<urlset><url><loc>https://h/x</loc></url></urlset>")],
        ["host", "sitemap_url", "xml"],
    )
    rows = parse_sitemaps(df).collect()
    assert len(rows) == 1 and rows[0]["loc"] == "https://h/x"
