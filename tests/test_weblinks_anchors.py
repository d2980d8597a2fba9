"""Anchor-text extraction + per-target-host top-k term rollup."""

from __future__ import annotations

import pytest

from core_spark.functions.weblinks import anchor_topk, with_anchors


def _anchors(spark, html):
    df = spark.createDataFrame([(html,)], "html_str string")
    [row] = with_anchors(df).select("anchors").collect()
    return [(a["link"], a["text"]) for a in row["anchors"]]


@pytest.mark.spark
class TestAnchorExtraction:
    def test_quote_styles_and_case(self, spark):
        html = (
            '<a href="https://a.example/x">one</a>'
            "<A HREF='https://b.example/y'>TWO!</A>"
            "<a class=c href=https://c.example/z>three</a>"
        )
        assert _anchors(spark, html) == [
            ("https://a.example/x", "one"),
            ("https://b.example/y", "TWO!"),
            ("https://c.example/z", "three"),
        ]

    def test_zip_alignment_two_links(self, spark):
        # href[i] must pair with text[i] — two links, distinct anchors
        html = '<a href="https://a.example/1">first</a>mid<a href="https://b.example/2">second</a>'
        assert _anchors(spark, html) == [
            ("https://a.example/1", "first"),
            ("https://b.example/2", "second"),
        ]

    def test_nested_markup_anchor_is_dropped(self, spark):
        # documented spec: only DIRECT text counts; nested markup = no match
        html = '<a href="https://a.example/x"><b>bold</b></a>'
        assert _anchors(spark, html) == []

    def test_empty_anchor_matches_with_no_text(self, spark):
        assert _anchors(spark, '<a href="https://a.example/x"></a>') == [
            ("https://a.example/x", "")
        ]

    def test_relative_and_mailto_rejected(self, spark):
        html = '<a href="/rel">x</a><a href="mailto:a@b.c">y</a>'
        assert _anchors(spark, html) == []

    def test_topk_rollup_and_tokenization(self, spark):
        rows = [
            ('<a href="https://t.example/1">Read More!</a>',),
            ('<a href="https://WWW.t.example:443/2">read this</a>',),
            ('<a href="https://other.example/3">read</a>',),
        ]
        df = with_anchors(spark.createDataFrame(rows, "html_str string"))
        got = {
            (r.dst_host, r.term): (r.n, r.rank)
            for r in anchor_topk(df, k=2).collect()
        }
        # 'read' appears twice for t.example (www+port canonicalized in);
        # k=2 keeps (read, more) — 'this' ties 'more' at n=1, term ASC
        assert got == {
            ("t.example", "read"): (2, 1),
            ("t.example", "more"): (1, 2),
            ("other.example", "read"): (1, 1),
        }

    def test_plan_shape(self, spark):
        df = with_anchors(
            spark.createDataFrame(
                [('<a href="https://a.example/x">w</a>',)], "html_str string"
            )
        )
        plan = (
            anchor_topk(df, k=3)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "WindowGroupLimit" in plan  # no full per-host sort
        assert "Python" not in plan        # all JVM-side
