"""Outlink extraction + host edges (functions/weblinks).

Pinned extraction cases across the spec's branch space (quote styles,
casing, tag types, relative/mailto rejection), an html.parser Python
model on well-formed fixtures, the documented regex-spec divergence
pinned explicitly, host-edge rollup vs a Python model, and plan asserts
(no Python stage, no extra Exchange before the aggregate).
"""

from __future__ import annotations

from html.parser import HTMLParser

import pytest

from core_spark.functions.weblinks import host_edges, with_outlinks

CASES = [
    # (html, expected outlinks)
    ("<p>no links here</p>", []),
    ('<a href="https://a.example/p">x</a>', ["https://a.example/p"]),
    ("<a href='https://b.example/q'>x</a>", ["https://b.example/q"]),
    ("<a href=https://c.example/r>x</a>", ["https://c.example/r"]),
    ('<A HREF="https://d.example/s">x</A>', ["https://d.example/s"]),
    ('<link rel="next" href="https://e.example/n">', ["https://e.example/n"]),
    ('<a href="/relative">x</a>', []),
    ('<a href="mailto:a@b.c">x</a>', []),
    ('<a href="javascript:void(0)">x</a>', []),
    # document order, duplicates kept
    (
        '<a href="https://a.example/1">x</a> text '
        '<a href="https://b.example/2">y</a>'
        '<a href="https://a.example/1">x again</a>',
        ["https://a.example/1", "https://b.example/2", "https://a.example/1"],
    ),
    # attribute order: href not first
    (
        '<a class="c" id="i" href="https://f.example/t">x</a>',
        ["https://f.example/t"],
    ),
    # href in a non-link tag is ignored
    ('<img href="https://g.example/u">', []),
    # whitespace around '='
    ('<a href = "https://h.example/v">x</a>', ["https://h.example/v"]),
    ("", []),
]


def _df(spark, htmls):
    return spark.createDataFrame(
        [(i, h) for i, h in enumerate(htmls)], "doc_id int, html_str string"
    )


@pytest.mark.spark
def test_pinned_extraction_cases(spark):
    got = {
        r["doc_id"]: r["outlinks"]
        for r in with_outlinks(_df(spark, [h for h, _ in CASES])).collect()
    }
    for i, (html, want) in enumerate(CASES):
        assert got[i] == want, html


class _Model(HTMLParser):
    """Independent model: real HTML tokenizer, same keep-rules."""

    def __init__(self):
        super().__init__()
        self.links: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in ("a", "link"):
            for k, v in attrs:
                if k == "href" and v and v.startswith(("http://", "https://")):
                    self.links.append(v)


def _model_links(html: str) -> list[str]:
    m = _Model()
    m.feed(html)
    return m.links


@pytest.mark.spark
def test_matches_html_parser_model_on_wellformed(spark):
    htmls = [h for h, _ in CASES]
    got = {
        r["doc_id"]: r["outlinks"]
        for r in with_outlinks(_df(spark, htmls)).collect()
    }
    for i, h in enumerate(htmls):
        assert got[i] == _model_links(h), h


@pytest.mark.spark
def test_documented_regex_spec_divergence(spark):
    """A WHITESPACE-preceded href= embedded in another attribute's value
    is read as the attribute — the documented regex-spec limit (module
    docstring). A quote-preceded embedded href= (the common case) is
    correctly skipped because the spec requires \\s before href."""
    ok = "<a title='href=\"https://evil.example/x\"' href=\"https://real.example/y\">x</a>"
    [row] = with_outlinks(_df(spark, [ok])).collect()
    assert row["outlinks"] == ["https://real.example/y"]  # quote-preceded: safe
    div = "<a title='a href=\"https://evil.example/x\"' href=\"https://real.example/y\">x</a>"
    [row] = with_outlinks(_df(spark, [div])).collect()
    assert row["outlinks"] == ["https://evil.example/x"]  # pinned, not ideal
    assert _model_links(div) == ["https://real.example/y"]  # the tokenizer view


@pytest.mark.spark
def test_host_edges_rollup(spark):
    df = _df(
        spark,
        [
            '<a href="https://WWW.A.example:443/p">x</a>'
            '<a href="https://a.example/q">y</a>',
            '<a href="http://b.example:80/r">z</a>',
            "<p>none</p>",
        ],
    ).selectExpr("concat('s', doc_id % 2, '.example') AS src_host", "html_str")
    got = sorted(
        (r["src_host"], r["dst_host"], r["n_links"])
        for r in host_edges(with_outlinks(df)).collect()
    )
    assert got == [
        ("s0.example", "a.example", 2),
        ("s1.example", "b.example", 1),
    ]


@pytest.mark.spark
def test_plan_no_python_single_agg_exchange(spark):
    df = _df(spark, ['<a href="https://a.example/p">x</a>']).selectExpr(
        "'s.example' AS src_host", "html_str"
    )
    plan = (
        host_edges(with_outlinks(df))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert plan.count("Exchange") <= 1  # only the final aggregate shuffle
