"""Outline-inventory tests — the suite-tree flattening analog (SURVEY §1.3).

Table-driven like the reference's parser tests (exact trees, statuses,
locations -> here: exact paths, levels, word counts)."""

from __future__ import annotations

import pytest

from core_spark.functions.structure import extract_outline, outline_counts, with_outline

DOC = b"""
<html><body>
<h1>Intro</h1> welcome words here
<h2>Motivation</h2> three words only
<h2>Scope</h2> a b c d
<h3>Details</h3> deep
<h1>Methods</h1> final section text
</body></html>
"""


class TestKernel:
    def test_outline_paths(self):
        rows = extract_outline(DOC)
        assert [(r["level"], r["title"], r["path"]) for r in rows] == [
            (1, "Intro", []),
            (2, "Motivation", ["Intro"]),
            (2, "Scope", ["Intro"]),
            (3, "Details", ["Intro", "Scope"]),
            (1, "Methods", []),
        ]
        assert [r["n_words"] for r in rows] == [3, 3, 4, 1, 3]

    def test_skipped_level_nests_under_nearest(self):
        rows = extract_outline(b"<h1>A</h1><h4>deep</h4><h2>B</h2>")
        assert rows[1]["path"] == ["A"]
        assert rows[2]["path"] == ["A"]

    def test_tags_inside_heading_and_empty(self):
        rows = extract_outline(b"<h1>Hello <em>World</em></h1>")
        assert rows[0]["title"] == "Hello World"
        assert extract_outline(None) == []
        assert extract_outline(b"no headings at all") == []

    def test_deterministic(self):
        assert extract_outline(DOC) == extract_outline(DOC)


@pytest.mark.spark
class TestStage:
    def test_with_outline_and_counts(self, spark):
        df = spark.createDataFrame(
            [(1, "u1", bytearray(DOC)), (2, "u2", bytearray(b"<p>flat</p>"))],
            "doc_id bigint, url string, html binary",
        )
        out = with_outline(df).orderBy("doc_id", "heading_idx").collect()
        assert len(out) == 5  # doc 2 contributes nothing
        assert out[3].path == ["Intro", "Scope"]

        counts = {r.doc_id: r for r in outline_counts(with_outline(df)).collect()}
        assert counts[1].n_headings == 5
        assert counts[1].n_top == 2
        assert counts[1].max_depth == 3
        assert counts[1].n_words_total == 14
        assert 2 not in counts
