"""D1-D8 cascade tests — reproduces the reference's detector unit semantics
(pkg/parser/detection/detector_test.go shapes: priority, early return,
veto, scope tie-break)."""

from __future__ import annotations

import pytest

from core_spark.operators.detect import (
    Definition,
    PRIORITY_GENERIC,
    PRIORITY_SPECIALIZED,
    confidence_dist,
    detect,
    imports_col,
    lang_col,
    resolve_scopes,
    sort_registry,
)

REGISTRY = [
    Definition(
        name="jest",
        priority=PRIORITY_GENERIC,
        import_patterns=("@jest/globals",),
        content_patterns=(r"\bdescribe\(", r"\bit\("),
    ),
    Definition(
        name="vitest",
        priority=PRIORITY_SPECIALIZED,
        import_patterns=("vitest",),
        content_patterns=(r"\bvi\.mock\(",),
    ),
    Definition(
        name="cypress",
        priority=150,
        filename_patterns=(r"\.cy\.[jt]s$",),
        content_patterns=(r"\bcy\.visit\(",),
    ),
    Definition(
        name="mocha",
        priority=PRIORITY_GENERIC,
        content_patterns=(r"\bdescribe\(",),
        negative_patterns=(r"NO_MOCHA",),
    ),
]


def test_registry_order():
    names = [d.name for d in sort_registry(REGISTRY)]
    assert names == ["vitest", "cypress", "jest", "mocha"]


@pytest.mark.spark
class TestCascade:
    def rows(self, spark, rows):
        return spark.createDataFrame(rows, "url string, text string")

    def test_priority_and_sources(self, spark):
        df = self.rows(
            spark,
            [
                # import beats everything (early return tier 1)
                ("a.test.js", "import {it} from 'vitest'; describe('x')"),
                # strong filename beats content
                ("b.cy.ts", "describe('e2e')"),
                # content: vitest (specialized) outranks jest on shared describe?
                # no — jest's describe pattern vs mocha's: jest sorts first
                ("c.test.js", "describe('unit', () => {})"),
                # veto: mocha suppressed, jest still matches
                ("d.test.js", "describe('x') NO_MOCHA"),
                ("e.txt", "nothing here"),
            ],
        )
        imp = imports_col("text", "javascript")
        out = (
            detect(
                df.withColumn("imports", imp),
                REGISTRY,
                path_col="url",
                imports_col_name="imports",
            )
            .orderBy("url")
            .collect()
        )
        by = {r.url: r for r in out}
        assert by["a.test.js"].framework == "vitest"
        assert by["a.test.js"].detect_source == "import"
        assert by["b.cy.ts"].framework == "cypress"
        assert by["b.cy.ts"].detect_source == "strong-filename"
        assert by["b.cy.ts"].confidence == 100
        assert by["c.test.js"].framework == "jest"  # priority order among content
        assert by["c.test.js"].confidence == 40
        assert by["d.test.js"].framework == "jest"  # mocha vetoed, jest arm wins
        assert by["e.txt"].framework is None
        assert by["e.txt"].detect_source == "unknown"

        dist = {r.detect_source: r.n for r in confidence_dist(
            detect(df.withColumn("imports", imp), REGISTRY,
                   path_col="url", imports_col_name="imports")).collect()}
        assert dist == {"import": 1, "strong-filename": 1,
                        "content-pattern": 2, "unknown": 1}

    def test_lang_detect(self, spark):
        df = spark.createDataFrame(
            [("x/app.PY",), ("y/m.go",), ("z/q.tsx",), ("w/none",)], "path string"
        )
        out = {r.path: r.lang for r in df.withColumn("lang", lang_col("path")).collect()}
        assert out == {"x/app.PY": "python", "y/m.go": "go",
                       "z/q.tsx": "typescript", "w/none": None}

    def test_scope_tiebreak(self, spark):
        """Deepest base dir > longest cfg path > lexicographic (detector.go:213-230)."""
        files = spark.createDataFrame(
            [("pkg/web/src/a.test.js",), ("other/b.test.js",)], "path string"
        )
        scopes = spark.createDataFrame(
            [
                ("jest.config.js", "", "jest-root"),
                ("pkg/web/jest.config.js", "pkg/web", "jest-web"),
                ("pkg/web/vitest.config.ts", "pkg/web", "vitest-web"),
            ],
            "cfg_path string, base_dir string, framework string",
        )
        out = {r.path: r for r in resolve_scopes(files, scopes).collect()}
        # deepest base dir wins; among equal depth, LONGER cfg path wins
        assert out["pkg/web/src/a.test.js"].framework == "vitest-web"
        assert out["other/b.test.js"].framework == "jest-root"
