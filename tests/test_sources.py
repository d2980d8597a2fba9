"""S1-S8 source/sink parity tests (SURVEY.md §2.1)."""

from __future__ import annotations

import os

import pytest

from core_spark.sources.ingest import (
    CORPUS_SCHEMA_FIELDS,
    glob_filter,
    read_corpus,
    read_file_tree,
    with_git_lineage,
    write_snapshot,
)


@pytest.mark.spark
class TestFileTree:
    @pytest.fixture()
    def tree(self, tmp_path):
        files = {
            "src/app.py": b"print('hi')",
            "src/node_modules/dep/index.js": b"module.exports = 1",
            "vendor/lib.go": b"package lib",
            "docs/readme.md": b"# readme",
            "big.bin": b"x" * 2048,
        }
        for rel, content in files.items():
            p = tmp_path / rel
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_bytes(content)
        return str(tmp_path)

    def test_skip_dirs_and_size(self, spark, tree):
        df = read_file_tree(spark, tree, max_file_size=1024)
        paths = sorted(r.path.split(str(tree))[-1] for r in df.collect())
        assert "/src/app.py" in paths
        assert "/docs/readme.md" in paths
        assert not any("node_modules" in p for p in paths)  # S4
        assert not any("vendor" in p for p in paths)        # S4
        assert not any("big.bin" in p for p in paths)       # F3

    def test_glob_filter(self, spark, tree):
        df = read_file_tree(spark, tree)
        py = glob_filter(df, ["*.py"])
        assert all(r.path.endswith(".py") for r in py.collect())
        assert py.count() == 1

    def test_pushdown_in_plan(self, spark, tree):
        """The size/skip predicates must appear as data filters, not Python."""
        df = read_file_tree(spark, tree, max_file_size=1024)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Filter" in plan
        assert "mapInPandas" not in plan.lower()


@pytest.mark.spark
class TestCorpusAndSinks:
    def test_read_corpus_validates(self, spark, tmp_path):
        from core_spark.data.synth import webpages_spark

        path = str(tmp_path / "corpus")
        webpages_spark(spark, 50, 2).select(
            "url", "warc_ts", "html", "lang", "doc_id"
        ).write.parquet(path)
        df = read_corpus(spark, path)
        assert set(CORPUS_SCHEMA_FIELDS) <= set(df.columns)

        bad = str(tmp_path / "bad")
        spark.range(5).write.parquet(bad)
        with pytest.raises(ValueError, match="corpus schema mismatch"):
            read_corpus(spark, bad)

    def test_snapshot_sink_deterministic(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(3, "c"), (1, "a"), (2, "b")], "id bigint, v string"
        )
        out = str(tmp_path / "snap")
        write_snapshot(df, out, order_by=["id"])
        back = spark.read.parquet(out).collect()
        assert [r.id for r in back] == [1, 2, 3]
        assert len([f for f in os.listdir(out) if f.endswith(".parquet")]) == 1

    def test_git_lineage_cols(self, spark):
        import datetime

        df = spark.range(3)
        out = with_git_lineage(
            df, "abc123", datetime.datetime(2026, 1, 1), branch="main"
        )
        row = out.first()
        assert row.commit_sha == "abc123" and row.branch == "main"
