"""G9 tests: manifest lineage, resume-without-recompute, pipeline end-to-end.

Reference analog being reproduced: clone-completion markers + FromCache
(tests/integration/clone.go:13-60) and deterministic re-runs (ADR core/12).
"""

from __future__ import annotations

import json
import os

import pytest

from core_spark.plans.manifest import StageManifest, content_fingerprint


def test_fingerprint_deterministic():
    a = content_fingerprint("stage", 1, {"k": [1, 2]})
    b = content_fingerprint("stage", 1, {"k": [1, 2]})
    c = content_fingerprint("stage", 2, {"k": [1, 2]})
    assert a == b != c


@pytest.mark.spark
class TestManifest:
    def test_run_resume_invalidate(self, spark, tmp_path):
        man = StageManifest(str(tmp_path))
        calls = {"n": 0}

        def build():
            calls["n"] += 1
            return spark.range(0, 100, 1, 4).withColumnRenamed("id", "doc_id")

        fp = content_fingerprint("s1", 100)
        df1 = man.run_stage(spark, "s1", fp, build)
        assert df1.count() == 100
        assert calls["n"] == 1

        # resume: same fingerprint -> no rebuild
        df2 = man.run_stage(spark, "s1", fp, build)
        assert df2.count() == 100
        assert calls["n"] == 1

        # invalidate: new fingerprint -> rebuild
        man.run_stage(spark, "s1", content_fingerprint("s1", 200), build)
        assert calls["n"] == 2

    def test_manifest_lineage_fields(self, spark, tmp_path):
        man = StageManifest(str(tmp_path))
        fp = content_fingerprint("x", 1)
        man.run_stage(
            spark, "x", fp, lambda: spark.range(0, 1000, 1, 8).selectExpr("id")
        )
        m = man.read("x")
        assert m["row_count"] == 1000
        assert m["fingerprint"] == fp
        assert m["n_files"] >= 1
        assert sum(f["rows"] for f in m["per_file"]) == 1000
        assert m["wall_ms"] >= 0
        # manifest file is valid standalone json
        with open(os.path.join(str(tmp_path), "_manifest", "x.json")) as f:
            assert json.load(f)["stage"] == "x"

    def test_pipeline_end_to_end_and_resume(self, spark, tmp_path):
        from core_spark.plans.pipeline import run_pipeline

        r1 = run_pipeline(spark, str(tmp_path), n_docs=300, partitions=4)
        zon1 = r1["zonal"].orderBy("h3_r7").collect()
        assert r1["ingest"].count() == 300
        assert len(zon1) > 0
        total = sum(row.doc_count for row in zon1)
        assert total == r1["tiles"].count()  # every mention lands in a cell

        # resume run must produce identical zonal output and skip all stages
        metrics_before = {m["stage"]: m["written_at_unix"] for m in r1["_manifest"].metrics()}
        r2 = run_pipeline(spark, str(tmp_path), n_docs=300, partitions=4)
        zon2 = r2["zonal"].orderBy("h3_r7").collect()
        assert zon1 == zon2
        metrics_after = {m["stage"]: m["written_at_unix"] for m in r2["_manifest"].metrics()}
        assert metrics_before == metrics_after  # nothing recomputed

        # PIP stage keeps every mention row (left-join semantics)
        assert r2["pip"].count() == r2["tiles"].count()
