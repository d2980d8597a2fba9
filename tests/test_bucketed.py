"""Bucketed-table plan audit: grouping on the bucket column needs NO shuffle."""

from __future__ import annotations

import pytest

from core_spark.data import synth
from core_spark.sources.bucketed import (
    has_exchange,
    join_bucketed,
    write_bucketed_docs,
    zonal_rollup_bucketed,
)


@pytest.mark.spark
class TestBucketed:
    def test_bucketed_agg_has_no_exchange(self, spark, tmp_path):
        from core_spark.operators.tiles import assign_tiles

        pdf = synth.webpages_pandas(400)
        pts = pdf.dropna(subset=["true_lat"])[["doc_id", "true_lat", "true_lon", "lang"]]
        pts = pts.rename(columns={"true_lat": "lat", "true_lon": "lon"})
        docs = assign_tiles(spark.createDataFrame(pts), resolutions=(5,))

        try:
            write_bucketed_docs(
                docs, "docs_b", 8, "h3_r5", path=str(tmp_path / "docs_b")
            )
            bucketed = zonal_rollup_bucketed(spark, "docs_b", "h3_r5")
            plain = docs.groupBy("h3_r5", "lang").count()

            assert not has_exchange(bucketed)  # bucket distribution reused
            assert has_exchange(plain)         # unbucketed must shuffle

            # same results either way
            got = {(r.h3_r5, r.lang): r.n for r in bucketed.collect()}
            want = {(r.h3_r5, r.lang): r["count"] for r in plain.collect()}
            assert got == want
        finally:
            spark.sql("DROP TABLE IF EXISTS docs_b")

    def test_bucketed_join_no_shuffle_on_bucketed_side(self, spark, tmp_path):
        """Equi-join on the bucket column: the bucketed fact side is not
        re-shuffled (only the small side moves)."""
        from pyspark.sql import functions as F

        from core_spark.operators.tiles import assign_tiles

        pdf = synth.webpages_pandas(400)
        pts = pdf.dropna(subset=["true_lat"])[["doc_id", "true_lat", "true_lon", "lang"]]
        pts = pts.rename(columns={"true_lat": "lat", "true_lon": "lon"})
        docs = assign_tiles(spark.createDataFrame(pts), resolutions=(5,))
        try:
            write_bucketed_docs(
                docs, "docs_j", 8, "h3_r5", path=str(tmp_path / "docs_j")
            )
            fact = spark.table("docs_j")
            dim = fact.select("h3_r5").distinct().limit(20).withColumn(
                "flag", F.lit(1)
            )
            joined = fact.join(F.broadcast(dim), "h3_r5")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" in plan
            assert "Exchange hashpartitioning" not in plan
            assert joined.count() > 0
        finally:
            spark.sql("DROP TABLE IF EXISTS docs_j")

    def test_colocated_join_both_sides_bucketed(self, spark, tmp_path):
        """Fact x fact equi-join where BOTH sides are bucketed on the join
        key: zero Exchange even with broadcast disabled — the co-located
        big-join layout (sources/bucketed.py::join_bucketed)."""
        from pyspark.sql import functions as F

        pdf = synth.webpages_pandas(400)[["doc_id", "lang", "n_mentions"]]
        docs = spark.createDataFrame(pdf)
        feats = docs.select(
            "doc_id", (F.col("n_mentions") % 97).alias("score")
        )
        thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            write_bucketed_docs(
                docs, "fact_a", 8, "doc_id", path=str(tmp_path / "fa")
            )
            write_bucketed_docs(
                feats, "fact_b", 8, "doc_id", path=str(tmp_path / "fb")
            )
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            joined = join_bucketed(spark, "fact_a", "fact_b", "doc_id")
            got = {(r.doc_id, r.score) for r in joined.collect()}
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan

            want = {
                (r.doc_id, r.score)
                for r in docs.join(feats, "doc_id").collect()
            }
            assert got == want and len(got) == 400
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
            spark.sql("DROP TABLE IF EXISTS fact_a")
            spark.sql("DROP TABLE IF EXISTS fact_b")
