"""Bucketed-table plan audit: grouping on the bucket column needs NO shuffle."""

from __future__ import annotations

import pytest

from core_spark.data import synth
from core_spark.sources.bucketed import (
    has_exchange,
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
