"""G5/G6 tests: ray-cast PIP, STRtree, PIP join, kNN — kernels + Spark stages.

Mirrors the reference's table-driven unit layer (pkg/parser/scanner_test.go)
plus golden comparisons for the graft's PIP-correctness and kNN-ordering
fixtures (BASELINE.json:6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from core_spark.data import synth
from core_spark.data.polygons import admin_polygons, edges_sql_values, gen_polygon
from core_spark.functions.geometry import (
    STRtree,
    haversine_m,
    point_in_ring,
    points_in_ring,
    ring_envelope,
    ring_to_wkt,
    wkt_to_ring,
)
from core_spark.operators.knn import guaranteed_radius_m, knn_bruteforce_pandas
from core_spark.operators.pip import match_points

SQUARE = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
CONCAVE = np.array([[0, 0], [6, 0], [6, 6], [3, 3], [0, 6]], dtype=np.float64)


class TestRayCast:
    @pytest.mark.parametrize(
        "px,py,want",
        [
            (2.0, 2.0, True),
            (-1.0, 2.0, False),
            (5.0, 2.0, False),
            (2.0, -0.5, False),
            (2.0, 4.5, False),
            (3.999999, 3.999999, True),
        ],
    )
    def test_square(self, px, py, want):
        assert point_in_ring(px, py, SQUARE) is want

    def test_concave_notch(self):
        # the notch between (3,3) and y=6 is outside
        assert point_in_ring(3.0, 4.0, CONCAVE) is False
        assert point_in_ring(1.0, 2.0, CONCAVE) is True
        assert point_in_ring(5.0, 2.0, CONCAVE) is True

    def test_half_open_shared_edge(self):
        """A point on the border of two squares sharing edge x=4 belongs to
        exactly one (the right one, whose left edge is crossing-counted)."""
        right = SQUARE + np.array([4.0, 0.0])
        on_edge = (4.0, 2.0)
        in_left = point_in_ring(*on_edge, SQUARE)
        in_right = point_in_ring(*on_edge, right)
        assert in_left != in_right  # exactly one

    def test_vectorized_matches_scalar(self):
        rng = np.random.default_rng(7)
        px = rng.uniform(-1, 7, 500)
        py = rng.uniform(-1, 7, 500)
        vec = points_in_ring(px, py, CONCAVE)
        for i in range(500):
            assert vec[i] == point_in_ring(px[i], py[i], CONCAVE)


class TestSTRtree:
    def test_query_matches_bruteforce(self):
        rng = np.random.default_rng(11)
        boxes = np.sort(rng.uniform(-50, 50, (300, 2, 2)), axis=1).reshape(300, 4)[
            :, [0, 2, 1, 3]
        ]
        tree = STRtree(boxes)
        for _ in range(200):
            x, y = rng.uniform(-55, 55, 2)
            got = set(tree.query_point(x, y).tolist())
            want = {
                i
                for i in range(300)
                if boxes[i, 0] <= x <= boxes[i, 2] and boxes[i, 1] <= y <= boxes[i, 3]
            }
            assert got == want

    def test_empty(self):
        assert len(STRtree(np.empty((0, 4))).query_point(0, 0)) == 0


class TestPolygons:
    def test_deterministic_and_disjoint(self):
        a, b = gen_polygon(3), gen_polygon(3)
        assert np.array_equal(a, b)
        polys = admin_polygons(96)
        # envelopes of distinct grid slots never overlap
        for i in range(0, 96, 7):
            for j in range(i + 1, min(i + 8, 96)):
                ei = polys.iloc[i]
                ej = polys.iloc[j]
                sep = (
                    ei.maxx < ej.minx
                    or ej.maxx < ei.minx
                    or ei.maxy < ej.miny
                    or ej.maxy < ei.miny
                )
                assert sep

    def test_wkt_roundtrip(self):
        ring = gen_polygon(5)
        assert np.allclose(wkt_to_ring(ring_to_wkt(ring)), ring)

    def test_edges_sql_values_shape(self):
        sql = edges_sql_values(4)
        assert sql.startswith("VALUES ")
        assert sql.count("(") >= 4 * 5  # >= 5 edges per polygon


def _brute_inside(x: float, y: float, rings) -> bool:
    """Even-odd across all rings (outer + holes)."""
    inside = False
    for ring in rings:
        inside ^= point_in_ring(x, y, np.asarray(ring))
    return inside


class TestMatchPoints:
    def test_centers_match_own_polygon(self):
        polys = admin_polygons(96)
        payload = [(int(r.admin_id), [list(ring) for ring in r.rings]) for r in polys.itertuples()]
        for r in polys.itertuples():
            ring = np.asarray(r.ring)
            cx, cy = ring[:, 0].mean(), ring[:, 1].mean()
            got = match_points(np.array([cx]), np.array([cy]), payload)
            if len(r.rings) > 1 and _brute_inside(cx, cy, r.rings[1:]) :
                assert got[0] == -1  # centroid sits in the hole
            else:
                assert got[0] == r.admin_id
        # far-ocean point matches nothing
        assert match_points(np.array([0.0]), np.array([-89.0]), payload)[0] == -1

    def test_holes_excluded(self):
        """Every 7th polygon carries a hole; points in the hole are outside,
        points in the annulus are inside — engine and even-odd agree."""
        polys = admin_polygons(96)
        holed = polys[polys["rings"].apply(len) > 1]
        assert len(holed) > 0
        payload = [(int(r.admin_id), [list(ring) for ring in r.rings]) for r in polys.itertuples()]
        for r in holed.itertuples():
            outer = np.asarray(r.rings[0])
            hole = np.asarray(r.rings[1])
            hc = hole.mean(axis=0)  # deep inside the hole
            got = match_points(np.array([hc[0]]), np.array([hc[1]]), payload)
            assert got[0] == -1
            # a point midway between hole edge and outer edge (annulus)
            mid = (hole[0] + outer[0]) / 2.0
            got2 = match_points(np.array([mid[0]]), np.array([mid[1]]), payload)
            assert got2[0] == r.admin_id

    def test_antimeridian_split_fragments_share_id(self):
        """A crossing polygon pre-split into two fragments with one admin_id:
        points in either fragment resolve to that id."""
        west = [(-180.0, 0.0), (-178.0, 0.0), (-178.0, 5.0), (-180.0, 5.0)]
        east = [(178.0, 0.0), (180.0, 0.0), (180.0, 5.0), (178.0, 5.0)]
        payload = [(7, [west]), (7, [east])]
        got = match_points(
            np.array([-179.0, 179.0, 0.0]), np.array([2.0, 2.0, 2.0]), payload
        )
        assert got.tolist() == [7, 7, -1]

    def test_matches_bruteforce_on_corpus(self):
        polys = admin_polygons(96)
        payload = [(int(r.admin_id), [list(ring) for ring in r.rings]) for r in polys.itertuples()]
        pages = synth.webpages_pandas(400)
        pts = pages.dropna(subset=["true_lat"])
        lons = pts["true_lon"].to_numpy()
        lats = pts["true_lat"].to_numpy()
        got = match_points(lons, lats, payload)
        for i in range(len(lons)):
            want = -1
            for r in polys.itertuples():
                if _brute_inside(lons[i], lats[i], r.rings):
                    want = r.admin_id
                    break
            assert got[i] == want


class TestHaversine:
    def test_known_distance(self):
        # London -> Paris ≈ 343.5 km
        d = haversine_m(51.5074, -0.1278, 48.8566, 2.3522)
        assert 342_000 < float(d) < 345_000

    def test_zero_and_antipode(self):
        assert float(haversine_m(10, 20, 10, 20)) == 0.0
        half = float(haversine_m(0, 0, 0, 180))
        assert abs(half - np.pi * 6_371_008.8) < 1.0


class TestKnnBound:
    def test_guaranteed_radius_monotone(self):
        assert guaranteed_radius_m(5, 3) > guaranteed_radius_m(5, 2) > 0
        assert guaranteed_radius_m(5, 1) >= 0


@pytest.mark.spark
class TestSparkStages:
    def test_pip_join(self, spark):
        from core_spark.operators.pip import pip_join

        polys = admin_polygons(96)
        payload = [(int(r.admin_id), [list(ring) for ring in r.rings]) for r in polys.itertuples()]
        pages = synth.webpages_pandas(300)
        pts = pages.dropna(subset=["true_lat"])[["doc_id", "true_lat", "true_lon"]]
        pts = pts.rename(columns={"true_lat": "lat", "true_lon": "lon"})
        sdf = spark.createDataFrame(pts)
        got = (
            pip_join(sdf, polys)
            .toPandas()
            .set_index("doc_id")["admin_id"]
            .sort_index()
        )
        want = match_points(
            pts["lon"].to_numpy(), pts["lat"].to_numpy(), payload
        )
        want_s = pd.Series(
            [None if w == -1 else w for w in want], index=pts["doc_id"].to_numpy()
        ).sort_index()
        assert len(got) == len(want_s)
        for d in got.index:
            g = got.loc[d]
            w = want_s.loc[d]
            assert (pd.isna(g) and pd.isna(w)) or g == w

    def test_knn_matches_bruteforce(self, spark):
        from core_spark.operators.knn import knn_join
        from core_spark.operators.tiles import assign_tiles

        pages = synth.webpages_pandas(500)
        docs_pd = (
            pages.dropna(subset=["true_lat"])[["doc_id", "true_lat", "true_lon"]]
            .rename(columns={"true_lat": "lat", "true_lon": "lon"})
        )
        queries_pd = pd.DataFrame(
            {
                "query_id": range(8),
                "qlat": [40.7, 35.6, -23.5, 0.0, 51.5, -33.8, 64.1, 1.3],
                "qlon": [-74.0, 139.7, -46.6, 10.0, -0.1, 151.2, -21.9, 103.8],
            }
        )
        docs = assign_tiles(spark.createDataFrame(docs_pd), resolutions=(0,))
        got = (
            knn_join(docs, spark.createDataFrame(queries_pd), k=3, res=0, ring=2)
            .toPandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        want = knn_bruteforce_pandas(docs_pd, queries_pd, k=3)
        # mega-center queries (0,1,2: dense doc clusters) must be provably
        # complete; every complete query must match brute force exactly
        complete_q = set(got[got["complete"]]["query_id"])
        assert {0, 1, 2} <= complete_q
        for qid in complete_q:
            g = got[got["query_id"] == qid]
            w = want[want["query_id"] == qid]
            assert g["doc_id"].tolist() == w["doc_id"].tolist()
            assert np.allclose(g["dist_m"], w["dist_m"], rtol=1e-9)


@pytest.mark.spark
class TestKnnAdaptive:
    def test_adaptive_completes_stragglers(self, spark):
        """Sparse-region queries that are incomplete at ring=2 get re-run at
        doubled rings until provably complete, and then match brute force."""
        from core_spark.operators.knn import knn_adaptive, knn_bruteforce_pandas
        from core_spark.operators.tiles import assign_tiles

        pages = synth.webpages_pandas(500)
        docs_pd = (
            pages.dropna(subset=["true_lat"])[["doc_id", "true_lat", "true_lon"]]
            .rename(columns={"true_lat": "lat", "true_lon": "lon"})
        )
        queries_pd = pd.DataFrame(
            {
                "query_id": range(6),
                "qlat": [40.7, 35.6, -23.5, 0.0, 64.1, -45.0],
                "qlon": [-74.0, 139.7, -46.6, 10.0, -21.9, -170.0],
            }
        )
        docs = assign_tiles(spark.createDataFrame(docs_pd), resolutions=(0,))
        got = (
            knn_adaptive(
                docs, spark.createDataFrame(queries_pd), k=3, res=0, ring=2,
                max_rounds=4,
            )
            .toPandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        want = knn_bruteforce_pandas(docs_pd, queries_pd, k=3)
        # every query that ended complete must match brute force exactly
        comp = got[got["complete"]]
        assert len(set(comp["query_id"])) >= 4  # adaptive resolved stragglers
        for qid in set(comp["query_id"]):
            g = got[got["query_id"] == qid]
            w = want[want["query_id"] == qid]
            assert g["doc_id"].tolist() == w["doc_id"].tolist()
        # no duplicate (query, rank) rows from the union
        assert not got.duplicated(subset=["query_id", "rank"]).any()

    def test_bruteforce_stage_gated_when_ring_pass_completes(self, spark):
        """When every query completes in the ring pass, the brute-force
        fallback must not be scheduled at all: the result plan carries no
        nested-loop/cartesian docs scan (at 10^12 docs an un-elided empty
        fallback is a full-table scan per kNN call)."""
        from core_spark.operators.knn import knn_adaptive
        from core_spark.operators.tiles import assign_tiles

        pages = synth.webpages_pandas(500)
        docs_pd = (
            pages.dropna(subset=["true_lat"])[["doc_id", "true_lat", "true_lon"]]
            .rename(columns={"true_lat": "lat", "true_lon": "lon"})
        )
        # mega-center queries only: dense clusters, complete at ring=2
        queries_pd = pd.DataFrame(
            {"query_id": [0, 1, 2],
             "qlat": [40.7, 35.6, -23.5], "qlon": [-74.0, 139.7, -46.6]}
        )
        docs = assign_tiles(spark.createDataFrame(docs_pd), resolutions=(0,))
        out = knn_adaptive(
            docs, spark.createDataFrame(queries_pd), k=3, res=0, ring=2,
            max_rounds=1, bruteforce=True,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert set(out.toPandas()["query_id"]) == {0, 1, 2}

    def test_no_bruteforce_keeps_flagged_incomplete_rows(self, spark):
        """bruteforce=False: queries still incomplete after max_rounds come
        back flagged complete=False instead of being dropped."""
        from core_spark.operators.knn import knn_adaptive
        from core_spark.operators.tiles import assign_tiles

        # 2 candidate docs near the query but k=3: the ring pass can never
        # prove completeness, so the rows MUST come back flagged False
        docs_pd = pd.DataFrame(
            {"doc_id": [1, 2], "lat": [0.5, 1.0], "lon": [0.5, 1.0]}
        )
        queries_pd = pd.DataFrame({"query_id": [0], "qlat": [0.0], "qlon": [0.0]})
        docs = assign_tiles(spark.createDataFrame(docs_pd), resolutions=(0,))
        got = knn_adaptive(
            docs, spark.createDataFrame(queries_pd), k=3, res=0, ring=2,
            max_rounds=1, bruteforce=False,
        ).toPandas()
        assert len(got) == 2
        assert not got["complete"].any()
        assert set(got["doc_id"]) == {1, 2}
