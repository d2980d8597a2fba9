"""TV drift: Python-model parity on both engines, identical/disjoint
regimes, one-sided buckets, scale invariance, hygiene."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.drift import sql_tv_distance, tv_distance


def model(rows):
    ha, hb = {}, {}
    for ia, b in rows:
        if ia is None or b is None:
            continue
        (ha if ia else hb)[b] = (ha if ia else hb).get(b, 0) + 1
    n_a, n_b = sum(ha.values()), sum(hb.values())
    buckets = set(ha) | set(hb)
    num = sum(
        abs(ha.get(b, 0) * n_b - hb.get(b, 0) * n_a) for b in buckets)
    den = 2 * n_a * n_b
    tv = num / den if n_a and n_b else None
    return (n_a, n_b, len(buckets), num, den, tv)


def test_model_regimes():
    same = [(True, b % 3) for b in range(9)] + [
        (False, b % 3) for b in range(9)]
    assert model(same)[5] == 0.0
    disjoint = [(True, 1)] * 4 + [(False, 2)] * 6
    assert model(disjoint)[5] == 1.0
    shifted = [(True, 1)] * 5 + [(True, 2)] * 5 + [(False, 2)] * 10
    assert model(shifted)[5] == 0.5           # half the mass moved
    # scale invariance: doubling one slice leaves TV unchanged
    assert model(shifted * 2)[5] == 0.5
    empty_b = [(True, 1)] * 3
    assert model(empty_b)[5] is None


def _vals(rows):
    sql_rows = ", ".join(
        "(" + ", ".join(
            "NULL" if v is None else str(v).upper() if isinstance(v, bool)
            else str(v) for v in r) + ")"
        for r in rows
    )
    return f"SELECT * FROM (VALUES {sql_rows}) t(is_a, bucket)"


ROWS = (
    [(True, 1)] * 6 + [(True, 2)] * 3 + [(True, 9)]   # 9 only in A
    + [(False, 1)] * 2 + [(False, 2)] * 7 + [(False, 5)]
    + [(None, 1), (True, None)]
)


def test_duckdb_twin_matches_model():
    got = duckdb.sql(sql_tv_distance(_vals(ROWS))).fetchall()[0]
    assert tuple(got) == model(ROWS)


@pytest.mark.spark
def test_spark_matches_model(spark):
    df = spark.createDataFrame(ROWS, "is_a boolean, bucket long")
    assert tuple(tv_distance(df).collect()[0]) == model(ROWS)


@pytest.mark.spark
def test_engines_bit_identical_and_empty(spark):
    rows = [(i % 3 == 0, (i * i) % 13) for i in range(400)]
    df = spark.createDataFrame(rows, "is_a boolean, bucket long")
    srow = tuple(tv_distance(df).collect()[0])
    orow = tuple(duckdb.sql(sql_tv_distance(_vals(rows))).fetchall()[0])
    assert srow == orow
    empty = spark.createDataFrame([], "is_a boolean, bucket long")
    assert tuple(tv_distance(empty).collect()[0]) == (
        0, 0, 0, 0, 0, None)
