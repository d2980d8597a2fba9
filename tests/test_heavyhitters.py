"""Exact frequent items vs a Python model + the DuckDB twin, plus the
completeness guarantee under adversarial batching."""

from __future__ import annotations

from collections import Counter

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from core_spark.operators.heavyhitters import (
    frequent_items,
    sql_frequent_items,
)


def model(items, num, den):
    n = len(items)
    c = Counter(i for i in items if i is not None)
    return {k: v for k, v in c.items() if v * den >= num * n}


def _zipfish(n=4000):
    """Deterministic Zipf-ish stream: item_j appears ~n/2^(j+1) times,
    plus a long tail of singletons."""
    items = []
    for j, m in enumerate([n // 2, n // 4, n // 8, n // 16]):
        items += [f"hh{j}"] * m
    items += [f"tail{i}" for i in range(n - len(items))]
    # deterministic interleave so heavy items spread across batches
    items.sort(key=lambda s: hash(s) % 997)
    return items


@pytest.mark.spark
@pytest.mark.parametrize("num, den", [(1, 10), (1, 64)])
def test_matches_model_and_duckdb(spark, num, den):
    items = _zipfish()
    df = spark.createDataFrame([(i,) for i in items], "item string")
    got = {r["item"]: r["cnt"] for r in frequent_items(df, "item", num, den).collect()}
    assert got == model(items, num, den)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"item": pd.Series(items, dtype="string")}))
    oracle = dict(
        con.execute(sql_frequent_items("SELECT * FROM t", "item", num, den)).fetchall()
    )
    assert got == oracle
    assert len(got) >= 2  # the fixture actually has heavy hitters


@pytest.mark.spark
def test_complete_under_adversarial_partitioning(spark):
    """The pigeonhole guarantee is partitioning-independent: repartition
    the stream many ways; the result never loses a heavy hitter."""
    items = _zipfish(2000)
    want = model(items, 1, 16)
    base = spark.createDataFrame([(i,) for i in items], "item string")
    for parts in (1, 7, 32):
        df = base.repartition(parts)
        got = {
            r["item"]: r["cnt"]
            for r in frequent_items(df, "item", 1, 16).collect()
        }
        assert got == want


@pytest.mark.spark
def test_nulls_count_toward_total_never_emitted(spark):
    rows = [("a",)] * 50 + [(None,)] * 50
    df = spark.createDataFrame(rows, "item string")
    # a is 50/100 = 0.5 >= 0.4 WITH nulls in N — nulls dilute, never win
    got = {r["item"]: r["cnt"] for r in frequent_items(df, "item", 2, 5).collect()}
    assert got == {"a": 50}
    got = frequent_items(df, "item", 3, 5).collect()  # 0.6 > 0.5
    assert got == []


@pytest.mark.spark
def test_bad_threshold_rejected(spark):
    df = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError):
        frequent_items(df, "item", 5, 5)


@pytest.mark.spark
def test_recount_shuffle_is_candidate_bounded(spark):
    """Plan shape: the exact pass groups on candidate-or-NULL, so the
    aggregate's key space is bounded by the summary, never the item
    cardinality; the candidate join is a broadcast."""
    from core_spark.operators.heavyhitters import bucketed_counts

    items = _zipfish(1000)
    df = spark.createDataFrame([(i,) for i in items], "item string")
    # the candidate join lives in the pre-pin stage (frequent_items
    # pins its output, truncating lineage in the final plan)
    plan = (
        bucketed_counts(df, "item", 1, 16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    final = (
        frequent_items(df, "item", 1, 16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in final


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.sampled_from(["a", "b", "c", "d", "e", "f"]), max_size=60),
    st.sampled_from([(1, 4), (1, 8), (2, 5)]),
)
def test_duckdb_twin_matches_model_fuzz(items, nd):
    num, den = nd
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"item": pd.Series(items, dtype="string")}))
    got = dict(
        con.execute(
            sql_frequent_items("SELECT * FROM t", "item", num, den)
        ).fetchall()
    )
    assert got == model(items, num, den)
