"""Count-Min sketch: model parity, overestimate bound, mergeability, twins."""

from __future__ import annotations

import hashlib
from collections import Counter

import duckdb
import pytest

from core_spark.operators.cmsketch import (
    cms_counters,
    cms_estimate,
    merge_cms,
    sql_cms_counters,
    sql_cms_estimate,
)

D, W = 3, 64


def _cell(key: str, r: int, w: int = W) -> int:
    h = hashlib.md5(f"{key}:cms{r}".encode()).hexdigest()[:15]
    return int(h, 16) % w


def model_counters(keys, d: int = D, w: int = W) -> dict:
    cells = Counter()
    for k in keys:
        for r in range(d):
            cells[(r, _cell(k, r, w))] += 1
    return dict(cells)


def model_estimate(counters: dict, item: str, d: int = D, w: int = W) -> int:
    return min(counters.get((r, _cell(item, r, w)), 0) for r in range(d))


KEYS = [f"k{i % 17}" for i in range(400)] + ["rare"] * 3


def _values_sql(keys):
    vals = ", ".join(f"({k!r})" for k in keys)
    return f"SELECT * FROM (VALUES {vals}) v(k)"


def test_duckdb_counters_match_model():
    got = {
        (r, c): n
        for r, c, n in duckdb.sql(
            sql_cms_counters(_values_sql(KEYS), "k", d=D, w=W)
        ).fetchall()
    }
    assert got == model_counters(KEYS)


def test_duckdb_estimate_matches_model_and_overestimates():
    counters_sql = sql_cms_counters(_values_sql(KEYS), "k", d=D, w=W)
    probes = ["k0", "k5", "rare", "absent"]
    est = dict(
        duckdb.sql(
            sql_cms_estimate(
                counters_sql, _values_sql(probes).replace("v(k)", "v(item)"),
                d=D, w=W,
            )
        ).fetchall()
    )
    model = model_counters(KEYS)
    true = Counter(KEYS)
    for p in probes:
        assert est[p] == model_estimate(model, p)
        assert est[p] >= true[p]  # the CMS one-sided guarantee


def test_overestimate_only_under_forced_collisions():
    """w=4 forces heavy collisions: estimates may exceed truth but NEVER
    undercount — the direction is the guarantee."""
    model = model_counters(KEYS, d=2, w=4)
    true = Counter(KEYS)
    for item in set(KEYS):
        assert model_estimate(model, item, d=2, w=4) >= true[item]


def test_rejects_bad_params():
    with pytest.raises(ValueError):
        sql_cms_counters("SELECT 1 AS k", "k", d=0, w=16)


@pytest.mark.spark
def test_spark_counters_and_estimates_match_model(spark):
    df = spark.createDataFrame([(k,) for k in KEYS], ["k"])
    got = {
        (r["r"], r["c"]): r["cnt"]
        for r in cms_counters(df, "k", d=D, w=W).collect()
    }
    assert got == model_counters(KEYS)
    probes = spark.createDataFrame(
        [("k0",), ("k5",), ("rare",), ("absent",)], ["item"]
    )
    est = {
        r["item"]: r["cms_est"]
        for r in cms_estimate(
            cms_counters(df, "k", d=D, w=W), probes, d=D, w=W
        ).collect()
    }
    model = model_counters(KEYS)
    assert est == {
        p: model_estimate(model, p) for p in ("k0", "k5", "rare", "absent")
    }


@pytest.mark.spark
def test_null_keys_dropped_on_ingest(spark):
    """NULL keys hash to NULL cells — phantom state no probe reaches;
    both engines drop them on ingest."""
    df = spark.createDataFrame([("a",), (None,), ("a",)], "k string")
    got = {
        (r["r"], r["c"]): r["cnt"]
        for r in cms_counters(df, "k", d=2, w=8).collect()
    }
    assert got == model_counters(["a", "a"], d=2, w=8)
    duck = {
        (r, c): n
        for r, c, n in duckdb.sql(
            sql_cms_counters(
                "SELECT * FROM (VALUES ('a'), (NULL), ('a')) v(k)",
                "k", d=2, w=8,
            )
        ).fetchall()
    }
    assert duck == got


@pytest.mark.spark
def test_partition_invariance_and_shard_merge(spark):
    """State identical under ANY partitioning; sketch(A∪B) == merge of
    shard sketches — the mergeability contract."""
    df = spark.createDataFrame([(k,) for k in KEYS], ["k"])
    base = {
        (r["r"], r["c"]): r["cnt"]
        for r in cms_counters(df, "k", d=D, w=W).collect()
    }
    for parts in (1, 7, 32):
        got = {
            (r["r"], r["c"]): r["cnt"]
            for r in cms_counters(df.repartition(parts), "k", d=D, w=W).collect()
        }
        assert got == base
    half_a = spark.createDataFrame([(k,) for k in KEYS[:200]], ["k"])
    half_b = spark.createDataFrame([(k,) for k in KEYS[200:]], ["k"])
    merged = {
        (r["r"], r["c"]): r["cnt"]
        for r in merge_cms(
            cms_counters(half_a, "k", d=D, w=W),
            cms_counters(half_b, "k", d=D, w=W),
        ).collect()
    }
    assert merged == base
