"""Kaplan-Meier: Python-model parity on both engines, the textbook
censoring example, censored-at-event risk convention, fully-censored
absence, hygiene."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.survival import kaplan_meier, sql_kaplan_meier


def model(rows):
    groups = {}
    for k, t, e in rows:
        if k is None or t is None or e is None:
            continue
        groups.setdefault(k, []).append((t, 1 if e == 1 else 0))
    out = {}
    for k, subs in groups.items():
        times = sorted({t for t, e in subs if e})
        s = 1.0
        for t in times:
            n = sum(1 for tt, _ in subs if tt >= t)
            d = sum(1 for tt, e in subs if tt == t and e)
            c = sum(1 for tt, e in subs if tt == t and not e)
            s = s * (1.0 - float(d) / float(n))
            out[(k, t)] = (n, d, c, s)
    return out


# the classic 6-subject example: deaths at 1 (x2) and 4, censored at
# 2 and 5, plus one censored AT an event time (4) — at-risk inclusive
ROWS = [
    ("g", 1, 1), ("g", 1, 1), ("g", 2, 0), ("g", 4, 1),
    ("g", 4, 0), ("g", 5, 0),
    # allcens: no event -> absent
    ("allcens", 3, 0), ("allcens", 9, 0),
    ("h", None, 1), ("h", 1, None), (None, 1, 1),
]


def test_model_hand_checks():
    m = model(ROWS)
    # t=1: n=6, d=2 -> S = 2/3
    assert m[("g", 1)] == (6, 2, 0, 1.0 * (1.0 - 2.0 / 6.0))
    # t=4: at risk = {4,4,5} = 3 (censored-at-4 counts), d=1
    n, d, c, s = m[("g", 4)]
    assert (n, d, c) == (3, 1, 1)
    assert s == (1.0 - 2.0 / 6.0) * (1.0 - 1.0 / 3.0)
    assert not any(k == "allcens" for k, _ in m)


def _vals(rows):
    sql_rows = ", ".join(
        "(" + ", ".join(
            "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else str(v))
            for v in r) + ")"
        for r in rows
    )
    return f"SELECT * FROM (VALUES {sql_rows}) t(key, duration, event)"


def test_duckdb_twin_matches_model():
    got = {
        (r[0], r[1]): tuple(r[2:])
        for r in duckdb.sql(sql_kaplan_meier(_vals(ROWS))).fetchall()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_spark_matches_model(spark):
    df = spark.createDataFrame(
        ROWS, "key string, duration long, event long")
    got = {
        (r["key"], r["t"]): (r["n_risk"], r["d_events"],
                             r["c_censored"], r["survival"])
        for r in kaplan_meier(df).collect()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_engines_bit_identical(spark):
    rows = [
        (f"g{i % 3}", (i * 7) % 23 + 1, 1 if (i * 5) % 3 else 0)
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows, "key string, duration long, event long")
    srows = sorted(tuple(r) for r in kaplan_meier(df).collect())
    orows = sorted(
        tuple(r)
        for r in duckdb.sql(sql_kaplan_meier(_vals(rows))).fetchall()
    )
    assert srows == orows


@pytest.mark.spark
def test_monotone_and_empty(spark):
    rows = [("k", t % 9 + 1, 1) for t in range(50)]
    df = spark.createDataFrame(
        rows, "key string, duration long, event long")
    curve = sorted(
        (r["t"], r["survival"]) for r in kaplan_meier(df).collect())
    vals = [s for _, s in curve]
    assert all(a >= b for a, b in zip(vals, vals[1:]))   # non-increasing
    assert abs(vals[-1]) < 1e-12                         # all die
    empty = spark.createDataFrame(
        [], "key string, duration long, event long")
    assert kaplan_meier(empty).count() == 0
