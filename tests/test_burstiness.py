"""Burstiness: Python-model parity on both engines, metronome/burst
regimes, duplicate-timestamp and degenerate arms, hygiene."""

from __future__ import annotations

import math

import duckdb
import pytest

from core_spark.operators.burstiness import burstiness, sql_burstiness


def model(rows):
    groups = {}
    for k, t in rows:
        if k is None or t is None:
            continue
        groups.setdefault(k, []).append(t)
    out = {}
    for k, ts in groups.items():
        ts.sort()
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        m = len(gaps)
        if m < 1:
            continue
        s = sum(gaps)
        q = sum(g * g for g in gaps)
        v = m * q - s * s
        mean = s / m
        sd = math.sqrt(float(v)) / m
        b = (
            (math.sqrt(float(v)) - s) / (math.sqrt(float(v)) + s)
            if m >= 2 and s != 0 else None
        )
        out[k] = (m, s, q, v, mean, sd, b)
    return out


ROWS = (
    [("metronome", 10 * i) for i in range(10)]       # B = -1 exactly
    + [("bursty", t) for t in (0, 1, 2, 3, 1000, 1001, 1002, 2000)]
    + [("dup", t) for t in (5, 5, 5, 9)]             # zero gaps kept
    + [("zerogap", 7), ("zerogap", 7), ("zerogap", 7)]  # S=0 -> NULL
    + [("pair", 0), ("pair", 50)]                    # 1 gap -> NULL B
    + [("solo", 3)]                                  # absent
    + [("h", None), (None, 4)]
)


def test_model_hand_checks():
    m = model(ROWS)
    assert m["metronome"][6] == -1.0            # sd 0 -> perfect rhythm
    assert m["bursty"][6] > 0.2                 # clumps + silences
    assert m["dup"][0] == 3 and m["dup"][1] == 4
    assert m["zerogap"][6] is None              # simultaneity degenerate
    assert m["pair"][6] is None and m["pair"][0] == 1
    assert "solo" not in m and "h" not in m


def _vals(rows):
    sql_rows = ", ".join(
        "(" + ", ".join(
            "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else str(v))
            for v in r) + ")"
        for r in rows
    )
    return f"SELECT * FROM (VALUES {sql_rows}) t(key, t)"


def test_duckdb_twin_matches_model():
    got = {
        r[0]: tuple(r[1:])
        for r in duckdb.sql(sql_burstiness(_vals(ROWS))).fetchall()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_spark_matches_model(spark):
    df = spark.createDataFrame(ROWS, "key string, t long")
    got = {
        r["key"]: (r["n_gaps"], r["gap_sum"], r["gap_sumsq"],
                   r["var_num"], r["mean_gap"], r["sd_gap"],
                   r["burstiness"])
        for r in burstiness(df).collect()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_engines_bit_identical(spark):
    rows = [(f"g{i % 5}", (i * i * 7) % 10000) for i in range(500)]
    df = spark.createDataFrame(rows, "key string, t long")
    srows = sorted(tuple(r) for r in burstiness(df).collect())
    orows = sorted(
        tuple(r)
        for r in duckdb.sql(sql_burstiness(_vals(rows))).fetchall()
    )
    assert srows == orows


@pytest.mark.spark
def test_empty(spark):
    empty = spark.createDataFrame([], "key string, t long")
    assert burstiness(empty).count() == 0
