"""Exact group quantiles vs a Python model (integer-rank definition)."""

from __future__ import annotations

import math

import pytest

from core_spark.operators.quantiles import DEFAULT_PS, exact_group_quantiles

ROWS = [
    (i, "a" if i % 3 else "b", (i * 17) % 101) for i in range(60)
] + [(100, "solo", 42)]  # single-row group: every quantile = that row


def _model():
    groups = {}
    for key, g, v in ROWS:
        groups.setdefault(g, []).append((v, key))
    out = {}
    for g, vals in groups.items():
        vals.sort()
        n = len(vals)
        for label, (num, den) in DEFAULT_PS.items():
            rank = math.ceil(n * num / den)
            out[(g, label)] = vals[rank - 1][0]
    return out


@pytest.mark.spark
def test_quantiles_vs_model(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, lang string, v long")
    got = {
        (r["lang"], r["q"]): r["value"]
        for r in exact_group_quantiles(df, "lang", "v").collect()
    }
    assert got == _model()


@pytest.mark.spark
def test_quantiles_single_row_group(spark):
    df = spark.createDataFrame([(1, "g", 7)], "doc_id long, lang string, v long")
    got = {
        r["q"]: r["value"]
        for r in exact_group_quantiles(df, "lang", "v").collect()
    }
    assert got == {"p50": 7, "p90": 7, "p99": 7}


@pytest.mark.spark
def test_quantiles_duckdb_twin(spark):
    import duckdb

    from core_spark.operators.quantiles import sql_exact_group_quantiles

    con = duckdb.connect()
    values = ", ".join(f"({k}, '{g}', {v})" for k, g, v in ROWS)
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            sql_exact_group_quantiles(
                f"SELECT * FROM (VALUES {values}) AS t(doc_id, lang, v)",
                "lang",
                "v",
            )
        ).fetchall()
    }
    assert got == _model()
