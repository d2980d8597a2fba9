"""Confusion matrix: Python-model parity on both engines, hand-valued
metrics, sparse-cell absence, hygiene."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.confusion import (
    confusion_matrix,
    sql_confusion_matrix,
)


def model(rows):
    cells = {}
    for t, p in rows:
        if t is None or p is None:
            continue
        cells[(t, p)] = cells.get((t, p), 0) + 1
    tt, pt = {}, {}
    for (t, p), n in cells.items():
        tt[t] = tt.get(t, 0) + n
        pt[p] = pt.get(p, 0) + n
    return {
        (t, p): (n, tt[t], pt[p], 1 if t == p else 0,
                 n / tt[t], n / pt[p])
        for (t, p), n in cells.items()
    }


ROWS = (
    [("en", "en")] * 8 + [("en", "de")] * 2     # en recall 0.8
    + [("de", "de")] * 5 + [("de", "und")] * 5  # de recall 0.5
    + [("fr", "en")] * 2                        # never predicted right
    + [(None, "en"), ("en", None)]
)


def test_model_hand_checks():
    m = model(ROWS)
    assert m[("en", "en")] == (8, 10, 10, 1, 0.8, 0.8)
    assert m[("de", "de")][4] == 0.5
    # de->und confusion named explicitly
    assert m[("de", "und")] == (5, 10, 5, 0, 0.5, 1.0)
    assert ("fr", "fr") not in m                # sparse diagonal absent
    assert m[("fr", "en")][5] == 2 / 10         # fr eats en precision


def _vals(rows):
    sql_rows = ", ".join(
        "(" + ", ".join(
            "NULL" if v is None else f"'{v}'" for v in r) + ")"
        for r in rows
    )
    return f"SELECT * FROM (VALUES {sql_rows}) t(truth, pred)"


def test_duckdb_twin_matches_model():
    got = {
        (r[0], r[1]): tuple(r[2:])
        for r in duckdb.sql(sql_confusion_matrix(_vals(ROWS))).fetchall()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_spark_matches_model(spark):
    df = spark.createDataFrame(ROWS, "truth string, pred string")
    got = {
        (r["truth"], r["pred"]): (r["n"], r["truth_total"],
                                  r["pred_total"], r["is_diag"],
                                  r["recall_part"], r["precision_part"])
        for r in confusion_matrix(df).collect()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_engines_bit_identical_and_empty(spark):
    rows = [(f"c{i % 5}", f"c{(i * i) % 5}") for i in range(300)]
    df = spark.createDataFrame(rows, "truth string, pred string")
    srows = sorted(tuple(r) for r in confusion_matrix(df).collect())
    orows = sorted(
        tuple(r)
        for r in duckdb.sql(sql_confusion_matrix(_vals(rows))).fetchall()
    )
    assert srows == orows
    empty = spark.createDataFrame([], "truth string, pred string")
    assert confusion_matrix(empty).count() == 0
