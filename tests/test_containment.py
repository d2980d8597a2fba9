"""Containment join: Python-model parity, directionality, the quote
shape Jaccard misses, brute-force twin parity, plan shape."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from core_spark.operators.containment import (
    containment_pairs,
    sql_containment_pairs,
)

BASE = "the quick brown fox jumps over the lazy dog while rain falls on the old stone bridge near town"
DOCS = [
    (0, BASE),                                   # container
    (1, " ".join(BASE.split()[:8])),             # prefix slice -> in 0
    (2, " ".join(BASE.split()[5:14])),           # mid slice -> in 0
    (3, "completely different words about spark shuffles and parquet row groups"),
    (4, " ".join(BASE.split()[:8])),             # duplicate of 1: mutual 1.0
    (5, "xy"),                                   # sub-k doc: one whole-text shingle
]
K, T = 3, 0.8


def _shingles(text, k=K):
    toks = text.split()
    if len(toks) < k:
        grams = {text}
    else:
        grams = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    return {
        int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams
    }


def _model(docs, k=K, t=T):
    sets = {i: _shingles(x, k) for i, x in docs}
    out = set()
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a == b or not sa:
                continue
            inter = len(sa & sb)
            if inter >= t * len(sa):
                out.add((a, b, inter, len(sa), inter / len(sa)))
    return out


@pytest.mark.spark
class TestContainment:
    def _spark(self, spark, docs=DOCS):
        df = spark.createDataFrame(docs, "doc_id long, text string")
        return {
            tuple(r)
            for r in containment_pairs(df, k=K, threshold=T).collect()
        }

    def test_matches_python_model(self, spark):
        got = self._spark(spark)
        assert got == _model(DOCS)

    def test_quote_shape_and_direction(self, spark):
        pairs = {(a, b) for a, b, *_ in self._spark(spark)}
        assert (1, 0) in pairs and (2, 0) in pairs  # slices contained in base
        assert (0, 1) not in pairs and (0, 2) not in pairs  # not symmetric
        assert (1, 4) in pairs and (4, 1) in pairs  # exact dup: mutual
        assert not any(3 in p for p in pairs)       # unrelated doc clean

    def test_jaccard_would_miss_it(self):
        """The motivating asymmetry: pair (1,0) has high containment but
        Jaccard far below the threshold."""
        sa, sb = _shingles(DOCS[1][1]), _shingles(DOCS[0][1])
        jac = len(sa & sb) / len(sa | sb)
        cont = len(sa & sb) / len(sa)
        assert cont >= T and jac < 0.5

    def test_duckdb_twin_matches_model(self):
        con = duckdb.connect()
        vals = ", ".join(f"({i}, '{t}')" for i, t in DOCS)
        con.execute(f"CREATE TABLE d AS SELECT * FROM (VALUES {vals}) _(doc_id, text)")
        got = {
            tuple(r)
            for r in con.execute(
                sql_containment_pairs("d", k=K, threshold=T)
            ).fetchall()
        }
        assert got == _model(DOCS)

    def test_threshold_monotone(self, spark):
        low = {(a, b) for a, b, *_ in self._spark(spark)}
        df_pairs = {
            (r[0], r[1])
            for r in containment_pairs(
                spark.createDataFrame(DOCS, "doc_id long, text string"),
                k=K,
                threshold=0.99,
            ).collect()
        }
        assert df_pairs <= low  # tighter threshold emits a subset

    def test_plan_no_cartesian_no_python(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        plan = (
            containment_pairs(df, k=K, threshold=T)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
