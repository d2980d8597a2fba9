"""DSIR importance reweighting (operators/dsir).

Python-model parity on both engines, strong target/raw separation on a
clearly bimodal corpus, neutral-bucket and feature-less-doc semantics,
and plan asserts (broadcast score join, no Python, no sort-merge).
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from core_spark.operators.dsir import (
    importance_weights,
    sql_importance_weights,
)
from core_spark.operators.sampling import SCALE

N_BUCKETS, RAW_RATE, SALT = 64, 0.5, ":dsirraw"

# Bimodal corpus: "good" docs share a wiki-ish vocabulary, "junk" docs a
# spam-ish one; is_target marks the good HALF of the good docs (so the
# other half must be recognized by features alone).
DOCS = (
    [(i, "the quick brown fox jumps over the lazy dog", 1) for i in range(8)]
    + [(i, "the quick brown fox jumps over the lazy dog", 0) for i in range(8, 16)]
    + [(i, "buy cheap pills now click here win big money", 0) for i in range(16, 32)]
    + [(32, "single", 0), (33, "", 0)]  # feature-less docs
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _feats(text: str) -> list[int]:
    toks = text.strip().split(" ")
    return [
        _h60(f"ds_{toks[i]} {toks[i + 1]}") % N_BUCKETS
        for i in range(len(toks) - 1)
    ]


def _model(docs):
    in_raw = lambda i: _h60(f"{i}{SALT}") % SCALE < int(RAW_RATE * SCALE)
    tgt: dict[int, int] = {}
    raw: dict[int, int] = {}
    for i, text, is_t in docs:
        for b in _feats(text):
            if is_t:
                tgt[b] = tgt.get(b, 0) + 1
            if in_raw(i):
                raw[b] = raw.get(b, 0) + 1
    seen = set(tgt) | set(raw)
    s = {
        b: (SCALE * (tgt.get(b, 0) + 1)) // (raw.get(b, 0) + 1) for b in seen
    }
    out = {}
    for i, text, _ in docs:
        fs = _feats(text)
        wsum = sum(s.get(b, SCALE) for b in fs)
        out[i] = (len(fs), wsum // max(len(fs), 1))
    return out


def _df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id bigint, text string, is_target int"
    )


def _spark_weights(spark):
    return {
        r["doc_id"]: (r["n_feat"], r["weight"])
        for r in importance_weights(
            _df(spark), "is_target = 1", n_buckets=N_BUCKETS,
            raw_rate=RAW_RATE,
        ).collect()
    }


@pytest.mark.spark
def test_matches_python_model(spark):
    assert _spark_weights(spark) == _model(DOCS)


@pytest.mark.spark
def test_duckdb_twin_matches(spark):
    values = ", ".join(
        f"({i}, '{t}', {f})" for i, t, f in DOCS
    )
    sql = sql_importance_weights(
        f"(SELECT * FROM (VALUES {values}) AS t(doc_id, text, is_target))",
        "is_target = 1",
        n_buckets=N_BUCKETS,
        raw_rate=RAW_RATE,
    )
    got_duck = {
        r[0]: (r[1], r[2]) for r in duckdb.connect().execute(sql).fetchall()
    }
    assert got_duck == _spark_weights(spark)


@pytest.mark.spark
def test_target_separation_and_generalization(spark):
    w = _spark_weights(spark)
    # labeled target docs score high; UNLABELED good docs (8..15) score
    # identically — the features generalize past the label
    assert w[0] == w[12]
    # every good doc beats every junk doc, by a wide margin (the
    # absolute level depends on the target/raw size ratio — only the
    # ORDERING is the selection contract)
    good = [w[i][1] for i in range(16)]
    junk = [w[i][1] for i in range(16, 32)]
    assert min(good) > 5 * max(junk)


def test_featureless_docs_get_zero_weight():
    m = _model(DOCS)
    assert m[32] == (0, 0) and m[33] == (0, 0)


@pytest.mark.spark
def test_plan_broadcast_no_python_no_smj(spark):
    plan = (
        importance_weights(_df(spark), "is_target = 1", n_buckets=N_BUCKETS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # the HOT-PATH join (every doc occurrence x score table) is broadcast
    assert "BroadcastHashJoin" in plan
    # the only sort-merge join is the FullOuter merge of the two BOUNDED
    # models (<= n_buckets rows each) — never a corpus-sized SMJ
    assert plan.count("SortMergeJoin") == 1
    assert "FullOuter" in plan
