"""Char-trigram LM fluency scoring vs a full Python model + the DuckDB
twin, plus the behaviors that make it a usable quality filter."""

from __future__ import annotations

import hashlib
from collections import Counter

import duckdb
import pandas as pd
import pytest

from core_spark.operators.lmscore import (
    OOV_PENALTY,
    fit_trigram_lm,
    score_docs,
    sql_trigram_fluency,
    trigram_fluency,
)
from core_spark.operators.sampling import SCALE

FLUENT = "the quick brown fox jumps over the lazy dog and then some more "
WORDS = ["alpha", "beta", "gamma", "delta", "omega", "sigma", "theta"]


def _corpus():
    rows = []
    for i in range(40):
        text = " ".join(WORDS[(i + j) % len(WORDS)] for j in range(30))
        rows.append((i, text))
    # 104 fails the md5 fit gate at rate 0.25 (pinned below), so its
    # trigrams can never leak into the model
    rows.append((104, "zxqj vwkp qqzz xjvw zzxq"))  # gibberish
    rows.append((101, ""))  # no trigrams
    rows.append((102, None))  # NULL text
    rows.append((103, "ab"))  # too short
    return rows


# ---------------------------------------------------------------------------
# Python model (same gate, same trigram definition, same integer math)
# ---------------------------------------------------------------------------


def _gate(doc_id, salt, rate) -> bool:
    h = hashlib.md5((str(doc_id) + salt).encode()).hexdigest()[:15]
    return int(h, 16) % SCALE < int(round(rate * SCALE))


def _tris(text):
    if text is None or len(text) < 3:
        return []
    return [text[i : i + 3] for i in range(len(text) - 2)]


def _model(rows, fit_rate=0.25, vocab_size=2048, salt=":lmfit"):
    counts = Counter()
    for i, t in rows:
        if _gate(i, salt, fit_rate):
            counts.update(_tris(t))
    vocab = dict(
        sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    )
    out = {}
    for i, t in rows:
        tris = _tris(t)
        n_oov = sum(1 for g in tris if g not in vocab)
        rarity = sum(
            SCALE // vocab[g] if g in vocab else OOV_PENALTY for g in tris
        )
        out[i] = (
            len(tris),
            n_oov,
            rarity,
            rarity // max(len(tris), 1),
        )
    return out


def _collect(df):
    return {
        r["doc_id"]: (r["n_tri"], r["n_oov"], r["rarity_sum"], r["score"])
        for r in df.collect()
    }


@pytest.mark.spark
@pytest.mark.parametrize("vocab_size", [2048, 24])
def test_fluency_matches_python_model(spark, vocab_size):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _collect(trigram_fluency(df, vocab_size=vocab_size))
    assert got == _model(rows, vocab_size=vocab_size)


@pytest.mark.parametrize("vocab_size", [2048, 24])
def test_duckdb_twin_matches_python_model(vocab_size):
    rows = _corpus()
    con = duckdb.connect()
    con.register(
        "docs",
        pd.DataFrame(
            {
                "doc_id": [i for i, _ in rows],
                "text": pd.Series([t for _, t in rows], dtype="string"),
            }
        ),
    )
    got = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            sql_trigram_fluency("docs", vocab_size=vocab_size)
        ).fetchall()
    }
    assert got == _model(rows, vocab_size=vocab_size)


@pytest.mark.spark
def test_gibberish_scores_above_fluent(spark):
    """The reason the filter exists: a gibberish doc (trigrams the fit
    set never saw) scores strictly higher (rarer) than every in-pattern
    doc."""
    rows = _corpus()
    assert not _gate(104, ":lmfit", 0.25)  # pinned: outside the fit set
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _collect(trigram_fluency(df))
    fluent_scores = [got[i][3] for i in range(40) if i in got]
    assert got[104][3] > max(fluent_scores)
    assert got[104][1] == got[104][0] > 0  # all its trigrams are OOV
    assert got[104][3] == OOV_PENALTY  # mean rarity = the max penalty


@pytest.mark.spark
def test_trigramless_docs_survive_with_zeros(spark):
    df = spark.createDataFrame(_corpus(), "doc_id long, text string")
    got = _collect(trigram_fluency(df))
    for i in (101, 102, 103):
        assert got[i] == (0, 0, 0, 0)


@pytest.mark.spark
def test_fit_is_deterministic_and_bounded(spark):
    df = spark.createDataFrame(_corpus(), "doc_id long, text string")
    m1 = fit_trigram_lm(df, vocab_size=24).collect()
    m2 = fit_trigram_lm(df, vocab_size=24).collect()
    assert m1 == m2 and len(m1) == 24
    cnts = [r["cnt"] for r in m1]
    assert cnts == sorted(cnts, reverse=True)


@pytest.mark.spark
def test_score_plan_broadcasts_model(spark):
    df = spark.createDataFrame(_corpus(), "doc_id long, text string")
    model = fit_trigram_lm(df)
    plan = (
        score_docs(df, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan
    assert "EvalPython" not in plan  # pure JVM end to end
