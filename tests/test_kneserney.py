"""Kneser-Ney stats: Python-model parity both engines, KN identities."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb
import pytest

from core_spark.operators.kneserney import kn_ngram_stats, sql_kn_ngram_stats

# the Chen-Goodman classroom corpus shape: "san francisco" frequent but
# always after the same predecessor -> low continuation count
DOCS = [
    "i live in san francisco",
    "we live in san francisco",
    "they moved to san francisco",
    "i live in boston",
    "in san francisco it rains",
    "",                      # empty -> no grams
    "two words",             # shorter than n=3 -> no grams
    None,                    # NULL text
    "a  a b",                # double space -> empty token filtered
]


def model(docs, n, min_count):
    grams = []
    for d in docs:
        tk = [t for t in (d or "").split(" ") if t != ""]
        for i in range(len(tk) - n + 1):
            grams.append(tuple(tk[i:i + n]))
    c = Counter(grams)
    hist_c = Counter()
    hist_set = defaultdict(set)
    cont_set = defaultdict(set)
    for g, k in c.items():
        hist_c[g[:-1]] += k
        hist_set[g[:-1]].add(g[-1])
        cont_set[g[1:]].add(g[0])
    return {
        g: (k, hist_c[g[:-1]], len(hist_set[g[:-1]]), len(cont_set[g[1:]]))
        for g, k in c.items() if k >= min_count
    }


def test_model_hand_checks():
    m = model(DOCS, 3, 1)
    # "live in san" occurs twice; history "live in" has mass 3 and
    # 2 continuation types (san, boston); suffix "in san" is only ever
    # preceded by "live" -> cont_types 1
    assert m[("live", "in", "san")] == (2, 3, 2, 1)
    # suffix "in san francisco" has predecessors {live, moved... }:
    # "live in san"/"we live in"... predecessors of (san, francisco)
    # at trigram level: w1 in {in} x2, {to}, {i?}... check one:
    assert m[("in", "san", "francisco")][0] == 3
    # bigram level: "san francisco" frequent, continuation count of
    # suffix ("francisco",) = distinct predecessors = 1 (always "san")
    m2 = model(DOCS, 2, 1)
    assert m2[("san", "francisco")][0] == 4
    assert m2[("san", "francisco")][3] == 1  # the KN insight


def test_identities():
    # sum of c over a history == hist_c; hist_types == #rows of history
    m = model(DOCS, 3, 1)
    per_hist = defaultdict(lambda: [0, 0])
    for g, (k, hc, ht, _) in m.items():
        per_hist[g[:-1]][0] += k
        per_hist[g[:-1]][1] += 1
    for g, (k, hc, ht, _) in m.items():
        assert per_hist[g[:-1]] == [hc, ht]


def _vals(docs):
    rows = ", ".join(
        "(" + ("NULL" if d is None else "'" + d.replace("'", "''") + "'")
        + ")" for d in docs
    )
    return f"SELECT * FROM (VALUES {rows}) t(text)"


@pytest.mark.parametrize("n,min_count", [(2, 1), (3, 1), (3, 2), (4, 1)])
def test_duckdb_twin_matches_model(n, min_count):
    got = {
        tuple(r[:n]): tuple(r[n:])
        for r in duckdb.sql(
            sql_kn_ngram_stats(_vals(DOCS), n, min_count=min_count)
        ).fetchall()
    }
    assert got == model(DOCS, n, min_count)


@pytest.mark.spark
@pytest.mark.parametrize("n,min_count", [(3, 1), (2, 1), (3, 2)])
def test_spark_matches_model(spark, n, min_count):
    df = spark.createDataFrame([(d,) for d in DOCS], "text string")
    ws = [f"w{i + 1}" for i in range(n)]
    got = {
        tuple(r[w] for w in ws):
        (r["c"], r["hist_c"], r["hist_types"], r["cont_types"])
        for r in kn_ngram_stats(df, n, min_count=min_count).collect()
    }
    assert got == model(DOCS, n, min_count)


@pytest.mark.spark
def test_all_short_docs_empty(spark):
    df = spark.createDataFrame([("a b",), ("", ), (None,)], "text string")
    assert kn_ngram_stats(df, 3).count() == 0


def test_rejects_bad_params():
    with pytest.raises(ValueError):
        kn_ngram_stats(None, 1)
    with pytest.raises(ValueError):
        kn_ngram_stats(None, 7)
    with pytest.raises(ValueError):
        kn_ngram_stats(None, 3, min_count=0)
