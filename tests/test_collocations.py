"""PMI collocations: Python-model parity both engines, lift ordering,
min_count prunes-not-recomputes, hygiene arms."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from core_spark.operators.collocations import (
    pmi_collocations,
    sql_pmi_collocations,
)

# "strong tea" is the Church-Hanks classroom pair: frequent together,
# each word otherwise promiscuous enough to depress the baseline
DOCS = [
    "strong tea is strong",
    "strong tea and weak coffee",
    "weak tea is rare but strong coffee is not",
    "the the the",            # repeated token -> self-bigram
    "",                       # empty -> no tokens
    "one",                    # single token -> no bigrams
    None,                     # NULL text
    "a  b",                   # double space -> empty token filtered
]


def model(docs, min_count):
    uni = Counter()
    big = Counter()
    for d in docs:
        tk = [t for t in (d or "").split(" ") if t != ""]
        uni.update(tk)
        big.update(zip(tk, tk[1:]))
    n = sum(uni.values())
    return {
        (x, y): (c, uni[x], uni[y], n, (c * 1.0 * n) / (uni[x] * 1.0 * uni[y]))
        for (x, y), c in big.items()
        if c >= min_count
    }


def test_model_hand_checks():
    m = model(DOCS, 1)
    assert m[("strong", "tea")][0] == 2
    assert m[("the", "the")][0] == 2
    # collocation beats a promiscuous pair on lift
    assert m[("strong", "tea")][4] > m[("is", "strong")][4]
    n = m[("strong", "tea")][3]
    assert all(v[3] == n for v in m.values())


def _vals(docs):
    rows = ", ".join(
        "(" + ("NULL" if d is None else "'" + d + "'") + ")" for d in docs
    )
    return f"SELECT * FROM (VALUES {rows}) t(text)"


@pytest.mark.parametrize("min_count", [1, 2])
def test_duckdb_twin_matches_model(min_count):
    got = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5], r[6])
        for r in duckdb.sql(
            sql_pmi_collocations(_vals(DOCS), min_count=min_count)
        ).fetchall()
    }
    assert got == model(DOCS, min_count)


@pytest.mark.spark
@pytest.mark.parametrize("min_count", [1, 2])
def test_spark_matches_model(spark, min_count):
    df = spark.createDataFrame([(d,) for d in DOCS], "text string")
    got = {
        (r["w1"], r["w2"]):
        (r["c_xy"], r["c_x"], r["c_y"], r["n_tokens"], r["lift"])
        for r in pmi_collocations(df, min_count=min_count).collect()
    }
    assert got == model(DOCS, min_count)


@pytest.mark.spark
def test_min_count_prunes_not_recomputes(spark):
    # pruned output must keep FULL-distribution unigram counts and N:
    # the surviving rows at min_count=2 equal the min_count=1 rows
    # filtered on c_xy, bit for bit
    df = spark.createDataFrame([(d,) for d in DOCS], "text string")
    all_rows = {
        (r["w1"], r["w2"]): r
        for r in pmi_collocations(df, min_count=1).collect()
    }
    pruned = pmi_collocations(df, min_count=2).collect()
    assert pruned and all(
        tuple(all_rows[(r["w1"], r["w2"])]) == tuple(r) for r in pruned
    )
    assert set(
        (k for k, r in all_rows.items() if r["c_xy"] >= 2)
    ) == {(r["w1"], r["w2"]) for r in pruned}


@pytest.mark.spark
def test_empty_input(spark):
    empty = spark.createDataFrame([], "text string")
    assert pmi_collocations(empty).count() == 0


def test_rejects_bad_params():
    with pytest.raises(ValueError):
        pmi_collocations(None, min_count=0)
    with pytest.raises(ValueError):
        sql_pmi_collocations("SELECT 1", min_count=0)
