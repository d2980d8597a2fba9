"""Skip-gram pairs: Python-model parity on both engines, mirror
symmetry, min_count prunes-not-recomputes, hygiene arms."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from core_spark.operators.skipgram import skipgram_pairs, sql_skipgram_pairs

DOCS = [
    "the quick brown fox jumps",
    "the quick dog",
    "quick quick quick",       # repeated token -> self-pairs
    "",                        # empty -> no tokens
    "one",                     # single token -> no pairs
    None,                      # NULL text
    "a  b",                    # double space -> empty token filtered
]


def model(docs, window, min_count):
    # forward pairs only (dist > 0), then mirror with negated dist:
    # the key spaces are disjoint, so the mirror never merges counts
    fw = Counter()
    for d in docs:
        tk = [t for t in (d or "").split(" ") if t != ""]
        for i in range(len(tk)):
            for j in range(i + 1, min(i + window, len(tk) - 1) + 1):
                fw[(tk[i], tk[j], j - i)] += 1
    full = dict(fw)
    for (c, x, d), v in fw.items():
        full[(x, c, -d)] = v
    return {k: v for k, v in full.items() if v >= min_count}


def test_model_hand_checks():
    m = model(DOCS, 2, 1)
    assert m[("the", "quick", 1)] == 2          # both "the quick" docs
    assert m[("quick", "the", -1)] == 2         # mirrored
    assert m[("the", "brown", 2)] == 1          # distance-2 skip
    assert m[("quick", "quick", 1)] == 2        # self-pairs counted
    assert ("the", "fox", 3) not in m           # beyond window


def _vals(docs):
    rows = ", ".join(
        "(" + ("NULL" if d is None else "'" + d + "'") + ")" for d in docs
    )
    return f"SELECT * FROM (VALUES {rows}) t(text)"


@pytest.mark.parametrize("window,min_count", [(1, 1), (2, 1), (2, 2), (3, 1)])
def test_duckdb_twin_matches_model(window, min_count):
    got = {
        (r[0], r[1], r[2]): r[3]
        for r in duckdb.sql(
            sql_skipgram_pairs(_vals(DOCS), window=window,
                               min_count=min_count)
        ).fetchall()
    }
    assert got == model(DOCS, window, min_count)


@pytest.mark.spark
@pytest.mark.parametrize("window,min_count", [(1, 1), (2, 1), (2, 2), (3, 1)])
def test_spark_matches_model(spark, window, min_count):
    df = spark.createDataFrame([(d,) for d in DOCS], "text string")
    got = {
        (r["center"], r["context"], r["dist"]): r["cnt"]
        for r in skipgram_pairs(df, window=window,
                                min_count=min_count).collect()
    }
    assert got == model(DOCS, window, min_count)


@pytest.mark.spark
def test_mirror_symmetry(spark):
    df = spark.createDataFrame([(d,) for d in DOCS], "text string")
    rows = {
        (r["center"], r["context"], r["dist"]): r["cnt"]
        for r in skipgram_pairs(df, window=2).collect()
    }
    assert rows
    for (c, x, d), v in rows.items():
        assert rows[(x, c, -d)] == v


@pytest.mark.spark
def test_min_count_prunes_not_recomputes(spark):
    df = spark.createDataFrame([(d,) for d in DOCS], "text string")
    all_rows = {
        (r["center"], r["context"], r["dist"]): r["cnt"]
        for r in skipgram_pairs(df, window=2, min_count=1).collect()
    }
    pruned = {
        (r["center"], r["context"], r["dist"]): r["cnt"]
        for r in skipgram_pairs(df, window=2, min_count=2).collect()
    }
    assert pruned == {k: v for k, v in all_rows.items() if v >= 2}


@pytest.mark.spark
def test_empty_input(spark):
    empty = spark.createDataFrame([], "text string")
    assert skipgram_pairs(empty).count() == 0


def test_rejects_bad_params():
    with pytest.raises(ValueError):
        skipgram_pairs(None, window=0)
    with pytest.raises(ValueError):
        sql_skipgram_pairs("SELECT 1", min_count=0)
