"""FastSS fuzzy join: completeness, exactness, engine divergence pins."""

from __future__ import annotations

import itertools

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from core_spark.operators.fuzzyjoin import (
    deletion_variants_expr,
    fuzzy_pairs,
    sql_fuzzy_pairs,
)


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _model(rows, d):
    out = {}
    for (ia, sa), (ib, sb) in itertools.combinations(rows, 2):
        if sa is None or sb is None:
            continue
        lo, hi = min(ia, ib), max(ia, ib)
        dist = _lev(sa, sb)
        if dist <= d:
            out[(lo, hi)] = dist
    return out


def _run(spark, rows, d):
    df = spark.createDataFrame(rows, "id long, s string")
    return {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_pairs(df, "id", "s", max_dist=d).collect()
    }


def test_delete_sub_insert_all_found_at_d1(spark):
    rows = [
        (0, "crawl report 7"),
        (1, "crawl reprt 7"),    # deletion
        (2, "crawl rexort 7"),   # substitution
        (3, "crawl reeport 7"),  # insertion
        (4, "something else"),
        (5, "crawl report 7"),   # exact dup of 0
    ]
    got = _run(spark, rows, 1)
    assert got == {(0, 1): 1, (0, 2): 1, (0, 3): 1, (0, 5): 0,
                   (1, 5): 1, (2, 5): 1, (3, 5): 1}


def test_transposition_is_candidate_but_rejected_at_d1(spark):
    """'ab'/'ba' SHARE deletion variants ({a,b}) yet sit at edit
    distance 2 — the verify step, not the blocking, decides."""
    got = _run(spark, [(0, "ab"), (1, "ba")], 1)
    assert got == {}
    got2 = _run(spark, [(0, "ab"), (1, "ba")], 2)
    assert got2 == {(0, 1): 2}


def test_d2_catches_two_edits_excludes_three(spark):
    rows = [(0, "abcdefgh"), (1, "abXdefh"), (2, "Xbcdefgh"),
            (3, "aXcYeZgh")]
    got = _run(spark, rows, 2)
    assert got == _model(rows, 2)
    assert (0, 1) in got and got[(0, 1)] == 2     # sub + delete
    assert (0, 3) not in got                      # three subs


def test_d2_model_sanity():
    assert _lev("abcdefgh", "abXdefh") == 2
    assert _lev("abcdefgh", "aXcYeZgh") == 3


def test_null_and_empty_hygiene(spark):
    rows = [(0, None), (None, "abc"), (1, ""), (2, "a"), (3, "abc")]
    got = _run(spark, rows, 1)
    assert got == {(1, 2): 1}


def test_model_parity_dense_corpus(spark):
    words = ["tree", "trees", "tee", "free", "trek", "reet",
             "banana", "bananna", "banan", "bnana", "canana",
             "", "a", "b", "ab"]
    rows = list(enumerate(words))
    for d in (1, 2):
        assert _run(spark, rows, d) == _model(rows, d)


def test_duckdb_twin_parity():
    words = ["tree", "trees", "tee", "free", "banana", "bananna", "ab",
             "ba", ""]
    vals = ", ".join(f"({i}, '{w}')" for i, w in enumerate(words))
    sql = sql_fuzzy_pairs(
        f"SELECT id, s FROM (VALUES {vals}) t(id, s)", 1
    )
    got = {
        (a, b): dist
        for a, b, dist in duckdb.connect().execute(sql).fetchall()
    }
    assert got == _model(list(enumerate(words)), 1)


def test_engine_levenshtein_divergence_on_non_ascii(spark):
    """Spark counts codepoints, DuckDB counts BYTES: 'café'→'cafe' is
    1 vs 2. Pinned so oracle fixtures stay ASCII on purpose."""
    s = spark.sql("SELECT levenshtein('café', 'cafe') AS d").collect()
    assert s[0]["d"] == 1
    d = duckdb.connect().execute(
        "SELECT levenshtein('café', 'cafe')").fetchone()[0]
    assert d == 2


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.text(alphabet="abc", max_size=5), min_size=2, max_size=7)
)
def test_fastss_completeness_fuzz(spark, words):
    """Every model pair at d=1 must be found (no false negatives from
    the deletion blocking) — the FastSS guarantee itself."""
    rows = list(enumerate(words))
    assert _run(spark, rows, 1) == _model(rows, 1)


def test_variant_expr_rejects_bad_dist():
    with pytest.raises(ValueError):
        deletion_variants_expr("s", 0)


def test_plan_never_cartesian(spark):
    df = spark.createDataFrame(
        [(0, "abc"), (1, "abd")], "id long, s string"
    )
    plan = (
        fuzzy_pairs(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
