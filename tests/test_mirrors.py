"""Mirror hosts: hand-counted rollup on both engines, gates, hygiene."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.mirrors import mirror_hosts, sql_mirror_hosts

T1 = "alpha beta gamma delta epsilon zeta"
T2 = "one two three four five six seven"
T3 = "red green blue cyan magenta yellow"
# exact copies are ALWAYS LSH candidates (identical signatures), so the
# hand count below is deterministic; the sub-threshold arm relies only
# on the verify stage killing it regardless of candidacy.
DOCS = [
    (1, T1, "hostA"), (2, T2, "hostA"), (3, T3, "hostA"),
    (4, T1, "hostB"), (5, T2, "hostB"), (6, T3, "hostB"),
    (7, T1, "hostC"),
    (8, T1, "hostA"),                       # same-host dup: excluded
    (9, "totally unrelated words here now", "hostD"),
    (10, "alpha beta gamma nope nope nope", "hostD"),  # j < 0.8 vs T1
]

# T1 copies: 1,4,7,8 -> cross-host pairs (1,4)AB (1,7)AC (4,7)BC (4,8)AB
# (7,8)AC; plus (2,5)AB (3,6)AB. Totals: AB=4, AC=2, BC=1.
EXPECT = {
    ("hostA", "hostB"): (4, 1),
    ("hostA", "hostC"): (2, 0),
    ("hostB", "hostC"): (1, 0),
}

ARGS = dict(min_pairs=3, k=2, n_perm=8, bands=4, t_num=4, t_den=5)


def _vals():
    rows = ", ".join(f"({i}, '{t}', '{h}')" for i, t, h in DOCS)
    return f"(SELECT * FROM (VALUES {rows}) t(doc_id, text, host))"


def test_duckdb_twin_matches_hand_count():
    got = {
        (r[0], r[1]): (r[2], r[3])
        for r in duckdb.sql(sql_mirror_hosts(_vals(), **ARGS)).fetchall()
    }
    assert got == EXPECT


@pytest.mark.spark
def test_spark_matches_hand_count(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, host string")
    got = {
        (r["host_a"], r["host_b"]): (r["n_dup_pairs"], r["mirror"])
        for r in mirror_hosts(df, **ARGS).collect()
    }
    assert got == EXPECT


@pytest.mark.spark
def test_threshold_gates_partial_overlap(spark):
    # at t=1/2 the half-overlap doc 10 verifies against the T1 family
    df = spark.createDataFrame(DOCS, "doc_id long, text string, host string")
    loose = dict(ARGS, t_num=1, t_den=2)
    got = {
        (r["host_a"], r["host_b"]): r["n_dup_pairs"]
        for r in mirror_hosts(df, **loose).collect()
    }
    # doc10 (hostD) vs T1 copies on A/B/C adds A-D/B-D/C-D evidence IF
    # LSH proposed the pair; at minimum the strict rows still hold
    for pair, (n, _) in EXPECT.items():
        assert got.get(pair, 0) >= n
    strict = {
        (r["host_a"], r["host_b"])
        for r in mirror_hosts(df, **ARGS).collect()
    }
    assert ("hostA", "hostD") not in strict  # j=3/9 < 4/5: verify kills


def test_rejects_bad_params():
    with pytest.raises(ValueError):
        mirror_hosts(None, min_pairs=0)
    with pytest.raises(ValueError):
        mirror_hosts(None, t_num=6, t_den=5)
    with pytest.raises(ValueError):
        mirror_hosts(None, t_num=0)
