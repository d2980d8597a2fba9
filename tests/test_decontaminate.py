"""Benchmark decontamination (core_spark/operators/decontaminate.py)."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.decontaminate import (
    contaminated_docs,
    sql_contaminated_docs,
)

# k=3. bench = docs 0 and 3.
DOCS = [
    (0, "alpha beta gamma delta"),          # bench itself -> contaminated
    (1, "x alpha beta gamma y"),            # shares "alpha beta gamma" (1 hit)
    (2, "alpha beta delta gamma"),          # 3-grams differ -> clean
    (3, "p q r s p q r"),                   # bench; grams deduped within doc
    (4, "z p q r z"),                       # shares "p q r" once
    (5, "beta gamma delta alpha beta gamma"),  # 2 distinct shared grams
    (6, "tiny doc"),                        # < k tokens -> clean
    (7, None),                              # NULL text -> clean
]
BENCH_IDS = (0, 3)
# expected distinct shared-gram counts
EXPECT = {0: 2, 1: 1, 2: 0, 3: 4, 4: 1, 5: 2, 6: 0, 7: 0}


@pytest.mark.spark
def test_contaminated_docs_spark(spark):
    docs = spark.createDataFrame(DOCS, "doc_id INT, text STRING")
    bench = docs.filter(docs.doc_id.isin(*BENCH_IDS))
    rows = {r.doc_id: r for r in contaminated_docs(docs, bench, k=3).collect()}
    assert set(rows) == set(EXPECT)
    for i, n in EXPECT.items():
        assert rows[i].n_hits == n, f"doc {i}: {rows[i]}"
        assert rows[i].contaminated == (1 if n else 0)


@pytest.mark.spark
def test_broadcast_in_plan(spark):
    """Both joins must be broadcast — no shuffle of the corpus side."""
    docs = spark.createDataFrame(DOCS, "doc_id INT, text STRING")
    bench = docs.filter("doc_id = 0")
    plan = (
        contaminated_docs(docs, bench, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan


def test_duckdb_twin_matches():
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", DOCS)
    sql = sql_contaminated_docs("t", f"doc_id IN {BENCH_IDS}", k=3)
    got = dict(
        (r[0], (r[1], r[2]))
        for r in con.execute(sql).fetchall()
    )
    assert got == {i: (n, 1 if n else 0) for i, n in EXPECT.items()}
