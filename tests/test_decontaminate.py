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


@pytest.mark.spark
def test_decontaminate_spans_semantics(spark):
    """Span-level decontamination removes exactly the contaminated runs:
    benchmark-quoting docs lose the quoted span (merged edge-exact),
    clean docs pass through, benchmark docs themselves are scrubbed."""
    from core_spark.operators.decontaminate import decontaminate_spans

    bench_text = "the secret benchmark answer is forty two exactly"  # 8 toks
    docs = spark.createDataFrame(
        [
            (0, bench_text),  # the benchmark item itself
            (1, f"intro words here {bench_text} trailing commentary"),
            (2, "completely clean document with unrelated words"),
            # quotes only a 4-token fragment: below k=5, must survive
            (3, "mentions the secret benchmark answer briefly again"),
        ],
        "doc_id long, text string",
    )
    bench = docs.filter("doc_id = 0")
    got = {
        r["doc_id"]: r
        for r in decontaminate_spans(docs, bench, k=5).collect()
    }
    assert got[0]["n_removed"] == 8 and got[0]["text_clean"] == ""
    assert got[1]["n_spans"] == 1 and got[1]["n_removed"] == 8
    assert got[1]["text_clean"] == "intro words here trailing commentary"
    assert got[2]["n_removed"] == 0
    assert got[3]["n_removed"] == 0  # sub-k quote is invisible by design


@pytest.mark.spark
def test_decontaminate_spans_duckdb_twin(spark):
    """Spark and the DuckDB twin agree on planted in-corpus benchmarks."""
    import duckdb

    from core_spark.operators.decontaminate import (
        decontaminate_spans,
        sql_decontaminate_spans,
    )

    rows = [
        (i, f"unique body {i} " * 2 + ("shared eval snippet words five six"
                                       if i % 3 == 0 else f"tail {i}"))
        for i in range(12)
    ]
    rows = [(i, t.strip()) for i, t in rows]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        map(tuple,
            decontaminate_spans(docs, docs.filter("doc_id % 3 = 0"), k=5)
            .collect())
    )
    con = duckdb.connect()
    values = ", ".join(f"({i}, '{t}')" for i, t in rows)
    con.execute(
        f"CREATE VIEW d AS SELECT * FROM (VALUES {values}) AS t(doc_id, text)"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            "SELECT doc_id, n_tokens, n_spans, n_removed, text_clean FROM ("
            + sql_decontaminate_spans("d", "doc_id % 3 = 0", k=5)
            + ")"
        ).fetchall()
    )
    assert got == want


def test_decontaminate_spans_twin_fuzz():
    """Hypothesis drives the DuckDB twin against a Python model on
    random corpora with in-corpus benchmarks (JVM-free; Spark parity is
    pinned above on fixed rows — the test_weburl_props pattern)."""
    import duckdb
    from hypothesis import given, settings, strategies as st

    K = 3
    tok = st.sampled_from(["a", "b", "c", "eval", "set", "x", "y"])
    corp = st.lists(
        st.lists(tok, min_size=0, max_size=12).map(" ".join),
        min_size=2, max_size=6,
    )

    def model(docs):
        toks = {d: (t.split(" ") if t else [""]) for d, t in docs}
        bench_grams = set()
        for d, ts in toks.items():
            if d % 2 == 0:  # benchmark = even doc ids
                for i in range(len(ts) - K + 1):
                    bench_grams.add(tuple(ts[i: i + K]))
        out = {}
        for d, ts in toks.items():
            flagged = sorted(
                i for i in range(len(ts) - K + 1)
                if tuple(ts[i: i + K]) in bench_grams
            )
            spans = []
            for p in flagged:
                if spans and p <= spans[-1][1]:
                    spans[-1][1] = p + K
                else:
                    spans.append([p, p + K])
            cov = {i for s, e in spans for i in range(s, e)}
            kept = [t for i, t in enumerate(ts) if i not in cov]
            out[d] = (len(ts), len(spans),
                      sum(e - s for s, e in spans), " ".join(kept))
        return out

    from core_spark.operators.decontaminate import sql_decontaminate_spans

    @settings(max_examples=120, deadline=None)
    @given(texts=corp)
    def check(texts):
        docs = list(enumerate(texts))
        con = duckdb.connect()
        values = ", ".join(f"({d}, '{t}')" for d, t in docs)
        got = {
            r[0]: (r[1], r[2], r[3], r[4])
            for r in con.execute(
                "SELECT doc_id, n_tokens, n_spans, n_removed, text_clean "
                "FROM (" + sql_decontaminate_spans(
                    f"(SELECT * FROM (VALUES {values}) AS t(doc_id, text))",
                    "doc_id % 2 = 0", k=K,
                ) + ")"
            ).fetchall()
        }
        assert got == model(docs)

    check()
