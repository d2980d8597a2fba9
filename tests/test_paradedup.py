"""Paragraph-level exact dedup (operators/paradedup.py) vs a Python model.

The model is the spec: chunk tokens into fixed windows, keep each distinct
paragraph's first occurrence in (doc_id, pos) order, reassemble.
"""

from __future__ import annotations

import pytest

from core_spark.operators.paradedup import (
    dedup_paragraphs,
    paragraphs_expr,
    tokens_expr,
)

DOCS = [
    # doc 0 and 2 share their first chunk; doc 3 is ALL dups of doc 0
    (0, "a b c d e f g h i j k l m"),
    (1, "x y z"),
    (2, "a b c d e f g h i j q r"),
    (3, "a b c d e f g h i j"),
    (4, "k l m"),  # same text as doc 0's 2nd chunk -> dup
]
N_TOK = 10


def _model():
    seen, out = set(), {}
    for doc_id, text in DOCS:
        toks = text.split(" ")
        paras = [
            " ".join(toks[i : i + N_TOK])
            for i in range(0, len(toks), N_TOK)
        ]
        kept = []
        n_dup = 0
        for p in paras:
            if p in seen:
                n_dup += 1
            else:
                seen.add(p)
                kept.append(p)
        out[doc_id] = (len(paras), n_dup, " ".join(kept))
    return out


def _paras_df(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return df.selectExpr(
        "doc_id", f"{tokens_expr('text', 'spark')} AS _toks"
    ).selectExpr(
        "doc_id", f"{paragraphs_expr('_toks', N_TOK, 'spark')} AS paras"
    )


@pytest.mark.spark
def test_chunking(spark):
    rows = {r["doc_id"]: r["paras"] for r in _paras_df(spark).collect()}
    assert rows[0] == ["a b c d e f g h i j", "k l m"]
    assert rows[1] == ["x y z"]
    assert rows[3] == ["a b c d e f g h i j"]


@pytest.mark.spark
def test_dedup_matches_python_model(spark):
    got = {
        r["doc_id"]: (r["n_paras"], r["n_dup"], r["text_dedup"])
        for r in dedup_paragraphs(_paras_df(spark)).collect()
    }
    assert got == _model()
    # doc 3 is entirely duplicate -> empty reassembled text, still 1 row
    assert got[3] == (1, 1, "")


@pytest.mark.spark
def test_dedup_duckdb_twin_on_same_rows(spark):
    import duckdb

    from core_spark.operators.paradedup import sql_dedup_paragraphs

    con = duckdb.connect()
    values = ", ".join(f"({i}, '{t}')" for i, t in DOCS)
    con.execute(
        f"CREATE VIEW d AS SELECT * FROM (VALUES {values}) AS t(doc_id, text)"
    )
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            "SELECT doc_id, n_paras, n_dup, text_dedup FROM ("
            + sql_dedup_paragraphs("d", N_TOK)
            + ")"
        ).fetchall()
    }
    assert got == _model()


@pytest.mark.spark
def test_dedup_repartition_stable(spark):
    base = {
        (r["doc_id"], r["n_dup"], r["text_dedup"])
        for r in dedup_paragraphs(_paras_df(spark)).collect()
    }
    shuffled = {
        (r["doc_id"], r["n_dup"], r["text_dedup"])
        for r in dedup_paragraphs(_paras_df(spark).repartition(5)).collect()
    }
    assert base == shuffled


@pytest.mark.spark
def test_dedup_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, paras array<string>")
    assert dedup_paragraphs(df).count() == 0


@pytest.mark.spark
def test_dedup_huge_doc_ids_and_positions(spark):
    """The winner ordinal is min(struct(doc_id, pos)) — no scalar
    packing, so doc_id beyond ~9.2e13 and pos beyond 1e5 (the old
    ORD_SCALE packing limits) must still pick first occurrences
    correctly (ADVICE r4)."""
    big_a, big_b = 10**16, 10**16 + 1  # would overflow doc_id * 1e5
    rows = [
        (big_a, ["dup-para", "unique-a"]),
        (big_b, ["dup-para", "unique-b"]),
    ]
    # pos past the old ORD_SCALE: 100_001 paragraphs, the last a dup of
    # doc big_a's first — scalar packing would misorder it vs big_b
    long_doc = (7, ["filler-%d" % i for i in range(100_000)] + ["dup-para"])
    df = spark.createDataFrame(
        rows + [long_doc], "doc_id long, paras array<string>"
    )
    got = {
        r["doc_id"]: (r["n_paras"], r["n_dup"])
        for r in dedup_paragraphs(df).collect()
    }
    # first occurrence of 'dup-para' is doc 7 pos 100_000? No: struct
    # order is (doc_id, pos), doc 7 < big_a, so doc 7 wins despite the
    # huge pos; big_a and big_b both count it as a dup.
    assert got[7] == (100_001, 0)
    assert got[big_a] == (2, 1)
    assert got[big_b] == (2, 1)
