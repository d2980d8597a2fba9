"""chunk_documents (operators/chunking.py) gates: Python-model parity on
BOTH engines, window-coverage properties, boundary shapes, validation,
and the no-shuffle/no-Python plan assert."""

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from core_spark.operators.chunking import chunk_documents, sql_chunk_documents


def _model(doc_id, text, size, overlap):
    """Independent Python model of the sliding window."""
    stride = size - overlap
    toks = text.split() if text else []
    n = len(toks)
    if n == 0:
        return []
    n_chunks = 1 if n <= size else -((n - size) // -stride) + 1
    out = []
    for k in range(n_chunks):
        s, e = k * stride, min(k * stride + size, n)
        out.append((doc_id, k, s, e, e - s, " ".join(toks[s:e])))
    return out


def _spark_rows(spark, rows, size, overlap):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {tuple(r) for r in
            chunk_documents(df, size, overlap).collect()}


def _sqllit(t):
    """DuckDB E'' literal: repr() would leave \\n as two chars."""
    if t is None:
        return "NULL"
    esc = (t.replace("\\", "\\\\").replace("'", "''")
            .replace("\n", "\\n").replace("\t", "\\t"))
    return f"E'{esc}'"


def _duck_rows(rows, size, overlap):
    con = duckdb.connect()
    vals = ", ".join(f"({i}, {_sqllit(t)})" for i, t in rows)
    con.execute(f"CREATE TABLE d AS SELECT * FROM (VALUES {vals}) "
                f"_(doc_id, text)")
    return {tuple(r) for r in
            con.execute(sql_chunk_documents("d", size, overlap)).fetchall()}


_DOCS = [
    (1, "a b c d e f g h i j"),          # n=10
    (2, "one two three"),                 # n < size
    (3, "x " * 16),                       # n == size boundary
    (4, "y " * 17),                       # n == size+1 (short tail chunk)
    (5, ""),                              # no tokens -> no rows
    (6, None),                            # NULL -> no rows
    (7, "   padded   tokens   here   "),  # whitespace runs + trim
    (8, "a b\n"),                         # trailing \n: trim() strips only
                                          # 0x20 — no phantom empty token
    (9, "\n"),                            # whitespace-only doc -> no rows
    (10, "\t leading\ttabs\nand\nnewlines\n "),
]


@pytest.mark.parametrize("size,overlap", [(16, 4), (4, 0), (4, 3), (1, 0)])
def test_model_parity_both_engines(spark, size, overlap):
    want = {t for i, txt in _DOCS for t in _model(i, txt, size, overlap)}
    assert _spark_rows(spark, _DOCS, size, overlap) == want
    assert _duck_rows(_DOCS, size, overlap) == want


def test_window_properties(spark):
    size, overlap = 6, 2
    rows = _spark_rows(spark, [(1, " ".join(f"t{i}" for i in range(50)))],
                       size, overlap)
    by_ix = sorted(rows, key=lambda r: r[1])
    # full coverage: spans tile [0, 50) with the declared overlap
    assert by_ix[0][2] == 0 and by_ix[-1][3] == 50
    for a, b in zip(by_ix, by_ix[1:]):
        assert a[3] - b[2] == overlap        # consecutive chunks share it
        assert b[2] == a[2] + (size - overlap)
    # every chunk but the last is exactly `size`; the tail is never empty
    assert all(r[4] == size for r in by_ix[:-1])
    assert 0 < by_ix[-1][4] <= size
    # end-exclusive offsets: n_tokens == tok_end - tok_start everywhere
    assert all(r[4] == r[3] - r[2] for r in rows)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 40), st.integers(2, 9), st.integers(0, 5))
def test_fuzz_duckdb_twin_vs_model(n, size, ov):
    overlap = min(ov, size - 1)
    text = " ".join(f"w{i}" for i in range(n))
    want = set(_model(9, text, size, overlap))
    assert _duck_rows([(9, text)], size, overlap) == want


def test_validation():
    with pytest.raises(ValueError, match="size must be positive"):
        sql_chunk_documents("d", 0)
    with pytest.raises(ValueError, match="overlap must be in"):
        sql_chunk_documents("d", 4, 4)
    with pytest.raises(ValueError, match="overlap must be in"):
        sql_chunk_documents("d", 4, -1)


def test_plan_is_one_exchange_free_jvm_stage(spark):
    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.lit("a b c d e f g h").alias("text"))
    plan = chunk_documents(df, 4, 1)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Generate explode" in plan  # the within-row window explode
