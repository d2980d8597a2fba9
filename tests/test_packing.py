"""Sequence packing (operators/packing.py) vs a Python model."""

from __future__ import annotations

import hashlib

import pytest

from core_spark.operators.packing import pack_sequences

DOCS = [(i, 1 + (i * 13) % 200) for i in range(60)]  # (doc_id, n_tokens)
BUDGET, SHARDS = 128, 4


def _h60(doc_id: int) -> int:
    return int(hashlib.md5(f"{doc_id}:pack".encode()).hexdigest()[:15], 16)


def _model():
    out = {}
    by_shard = {}
    for doc_id, n in DOCS:
        by_shard.setdefault(_h60(doc_id) % SHARDS, []).append((doc_id, n))
    for shard, docs in by_shard.items():
        cum = 0
        for doc_id, n in sorted(docs, key=lambda d: (_h60(d[0]), d[0])):
            out[doc_id] = (shard, cum // BUDGET, cum % BUDGET)
            cum += n
    return out


@pytest.mark.spark
def test_pack_vs_python_model(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["shard"], r["bin"], r["offset"])
        for r in pack_sequences(df, BUDGET, SHARDS).collect()
    }
    assert got == _model()


@pytest.mark.spark
def test_pack_concat_semantics(spark):
    """Within a shard, sorting docs by (bin, offset) reproduces the stream:
    each doc starts exactly where the previous one ended (mod budget)."""
    df = spark.createDataFrame(DOCS, "doc_id long, n_tokens long")
    rows = pack_sequences(df, BUDGET, SHARDS).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: (r["bin"], r["offset"], r["doc_id"]))
        cum = 0
        for r in rs:
            assert (r["bin"], r["offset"]) == (cum // BUDGET, cum % BUDGET)
            cum += r["n_tokens"]


@pytest.mark.spark
def test_pack_repartition_stable(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, n_tokens long")
    a = sorted(map(tuple, pack_sequences(df, BUDGET, SHARDS).collect()))
    b = sorted(
        map(tuple, pack_sequences(df.repartition(7), BUDGET, SHARDS).collect())
    )
    assert a == b


@pytest.mark.spark
def test_pack_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert pack_sequences(df, BUDGET, SHARDS).count() == 0
