"""Linear-counting cardinality sketch vs a Python model + mergeability."""

from __future__ import annotations

import hashlib

import pytest

from core_spark.operators.cardsketch import distinct_sketch, estimate_distinct

M = 512
ROWS = [(i, "g1" if i % 4 else "g2", f"key{i % 37}") for i in range(200)]


def _bucket(k: str) -> int:
    return int(hashlib.md5(f"{k}:lc".encode()).hexdigest()[:15], 16) % M


def _model():
    out = {}
    for _i, g, k in ROWS:
        st = out.setdefault(g, {"n": 0, "keys": set(), "buckets": set()})
        st["n"] += 1
        st["keys"].add(k)
        st["buckets"].add(_bucket(k))
    return out


@pytest.mark.spark
def test_sketch_vs_model(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, lang string, k string")
    got = {
        r["lang"]: (r["n_rows"], r["n_distinct_exact"], r["lc_buckets_hit"])
        for r in distinct_sketch(df, "lang", "k", M).collect()
    }
    want = {
        g: (st["n"], len(st["keys"]), len(st["buckets"]))
        for g, st in _model().items()
    }
    assert got == want


@pytest.mark.spark
def test_sketch_is_mergeable(spark):
    """Bucket sets OR across shards: sketching two halves separately and
    merging the bucket sets equals sketching the whole — the property
    exact distinct counting lacks."""
    half_a = [r for r in ROWS if r[0] % 2 == 0]
    half_b = [r for r in ROWS if r[0] % 2 == 1]

    def buckets(rows):
        out = {}
        for _i, g, k in rows:
            out.setdefault(g, set()).add(_bucket(k))
        return out

    merged = {
        g: buckets(half_a).get(g, set()) | buckets(half_b).get(g, set())
        for g in {r[1] for r in ROWS}
    }
    df = spark.createDataFrame(ROWS, "doc_id long, lang string, k string")
    whole = {
        r["lang"]: r["lc_buckets_hit"]
        for r in distinct_sketch(df, "lang", "k", M).collect()
    }
    assert whole == {g: len(b) for g, b in merged.items()}


def test_estimate_accuracy_and_saturation():
    # 37 distinct keys into 512 buckets: estimate within 10% of truth
    hits = len({_bucket(f"key{i}") for i in range(37)})
    est = estimate_distinct(hits, M)
    assert abs(est - 37) / 37 < 0.10
    assert estimate_distinct(M, M) == float("inf")
