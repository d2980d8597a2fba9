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


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

import duckdb

from core_spark.operators.cardsketch import (
    hll_estimate, hll_registers, hll_sketch, merge_hll_registers,
    sql_hll_sketch,
)

_B = 8
_M, _W = 1 << _B, 60 - _B


def _hll_model(keys):
    """Independent Python HLL over the shared 60-bit md5 split."""
    regs = {}
    for k in keys:
        h = int(hashlib.md5(f"{k}:hll".encode()).hexdigest()[:15], 16)
        b, w = h % _M, h // _M
        rank = (_W + 1) if w == 0 else _W - (w.bit_length() - 1)
        regs[b] = max(regs.get(b, 0), rank)
    sum_scaled = sum(1 << (_W + 1 - r) for r in regs.values()) + \
        (_M - len(regs)) * (1 << (_W + 1))
    return regs, sum_scaled


@pytest.mark.spark
def test_hll_vs_model_both_engines(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, lang string, k string")
    got = {r["lang"]: (r["n_rows"], r["hll_regs_hit"], r["hll_sum_scaled"],
                       r["hll_reg_fp"])
          for r in hll_sketch(df, "lang", "k", _B).collect()}
    for g in ("g1", "g2"):
        keys = [k for _i, gg, k in ROWS if gg == g]
        regs, sum_scaled = _hll_model(keys)
        fp = hashlib.md5(",".join(
            f"{b}:{r}" for b, r in sorted(regs.items())).encode()).hexdigest()
        n = sum(1 for _i, gg, _k in ROWS if gg == g)
        assert got[g] == (n, len(regs), sum_scaled, fp)

    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{g}', '{k}')" for i, g, k in ROWS)
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) "
                f"_(doc_id, lang, k)")
    duck = {r[0]: tuple(r[1:]) for r in
            con.execute(sql_hll_sketch("t", "lang", "k", _B)).fetchall()}
    assert duck == got


@pytest.mark.spark
def test_hll_registers_merge_and_partition_invariance(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, lang string, k string")
    whole = {(r["lang"], r["bucket"]): r["reg"]
             for r in hll_registers(df, "lang", "k", _B).collect()}
    # shard-union: sketch(A ∪ B) == merge(sketch(A), sketch(B))
    a = hll_registers(df.filter("doc_id < 90"), "lang", "k", _B)
    b = hll_registers(df.filter("doc_id >= 90"), "lang", "k", _B)
    merged = {(r["lang"], r["bucket"]): r["reg"]
              for r in merge_hll_registers(a, b).collect()}
    assert merged == whole
    # ANY partitioning yields the same registers
    for n in (1, 7, 32):
        got = {(r["lang"], r["bucket"]): r["reg"]
               for r in hll_registers(df.repartition(n), "lang", "k",
                                      _B).collect()}
        assert got == whole


def test_hll_estimate_accuracy_across_ranges():
    # HLL stays accurate where linear counting saturates: error bound
    # ~1.04/sqrt(m) = 6.5% at b=8; allow 3 sigma.
    for n in (100, 5_000, 200_000):
        regs, sum_scaled = _hll_model(f"key{i}" for i in range(n))
        est = hll_estimate(sum_scaled, len(regs), _B)
        assert abs(est - n) / n < 3 * 1.04 / (_M ** 0.5), (n, est)
    # empty-input degenerate: all registers empty -> estimate 0
    assert hll_estimate(_M * (1 << (_W + 1)), 0, _B) == 0.0
