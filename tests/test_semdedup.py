"""SemDeDup (operators/semdedup.py) gates: Python-model parity on both
engines, the paper's policy invariants, and plan shape."""

import duckdb
import pytest
from pyspark.sql import functions as F

from core_spark.operators import dedup as dd
from core_spark.operators import semdedup as sdd

DIM = 8
N_PLANES = 3
TAU_NUM, TAU_DEN = 49, 64


# ---------------------------------------------------------------------------
# independent Python model (no SQL, no Spark)
# ---------------------------------------------------------------------------

def _model(qvs: dict[int, list[int]]):
    planes = dd.emb_planes(N_PLANES, DIM)
    def sketch(qv):
        s = 0
        for p in range(N_PLANES):
            if sum(x * y for x, y in zip(qv, planes[p])) >= 0:
                s += 1 << p
        return s
    buckets: dict[int, list[int]] = {}
    for i, qv in qvs.items():
        buckets.setdefault(sketch(qv), []).append(i)
    out = {}
    for b, ids in buckets.items():
        n = len(ids)
        import math
        cent = [int(math.floor(sum(qvs[i][d] for i in ids) / n))
                for d in range(DIM)]
        dist2 = {i: sum((qvs[i][d] - cent[d]) ** 2 for d in range(DIM))
                 for i in ids}
        ranked = sorted(ids, key=lambda i: (-dist2[i], i))
        for r, i in enumerate(ranked, 1):
            dup = False
            for j in ranked[:r - 1]:
                dot = sum(x * y for x, y in zip(qvs[i], qvs[j]))
                na2 = sum(x * x for x in qvs[i])
                nb2 = sum(x * x for x in qvs[j])
                if dot > 0 and TAU_DEN * dot * dot >= TAU_NUM * na2 * nb2:
                    dup = True
                    break
            out[i] = (b, dist2[i], r, not dup)
    return out


def _fixture_qvs():
    """Deterministic integer vectors with planted near-dup pairs."""
    import hashlib
    qvs = {}
    for i in range(40):
        h = hashlib.md5(f"sd_{i}".encode()).digest()
        qvs[i] = [(h[d] % 21) - 10 for d in range(DIM)]
    # planted copies: tiny perturbation of the first 10 vectors
    for i in range(10):
        qvs[1000 + i] = [q * 50 + ((i + d) % 3 - 1)
                         for d, q in enumerate(qvs[i])]
        qvs[i] = [q * 50 for q in qvs[i]]
    return qvs


def test_spark_matches_model(spark):
    qvs = _fixture_qvs()
    df = spark.createDataFrame(
        [(i, qv) for i, qv in qvs.items()], "id long, qv array<long>")
    got = {r.id: (r.bucket, r.dist2, r.rnk, r.kept)
           for r in sdd.semdedup_flags(
               df, dim=DIM, n_planes=N_PLANES,
               tau_num=TAU_NUM, tau_den=TAU_DEN).collect()}
    assert got == _model(qvs)


def test_duckdb_twin_matches_model():
    qvs = _fixture_qvs()
    rows = ", ".join(f"({i}, {list(qv)})" for i, qv in qvs.items())
    cte = f"SELECT * FROM (VALUES {rows}) v(id, qv)"
    sql = sdd.sql_semdedup(cte, dim=DIM, n_planes=N_PLANES,
                           tau_num=TAU_NUM, tau_den=TAU_DEN)
    got = {r[0]: (r[1], r[2], r[3], r[4])
           for r in duckdb.sql(sql).fetchall()}
    assert got == _model(qvs)


def test_planted_pairs_prune_exactly_one_member(spark):
    """Every planted (orig, copy) pair landing in the same bucket loses
    exactly its lower-ranked member; rank 1 is never dropped."""
    qvs = _fixture_qvs()
    df = spark.createDataFrame(
        [(i, qv) for i, qv in qvs.items()], "id long, qv array<long>")
    res = {r.id: r for r in sdd.semdedup_flags(
        df, dim=DIM, n_planes=N_PLANES,
        tau_num=TAU_NUM, tau_den=TAU_DEN).collect()}
    same_bucket_pairs = [
        (i, 1000 + i) for i in range(10)
        if res[i].bucket == res[1000 + i].bucket]
    assert same_bucket_pairs, "fixture must land some pairs together"
    for a, b in same_bucket_pairs:
        kept = {res[a].kept, res[b].kept}
        assert kept == {True, False}
        dropped = a if not res[a].kept else b
        survivor = b if dropped == a else a
        assert res[survivor].rnk < res[dropped].rnk
    for r in res.values():
        if r.rnk == 1:
            assert r.kept


def test_singleton_buckets_all_kept(spark):
    """Orthogonal-ish far-apart vectors: nothing passes tau, all kept."""
    qvs = {i: [300 if d == i else 0 for d in range(DIM)] for i in range(DIM)}
    df = spark.createDataFrame(
        [(i, qv) for i, qv in qvs.items()], "id long, qv array<long>")
    res = sdd.semdedup_flags(df, dim=DIM, n_planes=N_PLANES,
                             tau_num=TAU_NUM, tau_den=TAU_DEN).collect()
    assert all(r.kept for r in res)
    assert len(res) == DIM


def test_empty_input(spark):
    df = spark.createDataFrame([], "id long, qv array<long>")
    assert sdd.semdedup_flags(df, dim=DIM, n_planes=N_PLANES).count() == 0


def test_plan_shape(spark, monkeypatch):
    """Centroid join broadcast, bucket-blocked pair join (never
    cartesian), no Python stage on the path. pin() is stubbed to
    identity so the FULL lineage is visible in one plan string (the
    materialization boundary otherwise truncates it to the last
    segment); the pinning itself is covered by the parity tests."""
    monkeypatch.setattr(sdd, "pin", lambda df, **kw: df)
    qvs = _fixture_qvs()
    df = spark.createDataFrame(
        [(i, qv) for i, qv in qvs.items()], "id long, qv array<long>")
    plan = sdd.semdedup_flags(
        df, dim=DIM, n_planes=N_PLANES)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_quantize_vectors_contract(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -0.5, 3.0, -3.0])], "vec_id long, embedding array<float>")
    (row,) = sdd.quantize_vectors(df).collect()
    # floor(x*512) clamped to +-600 — the dedup.py shared scalar
    assert row.qv == [256, -256, 600, -600]
