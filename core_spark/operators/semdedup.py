"""SemDeDup — semantic deduplication over an embedding column
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", arXiv:2303.09540).

The published method: cluster the embeddings; WITHIN each cluster rank
the members and drop any member whose cosine similarity to a
lower-ranked member exceeds tau, keeping the member with LOW similarity
to the cluster centroid first (the paper's diversity-preserving keep
policy — the reference implementation computes the per-cluster pairwise
matrix and takes the triangular max per row, NOT an iterative greedy,
so the policy is join-expressible as-is).

This implementation keeps every arithmetic step integer-exact and
bit-portable (the dedup.py embedding recipe: floor(x*512) clamp ±600
quantization, literal ±1 hyperplanes, cross-multiplied cosine
threshold), which buys an exact DuckDB oracle:

  cluster    = the deterministic hyperplane sketch bucket (the repo's
               LSH blocking doubling as the clustering — at production
               scale swap in the IVF k-means assignment from
               similarity.py; the policy below is cluster-source-
               agnostic, which is why it takes a prepared (id, qv)
               table). 2^n_planes buckets, no training step, no seed.
  centroid   = per-bucket per-dimension integer mean
               floor(sum/count) — computed via ONE posexplode +
               uniform-(bucket,pos)-key hash-agg with map-side combine
               (the termstats shape), never a driver collect.
  rank       = row_number per bucket by (dist2 to centroid DESC, id) —
               squared INTEGER L2 distance is the portable stand-in for
               "low cosine similarity to centroid" (monotone for the
               near-unit-norm embeddings the paper assumes; exact
               BIGINT, no sqrt crosses an engine boundary).
  drop rule  = exists lower-ranked same-bucket member with
               tau_den * dot² ≥ tau_num * |a|²|b|² and dot > 0.

100-TB shape: the sketch + quantization are one codegen'd projection;
the centroid agg shuffles (bucket, pos) uniform keys; the centroid
table is ≤ 2^n_planes rows → broadcast back; the pair join is blocked
per bucket (never all-pairs) with the pinned-input rule for both
branches. The per-bucket window is the same sequential-per-cluster
step the paper itself requires; a mega-cluster is the documented skew
hazard — raise n_planes (or use finer k-means cells) so clusters stay
partition-sized, exactly as the paper shards its clusters.

No reference counterpart (specvital/core has no embedding subsystem);
composes with dedup.dedup_keep_representatives / dedup_keep_best for
other keep policies.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..plans.materialize import pin
from . import dedup as dd


def quantize_vectors(vecs, vec_col: str = "embedding",
                     id_col: str = "vec_id"):
    """(id, qv) BIGINT quantization of a float-vector table (shared
    scalar with the DuckDB twin: floor(x*512) clamped to ±600)."""
    return vecs.selectExpr(
        f"{id_col} AS id",
        f"transform(CAST({vec_col} AS array<double>), x -> "
        f"{dd._emb_quant('x')}) AS qv",
    )


def _centroid_mean(s: str, n: str) -> str:
    """floor(sum/count) emitted identically on both engines: the double
    division of exact integers (< 2^53) is IEEE-identical, FLOOR before
    the BIGINT cast per the portability rules. Spark DIV / DuckDB //
    disagree on negative sums (truncate vs floor), so neither is used."""
    return f"CAST(FLOOR(CAST({s} AS DOUBLE) / {n}) AS BIGINT)"


def semdedup_flags(qv_df, dim: int = 64, n_planes: int = 6,
                   tau_num: int = 49, tau_den: int = 64):
    """Per-member SemDeDup verdicts: (id, bucket, dist2, rnk, kept).

    ``qv_df`` is a prepared (id, qv array<bigint>) table
    (quantize_vectors, or any caller-supplied cluster-ready encoding).
    kept=false ⇔ some lower-ranked member of the same bucket is
    tau-similar. Flag-style output so the oracle gates every member,
    not just the survivors.
    """
    planes = dd.emb_planes(n_planes, dim)
    # stepwise columns (CLAUDE.md invariant): one d<p> per plane, then
    # the sketch over plain column refs
    d_steps = {
        f"d{p}": F.expr(
            "aggregate(zip_with(qv, array("
            + ", ".join(f"{s}L" for s in planes[p])
            + "), (x, y) -> x * y), CAST(0 AS BIGINT), (s, v) -> s + v)"
        )
        for p in range(n_planes)
    }
    sketch = " + ".join(
        f"(CASE WHEN d{p} >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(n_planes)
    )
    sk = (
        qv_df.withColumns(
            {**d_steps,
             "na2": F.expr(
                 "aggregate(qv, CAST(0 AS BIGINT), (s, v) -> s + v * v)")})
        .selectExpr("id", "qv", "na2", f"{sketch} AS bucket")
    )
    # multi-consumer (centroid agg + member join): pin before branching
    sk = sk.transform(pin)

    cent = (
        sk.select("bucket", F.posexplode("qv").alias("pos", "q"))
        .groupBy("bucket", "pos")
        .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("n"))
        .selectExpr("bucket", "pos", f"{_centroid_mean('s', 'n')} AS c")
        .groupBy("bucket")
        .agg(F.expr(
            "transform(array_sort(collect_list(struct(pos, c))), x -> x.c)"
        ).alias("cvec"))
    )
    mem = (
        sk.join(F.broadcast(cent), "bucket")
        .withColumn("dist2", F.expr(
            "aggregate(zip_with(qv, cvec, (x, y) -> (x - y) * (x - y)), "
            "CAST(0 AS BIGINT), (s, v) -> s + v)"))
        .withColumn("rnk", F.expr(
            "row_number() OVER (PARTITION BY bucket "
            "ORDER BY dist2 DESC, id)"))
        .select("id", "qv", "na2", "bucket", "dist2", "rnk")
    )
    # pair join reads mem on both branches + the final output a third time
    mem = mem.transform(pin)
    a, b = mem.alias("a"), mem.alias("b")
    dup_ids = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.rnk") < F.col("b.rnk")))
        .select(
            F.col("b.id").alias("dup_id"),
            F.expr("aggregate(zip_with(a.qv, b.qv, (x, y) -> x * y), "
                   "CAST(0 AS BIGINT), (s, v) -> s + v)").alias("dot_q"),
            F.col("a.na2").alias("na2"), F.col("b.na2").alias("nb2"))
        .filter(f"dot_q > 0 AND {tau_den} * dot_q * dot_q >= "
                f"{tau_num} * na2 * nb2")
        .select("dup_id").distinct()
    )
    return (
        mem.join(dup_ids, mem.id == dup_ids.dup_id, "left")
        .select("id", "bucket", "dist2", "rnk",
                F.col("dup_id").isNull().alias("kept"))
    )


def sql_semdedup(qv_cte: str, dim: int = 64, n_planes: int = 6,
                 tau_num: int = 49, tau_den: int = 64) -> str:
    """DuckDB twin: same planes, quantization contract, centroid mean,
    rank and threshold test. ``qv_cte`` is SQL yielding (id, qv)."""
    planes = dd.emb_planes(n_planes, dim)
    rng = f"range(1, {dim + 1})"
    d_cols = ", ".join(
        f"CAST(list_sum([qv[i] * ([{','.join(map(str, planes[p]))}])[i] "
        f"for i in {rng}]) AS BIGINT) AS d{p}"
        for p in range(n_planes)
    )
    sketch = " + ".join(
        f"(CASE WHEN d{p} >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(n_planes)
    )
    return f"""
WITH qvt AS ({qv_cte}),
dd AS (SELECT id, qv, {d_cols},
              CAST(list_sum([q * q for q in qv]) AS BIGINT) AS na2 FROM qvt),
sk AS (SELECT id, qv, na2, {sketch} AS bucket FROM dd),
cent AS (
  SELECT bucket, t.range AS pos,
         {_centroid_mean('SUM(qv[t.range])', 'COUNT(*)')} AS c
  FROM sk, range(1, {dim + 1}) t
  GROUP BY bucket, t.range
),
cent2 AS (SELECT bucket, list(c ORDER BY pos) AS cvec FROM cent GROUP BY bucket),
mem AS (
  SELECT sk.id, sk.qv, sk.na2, sk.bucket,
         CAST(list_sum([(sk.qv[i] - cvec[i]) * (sk.qv[i] - cvec[i])
                        for i in {rng}]) AS BIGINT) AS dist2
  FROM sk JOIN cent2 USING (bucket)
),
rk AS (SELECT *, row_number() OVER (PARTITION BY bucket
                                    ORDER BY dist2 DESC, id) AS rnk FROM mem),
dupc AS (
  SELECT b.id AS dup_id,
         CAST(list_sum([a.qv[i] * b.qv[i] for i in {rng}]) AS BIGINT) AS dot_q,
         a.na2 AS na2, b.na2 AS nb2
  FROM rk a JOIN rk b ON a.bucket = b.bucket AND a.rnk < b.rnk
),
dup AS (SELECT DISTINCT dup_id FROM dupc
        WHERE dot_q > 0
          AND {tau_den} * dot_q * dot_q >= {tau_num} * na2 * nb2)
SELECT rk.id, rk.bucket, rk.dist2, rk.rnk,
       (dup.dup_id IS NULL) AS kept
FROM rk LEFT JOIN dup ON rk.id = dup.dup_id
"""
