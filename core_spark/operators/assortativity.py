"""Degree assortativity of the host link graph.

Newman's assortativity coefficient (Newman 2002, "Assortative mixing
in networks") — the Pearson correlation of the degrees at either end
of an edge. r > 0: hubs link to hubs (social-network shape); r < 0:
hubs link to leaves (web/link-farm shape). It is the one-number
summary the graph family (pagerank, triangles, k-core, link_predict)
doesn't emit: WHO the well-connected connect to.

Exactness — the undirected simplification makes r fully RATIONAL:
over the directed half-edge list (each undirected edge in both
directions) the source-degree and target-degree sequences are the
same multiset, so the two Pearson denominator factors are EQUAL and
sqrt(x)·sqrt(x) collapses to x exactly:

    r = (M·Σ(jk) − Σj·Σk) / (M·Σ(j²) − (Σj)²)

with M = 2m directed half-edges, j/k the endpoint degrees. Both
numerator and denominator are exact BIGINT arithmetic over hash-agg
sums; r is ONE trailing IEEE division riding beside its exact factors
(the od_flows/moran recipe). No sqrt, no transcendental, no float sum
ever crosses a shuffle. Degenerate regular graphs (den = 0 — degree
variance is zero, correlation undefined) report NULL via an exact
integer CASE, never NaN.

Overflow envelope (the apportion convention): num/den terms are
bounded by 4m²·d_max² — fine up to ~m·d_max < 1.5e9 (a 100M-edge
host graph with 15-degree hosts, or any mix); past that, pre-divide
degrees by a constant scale before calling (rankings and sign are
scale-invariant).

Plan shape: canonical edge hash-agg (triangles.canonical_edges,
pinned — feeds both the degree agg and the edge-degree join), degree
hash-agg, two uniform equi-joins attaching (du, dv) per edge, ONE
global 1-row aggregate in which each undirected edge contributes both
directions in closed form (du+dv, 2·du·dv, du²+dv²) — no union, no
second pass over the edges.

The DuckDB twin is the INDEPENDENT plan: directed half-edges via
UNION ALL, endpoint degrees as COUNT(*) windows over the directed
rows themselves (no degree table, no joins), one aggregate.

No reference counterpart (specvital/core has no graph subsystem);
the statistic is Newman's published formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from core_spark.operators.triangles import canonical_edges
from core_spark.plans.materialize import pin

# identical final projection text on both engines: exact BIGINT
# num/den, one trailing IEEE division, NULL (never NaN) when the
# degree variance is zero
_FINAL = (
    "CAST(m_edges AS BIGINT) AS m_edges",
    "CAST(num AS BIGINT) AS num",
    "CAST(den AS BIGINT) AS den",
    "CASE WHEN den <> 0 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE)"
    " END AS assortativity",
)


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """One row (m_edges, num, den, assortativity): Newman degree
    assortativity of the undirected simple graph induced by ``edges``;
    NULL assortativity when every node has the same degree (den = 0).
    Empty graphs yield m_edges = 0."""
    simple = pin(canonical_edges(edges, src, dst))
    degrees = (
        simple.selectExpr("u AS node")
        .unionAll(simple.selectExpr("v AS node"))
        .groupBy("node").agg(F.count("*").cast("long").alias("degree"))
    )
    du = degrees.selectExpr("node AS u", "degree AS du")
    dv = degrees.selectExpr("node AS v", "degree AS dv")
    sums = (
        simple.join(du, "u").join(dv, "v")
        .selectExpr("du", "dv")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("m"),
            F.expr("CAST(SUM(du + dv) AS BIGINT)").alias("sj"),
            F.expr("CAST(SUM(du * dv) AS BIGINT)").alias("sdudv"),
            F.expr("CAST(SUM(du * du + dv * dv) AS BIGINT)").alias("sj2"),
        )
    )
    return sums.selectExpr(
        "coalesce(m, 0) AS m_edges",
        # directed totals: M = 2m, Σjk = 2·Σ(du·dv), Σj = Σk = sj,
        # Σj² = Σk² = sj2
        "coalesce(2 * m * (2 * sdudv) - sj * sj, 0) AS num",
        "coalesce(2 * m * sj2 - sj * sj, 0) AS den",
    ).selectExpr(*_FINAL)


def sql_degree_assortativity(edges_sql: str) -> str:
    """DuckDB twin via the INDEPENDENT window plan: directed half-edges
    from UNION ALL, endpoint degrees as COUNT(*) windows over the
    directed rows (no degree table, no joins), one aggregate, the same
    final projection text. ``edges_sql`` must yield (src, dst)."""
    return f"""
        WITH raw AS ({edges_sql}),
        canon AS (
          SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
          FROM raw
          WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
        ),
        directed AS (
          SELECT u AS s, v AS d FROM canon
          UNION ALL SELECT v AS s, u AS d FROM canon
        ),
        degreed AS (
          SELECT COUNT(*) OVER (PARTITION BY s) AS j,
                 COUNT(*) OVER (PARTITION BY d) AS k
          FROM directed
        ),
        sums AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS m2,
                 CAST(SUM(j) AS BIGINT) AS sj,
                 CAST(SUM(k) AS BIGINT) AS sk,
                 CAST(SUM(j * k) AS BIGINT) AS sjk,
                 CAST(SUM(j * j) AS BIGINT) AS sj2
          FROM degreed
        )
        SELECT {", ".join(_FINAL)} FROM (
          SELECT COALESCE(m2 // 2, 0) AS m_edges,
                 COALESCE(m2 * sjk - sj * sk, 0) AS num,
                 COALESCE(m2 * sj2 - sj * sj, 0) AS den
          FROM sums
        ) t
    """
