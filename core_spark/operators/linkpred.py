"""Neighborhood link prediction: common neighbors, Jaccard, resource
allocation — with the inverse-crowd center cap.

The classic "who should be linked" primitives (Liben-Nowell & Kleinberg,
CIKM 2003; Zhou/Lü/Zhang's resource-allocation index, 2009): for every
NON-adjacent node pair (u, v), score the evidence carried by their
common neighbors z. Over the host link graph this surfaces related-site
candidates, navigational gap-filling, and (inverted) link-spam rings —
the prediction flavor the existing graph family (PageRank = importance,
k-core = membership, triangles/lcc = local density) doesn't cover.

Two published insights shape the operator:

- **Hub centers carry no signal** — everything is two hops from a
  portal, so z's contribution should shrink with its degree (the whole
  point of Adamic-Adar / resource allocation). This engine makes the
  extreme of that weighting STRUCTURAL: centers with degree >
  ``max_center_degree`` are dropped before wedge generation — the same
  Crandall-style inverse-crowd rule covisit.py applies to crowded
  buckets, and simultaneously the skew bound: wedge fan-out per center
  is ≤ cap², so the "curse of the last reducer" hub never materializes
  (triangles.py kills it with degree orientation; orientation can't
  help here because BOTH wedge legs are needed per pair, so the cap is
  the honest answer — and at web scale it is also the SEMANTIC answer).
- **Float-free scoring** (the termstats/covisit stance): the
  resource-allocation index Σ 1/deg(z) is emitted FIXED-POINT as
  ``ra_fp = Σ (scale DIV deg(z))`` — an exact BIGINT, order-independent
  under any shuffle, cross-engine comparable with no IEEE summation
  hazard. Jaccard rides as cn/(du+dv−cn): ONE trailing IEEE division
  over exact BIGINTs (identical text both engines), beside its exact
  factors so consumers can cross-multiply instead.

All statistics count CAPPED centers only (cn is "common neighbors
through non-hub centers"); du/dv are FULL degrees. Pairs whose entire
common neighborhood is capped hubs vanish — by design, they have no
admissible evidence.

Plan shape: canonical edges (reused from triangles.py) → symmetric
adjacency → one degree hash-agg → center-keyed wedge self-join (pinned;
CLAUDE.md self-join rule) bounded by the cap → one pair hash-agg →
LEFT ANTI against existing edges → two degree joins. All uniform-key
equi shuffles, zero Python, never a cartesian.

The DuckDB oracle is an INDEPENDENT algorithm — per-node neighbor LISTS
+ brute-force non-adjacent pair enumeration + list_intersect set
algebra — so the wedge-join plan and the cap placement are what the
cross-engine gate verifies.

No reference counterpart (specvital/core has no graph subsystem); the
scores are the published Liben-Nowell/Kleinberg + Zhou-Lü-Zhang
formulations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from core_spark.operators.triangles import canonical_edges
from core_spark.plans.materialize import pin

_JACCARD = (
    "CAST(cn AS DOUBLE)"
    " / (CAST(du AS DOUBLE) + CAST(dv AS DOUBLE) - CAST(cn AS DOUBLE))"
    " AS jaccard"
)


def link_predictions(
    edges: DataFrame,
    max_center_degree: int,
    scale: int = 1_000_000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(u, v, cn, du, dv, ra_fp, jaccard) for every NON-adjacent pair
    u < v with at least one common neighbor of degree <=
    ``max_center_degree``. cn / ra_fp count capped centers only;
    du / dv are full degrees; ra_fp = Σ (scale DIV deg(z)) exact."""
    cap = int(max_center_degree)
    scale = int(scale)
    if cap < 1 or scale < 1:
        raise ValueError(
            f"link_predictions: max_center_degree and scale must be"
            f" >= 1, got {max_center_degree}, {scale}")
    simple = pin(canonical_edges(edges, src, dst))
    sym = simple.selectExpr("u AS z", "v AS x").unionAll(
        simple.selectExpr("v AS z", "u AS x"))
    degrees = pin(
        sym.groupBy("z").agg(F.count("*").cast("long").alias("degree")))
    centers = pin(
        sym.join(
            degrees.where(f"degree <= {cap}")
            .selectExpr("z", f"CAST({scale} DIV degree AS BIGINT) AS _w"),
            "z",
        )
    )
    scored = (
        centers.selectExpr("z", "x AS u", "_w")
        .join(centers.selectExpr("z", "x AS v"), "z")
        .where("u < v")
        .groupBy("u", "v")
        .agg(F.count("*").cast("long").alias("cn"),
             F.sum("_w").cast("long").alias("ra_fp"))
    )
    cand = scored.join(simple, ["u", "v"], "left_anti")
    return (
        cand.join(degrees.selectExpr("z AS u", "degree AS du"), "u")
        .join(degrees.selectExpr("z AS v", "degree AS dv"), "v")
        .selectExpr("u", "v", "cn", "du", "dv", "ra_fp", _JACCARD)
    )


def sql_link_predictions(
    edges_sql: str,
    max_center_degree: int,
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin via the INDEPENDENT plan: per-node neighbor lists,
    brute-force non-adjacent pair enumeration, list_intersect common
    neighborhoods, cap applied on the unnested membership — no wedge
    join anywhere. ``edges_sql`` must yield columns (src, dst)."""
    cap = int(max_center_degree)
    scale = int(scale)
    return f"""
        WITH raw AS ({edges_sql}),
        canon AS (
          SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
          FROM raw
          WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
        ),
        sym AS (
          SELECT u AS z, v AS x FROM canon
          UNION ALL SELECT v AS z, u AS x FROM canon
        ),
        deg AS (
          SELECT z AS node, COUNT(*) AS degree FROM sym GROUP BY z
        ),
        nbrs AS (
          SELECT z AS node, LIST(x) AS ns FROM sym GROUP BY z
        ),
        pairs AS (
          SELECT n1.node AS u, n2.node AS v,
                 LIST_INTERSECT(n1.ns, n2.ns) AS common
          FROM nbrs n1, nbrs n2
          WHERE n1.node < n2.node
            AND NOT EXISTS (SELECT 1 FROM canon c
                            WHERE c.u = n1.node AND c.v = n2.node)
        ),
        flat AS (
          SELECT pairs.u, pairs.v, UNNEST(pairs.common) AS z FROM pairs
        ),
        scored AS (
          SELECT f.u, f.v, CAST(COUNT(*) AS BIGINT) AS cn,
                 CAST(SUM({scale} // d.degree) AS BIGINT) AS ra_fp
          FROM flat f JOIN deg d ON d.node = f.z
          WHERE d.degree <= {cap}
          GROUP BY f.u, f.v
        )
        SELECT s.u, s.v, s.cn,
               CAST(dl.degree AS BIGINT) AS du,
               CAST(dr.degree AS BIGINT) AS dv,
               s.ra_fp, {_JACCARD}
        FROM scored s
        JOIN deg dl ON dl.node = s.u
        JOIN deg dr ON dr.node = s.v
    """
