"""Distributed triangle counting with degree-ordered edge orientation.

Triangles are the atomic unit of graph cohesion — local clustering
coefficients, community pre-filters, and link-spam heuristics all start
from per-node triangle counts over the host link graph (the same edge
tables linkgraph.py ranks with PageRank/HITS). The naive plan — join
edges on a shared endpoint and probe the closing edge — dies on skew:
a mega-hub with degree d fans out to d·(d-1)/2 wedge candidates, which
at web scale is THE "curse of the last reducer" (Suri & Vassilvitskii,
WWW 2011: one reducer holding the biggest hub runs for hours while the
rest idle).

The fix is the standard one (Suri-Vassilvitskii node-iterator++ /
Latapy's compact-forward): orient every edge from its lower endpoint to
its higher endpoint under the TOTAL order (degree, node id). The
oriented graph is a DAG whose out-degree is bounded by O(sqrt(m))
regardless of hub size — a degree-d hub mostly RECEIVES edges (its
neighbors are almost all lower-degree, so the hub orders above them),
and wedge generation fans out from the low-degree end only. Each
triangle {x, y, z} then appears exactly once: with x < y < z in the
order, the wedge is generated at x (edges x→y, x→z) and closed by the
oriented edge y→z — no triple-counting, no global dedup.

Plan shape (all uniform-key equi-joins, never a cartesian):

1. canonicalize: drop NULLs/self-loops, least/greatest + DISTINCT →
   simple undirected edges (one hash-agg);
2. degrees: endpoint explode → hash-agg;
3. orient: two joins against the degree table, keep the dst's order
   key (degree, id) ON the oriented row so wedge comparison needs no
   third join;
4. wedges: oriented self-join on the source with a struct < guard
   (the pinned-input self-join rule, CLAUDE.md) → (lo, hi) candidate;
5. close: equi-join candidates against oriented edges on (lo, hi);
6. per-node counts: explode the 3 corners of each triangle → hash-agg,
   left join back onto degrees so triangle-free nodes report 0.

The DuckDB oracle is an INDEPENDENT algorithm — the O(m^(3/2))
brute-force triple join on canonical edges with u < v < w — so the
orientation trick itself is what the cross-engine gate verifies.

No reference counterpart (specvital/core has no graph subsystem); the
algorithm is the published Suri-Vassilvitskii / Latapy formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from core_spark.plans.materialize import pin


def canonical_edges(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Simple undirected edge set (u < v): NULL endpoints and self-loops
    dropped, multi-edges collapsed. Output columns (u, v)."""
    return (
        edges.where(f"{src} IS NOT NULL AND {dst} IS NOT NULL"
                    f" AND {src} <> {dst}")
        .selectExpr(
            f"least({src}, {dst}) AS u", f"greatest({src}, {dst}) AS v"
        )
        .distinct()
    )


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node (node, degree, triangles) over the undirected simple
    graph induced by ``edges``. ``degree`` counts distinct neighbors;
    ``triangles`` counts triangles the node participates in (the local
    clustering coefficient's numerator — its denominator is
    degree·(degree-1)/2, left to the caller so every emitted value
    stays integer-exact)."""
    simple = pin(canonical_edges(edges, src, dst))
    degrees = pin(
        simple.selectExpr("u AS node")
        .unionAll(simple.selectExpr("v AS node"))
        .groupBy("node").agg(F.count("*").cast("long").alias("degree"))
    )
    # Orient u→v when (deg_u, u) < (deg_v, v); carry each endpoint's
    # order key so the wedge self-join compares structs locally.
    du = degrees.selectExpr("node AS u", "degree AS du")
    dv = degrees.selectExpr("node AS v", "degree AS dv")
    oriented = pin(
        simple.join(du, "u").join(dv, "v")
        .selectExpr(
            "u", "v",
            "named_struct('d', du, 'n', u) AS ukey",
            "named_struct('d', dv, 'n', v) AS vkey",
        )
        .selectExpr(
            "CASE WHEN ukey < vkey THEN u ELSE v END AS a",
            "CASE WHEN ukey < vkey THEN v ELSE u END AS b",
            "CASE WHEN ukey < vkey THEN vkey ELSE ukey END AS bkey",
        )
    )
    w1 = oriented.selectExpr("a", "b AS lo", "bkey AS lokey")
    w2 = oriented.selectExpr("a", "b AS hi", "bkey AS hikey")
    wedges = w1.join(w2, "a").where("lokey < hikey")
    closing = oriented.selectExpr("a AS lo", "b AS hi")
    tris = wedges.join(closing, ["lo", "hi"]).select("a", "lo", "hi")
    per_node = (
        tris.select(
            F.explode(F.array("a", "lo", "hi")).alias("node")
        )
        .groupBy("node").agg(F.count("*").cast("long").alias("t"))
    )
    return (
        degrees.join(per_node, "node", "left")
        .selectExpr(
            "node", "degree", "CAST(coalesce(t, 0) AS BIGINT) AS triangles"
        )
    )


def sql_triangle_counts(edges_sql: str) -> str:
    """DuckDB twin via the INDEPENDENT brute-force plan: canonical
    edges u < v, triangles as the ordered triple join (a,b)(b,c)(a,c)
    — each triangle materializes exactly once with a < b < c, no
    orientation anywhere. ``edges_sql`` must yield columns (src, dst)."""
    return f"""
        WITH raw AS ({edges_sql}),
        canon AS (
          SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
          FROM raw
          WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
        ),
        deg AS (
          SELECT node, COUNT(*) AS degree FROM (
            SELECT u AS node FROM canon
            UNION ALL SELECT v AS node FROM canon
          ) GROUP BY node
        ),
        tri AS (
          SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM canon e1
          JOIN canon e2 ON e2.u = e1.v
          JOIN canon e3 ON e3.u = e1.u AND e3.v = e2.v
        ),
        pern AS (
          SELECT node, COUNT(*) AS t FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b AS node FROM tri
            UNION ALL SELECT c AS node FROM tri
          ) GROUP BY node
        )
        SELECT d.node AS node, CAST(d.degree AS BIGINT) AS degree,
               CAST(COALESCE(p.t, 0) AS BIGINT) AS triangles
        FROM deg d LEFT JOIN pern p ON p.node = d.node
    """


_LCC = (
    "CASE WHEN degree >= 2 THEN"
    " 2.0 * CAST(triangles AS DOUBLE)"
    " / (CAST(degree AS DOUBLE) * CAST(degree - 1 AS DOUBLE)) END AS lcc"
)


def clustering_coefficients(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(node, degree, triangles, lcc): Watts-Strogatz local clustering
    coefficient 2T/(d(d−1)) per node — the closed-neighborhood density
    triangle_counts leaves to the caller, emitted here as ONE IEEE
    multiply/divide chain over the exact BIGINT fields (identical text
    both engines, so the double is bit-identical; the exact numerator
    and degree ride along for any caller wanting cross-multiplied
    comparisons instead). NULL when degree < 2 (the coefficient is
    undefined, not zero — a leaf is not 'unclustered', it has no
    wedge to close)."""
    return triangle_counts(edges, src, dst).selectExpr(
        "node", "degree", "triangles", _LCC)


def sql_clustering_coefficients(edges_sql: str) -> str:
    """DuckDB twin: the independent brute-force triangle plan + the
    same one projection."""
    return (
        f"SELECT node, degree, triangles, {_LCC}"
        f" FROM ({sql_triangle_counts(edges_sql)}) base"
    )
