"""2-D Pareto front (skyline) — the not-dominated-by-anyone query.

"Best hosts by quality AND coverage", "cheapest AND freshest crawl
per URL" — multi-objective shortlists are skyline queries: keep every
row no other row beats on both axes (Börzsönyi et al. 2001). Top-k
collapses two objectives into one score and silently buries the
trade-off curve; the skyline IS the curve.

Dominance (maximize both; callers negate an axis to minimize):
q dominates p  ⇔  x_q >= x_p ∧ y_q >= y_p ∧ (x_q > x_p ∨ y_q > y_p).
Duplicated (x, y) points do NOT dominate each other — both survive.

The 2-D windowed plan (integer axes): sorted by x, a point is
dominated iff

    max_y over STRICTLY GREATER x  >=  y      (term 1)
 or max_y over EQUAL x             >   y      (term 2)

— term 1 is a RANGE frame (1 FOLLOWING .. UNBOUNDED FOLLOWING; value
offsets need integer axes, which the exactness discipline supplies
anyway) and term 2 a PARTITION BY x max. Both windows share the x
ordering; all comparisons BIGINT; verdict flag-style BIGINT 1/0
(§116).

Scale shape: the global ORDER BY window serializes one pass — fine
to ~10^8 rows on one task's sort budget but a bottleneck past it.
The documented at-scale path: skyline is a CONTRACTION (the skyline
of a union ⊆ union of skylines), so shard by x-stripes, take local
skylines map-side (this same operator), and re-run on the tiny
union — two passes, no accuracy loss. The DuckDB twin is the
INDEPENDENT O(n²)-shaped NOT EXISTS anti-join straight off the
dominance definition, so the windowed algebra is what the oracle
gates.

No reference counterpart; the operator is the published SKYLINE OF
formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pareto_front(
    rows: DataFrame,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Rows (id, x, y, is_pareto): every input row with its BIGINT
    1/0 skyline verdict under maximize-both dominance; NULL axes
    dropped on ingest (an unranked row can neither win nor lose)."""
    v = rows.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).selectExpr(
        f"{id_col} AS id", f"CAST({x_col} AS BIGINT) AS x",
        f"CAST({y_col} AS BIGINT) AS y",
    )
    w_gt = (
        Window.orderBy("x")
        .rangeBetween(1, Window.unboundedFollowing)
    )
    w_eq = Window.partitionBy("x")
    return (
        v.select(
            "id", "x", "y",
            F.max("y").over(w_gt).alias("_mgt"),
            F.max("y").over(w_eq).alias("_meq"),
        )
        .selectExpr(
            "id", "x", "y",
            "CAST(NOT ((_mgt IS NOT NULL AND _mgt >= y)"
            " OR _meq > y) AS BIGINT) AS is_pareto",
        )
    )


def sql_pareto_front(
    rows_sql: str,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> str:
    """DuckDB twin: the dominance definition verbatim as NOT EXISTS —
    a fully independent plan (no windows)."""
    return f"""
        WITH sk_v AS (
            SELECT {id_col} AS id, CAST({x_col} AS BIGINT) AS x,
                   CAST({y_col} AS BIGINT) AS y
            FROM ({rows_sql}) s
            WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
        )
        SELECT p.id, p.x, p.y,
               CAST(NOT EXISTS (
                   SELECT 1 FROM sk_v q
                   WHERE q.x >= p.x AND q.y >= p.y
                     AND (q.x > p.x OR q.y > p.y)
               ) AS BIGINT) AS is_pareto
        FROM sk_v p
    """
