"""Ring validity: detect self-intersecting polygon rings before PIP.

Every downstream consumer of the polygon directory — pip.py's
ray-casting, polyarea's shoelace, zonal reverse rollups — silently
assumes SIMPLE rings (OGC "no self-intersection"). A bowtie ring makes
ray-casting parity lie and shoelace area cancel; real-world boundary
data violates simplicity constantly (topology errors, duplicated
vertices, doubled-back spikes). This operator is the validity gate:
per ring, count edge-pair violations and report valid = (violations
= 0), so bad geometry is quarantined as DATA (the error-as-data
convention) instead of corrupting joins downstream.

Semantics (the OGC simple-ring subset that edge pairs can decide):

- non-adjacent edge pairs must not intersect AT ALL (closed CLRS
  orientation battery — segjoin's predicate, reused verbatim);
- adjacent pairs (consecutive edges, including the closing wrap) share
  exactly one vertex by construction; they violate iff either
  NON-SHARED endpoint lies on the other edge (collinear + bbox — the
  doubled-back spike / zero-width sliver / repeated-vertex cases).

Input contract: a FLAT vertex table (ring_id, pos, x, y) with 0-based
``pos`` and NO closing duplicate (the wrap edge v_{m-1} -> v_0 is
implicit); coordinates BIGINT-valued (the hull/segjoin fixed-point
contract), so every test is exact integer arithmetic. Rings with
fewer than 3 vertices are degenerate and reported invalid with
violations = -1 (not an edge-pair count).

Scale shape: rings are SMALL (boundary polygons, not corpora), so the
within-ring all-pairs join is per-key quadratic in ring size but the
DISTRIBUTED axis is the ring directory — edges explode map-side from
the vertex table (one lead() window per ring, the same clustering the
pair join then uses, so ONE shuffle total), the pair join is an
equi-join on ring_id, and a hash-agg per ring finishes. A
survey-precision monster ring (10^5 vertices) is one hot key —
pre-simplify with simplify.py (PLANS §69) or split at that scale; the
docstring is the knob.

The DuckDB twin shares the predicate text (the predicate IS the spec)
but none of the plan — no window, edges enumerated by position
self-join — and the pytest battery gates the geometry against
hand-constructed valid/invalid rings plus a hypothesis fuzz against a
Python model.

No reference counterpart (specvital/core has no geometry subsystem);
the semantics are the OGC Simple Features ring-simplicity rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from core_spark.plans.materialize import pin

# closed segment-intersection battery on (a_*, b_*) edge columns —
# identical to segjoin's, restated here on the polyvalid column names
_D = {
    "_d1": "(b_x2 - b_x1) * (a_y1 - b_y1) - (b_y2 - b_y1) * (a_x1 - b_x1)",
    "_d2": "(b_x2 - b_x1) * (a_y2 - b_y1) - (b_y2 - b_y1) * (a_x2 - b_x1)",
    "_d3": "(a_x2 - a_x1) * (b_y1 - a_y1) - (a_y2 - a_y1) * (b_x1 - a_x1)",
    "_d4": "(a_x2 - a_x1) * (b_y2 - a_y1) - (a_y2 - a_y1) * (b_x2 - a_x1)",
}

_CROSSES = (
    "((_d1 > 0 AND _d2 < 0) OR (_d1 < 0 AND _d2 > 0))"
    " AND ((_d3 > 0 AND _d4 < 0) OR (_d3 < 0 AND _d4 > 0))"
    " OR (_d1 = 0 AND least(b_x1, b_x2) <= a_x1 AND a_x1 <= greatest(b_x1, b_x2)"
    "      AND least(b_y1, b_y2) <= a_y1 AND a_y1 <= greatest(b_y1, b_y2))"
    " OR (_d2 = 0 AND least(b_x1, b_x2) <= a_x2 AND a_x2 <= greatest(b_x1, b_x2)"
    "      AND least(b_y1, b_y2) <= a_y2 AND a_y2 <= greatest(b_y1, b_y2))"
    " OR (_d3 = 0 AND least(a_x1, a_x2) <= b_x1 AND b_x1 <= greatest(a_x1, a_x2)"
    "      AND least(a_y1, a_y2) <= b_y1 AND b_y1 <= greatest(a_y1, a_y2))"
    " OR (_d4 = 0 AND least(a_x1, a_x2) <= b_x2 AND b_x2 <= greatest(a_x1, a_x2)"
    "      AND least(a_y1, a_y2) <= b_y2 AND b_y2 <= greatest(a_y1, a_y2))"
)


def _on_seg(px, py, ax, ay, bx, by) -> str:
    """SQL: point strictly-or-boundary on the closed segment AB."""
    return (
        f"(({bx} - {ax}) * ({py} - {ay}) - ({by} - {ay}) * ({px} - {ax}) = 0"
        f" AND least({ax}, {bx}) <= {px} AND {px} <= greatest({ax}, {bx})"
        f" AND least({ay}, {by}) <= {py} AND {py} <= greatest({ay}, {by}))"
    )


#: adjacent pair (a followed by b, shared vertex a_end == b_start):
#: violation iff b's far end lies on a, or a's far end lies on b
_ADJ_VIOLATION = (
    _on_seg("b_x2", "b_y2", "a_x1", "a_y1", "a_x2", "a_y2")
    + " OR "
    + _on_seg("a_x1", "a_y1", "b_x1", "b_y1", "b_x2", "b_y2")
)


def validate_rings(vertices: DataFrame, key: str = "ring_id") -> DataFrame:
    """(ring_id, n_vertices, violations, valid) per ring.

    ``vertices``: (ring_id, pos, x, y), 0-based ``pos``, no closing
    duplicate, BIGINT-valued coordinates. Rings with < 3 vertices OR
    any NULL vertex field report violations = -1, valid = false — a
    positional row is NOT independently droppable (dropping one would
    re-adjacency the survivors and silently reshape the ring), so a
    NULL anywhere quarantines the whole ring.
    """
    raw = pin(
        vertices.selectExpr(
            f"{key} AS rid", "CAST(pos AS BIGINT) AS pos",
            "CAST(x AS BIGINT) AS x", "CAST(y AS BIGINT) AS y",
        ).where("rid IS NOT NULL")
    )
    sizes = raw.groupBy("rid").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.expr(
            "CASE WHEN pos IS NULL OR x IS NULL OR y IS NULL"
            " THEN 1 ELSE 0 END")).alias("_nulls"),
    )
    v = raw.join(sizes.where("_nulls = 0").select("rid"), "rid")
    # edges via one lead() window per ring (the wrap edge closes with
    # first_value); the window clustering IS the pair join's clustering
    from pyspark.sql import Window

    w = Window.partitionBy("rid").orderBy("pos")
    edges = (
        v.withColumn("_nx", F.lead("x").over(w))
        .withColumn("_ny", F.lead("y").over(w))
        .withColumn("_fx", F.first("x").over(
            w.rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing)))
        .withColumn("_fy", F.first("y").over(
            w.rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing)))
        .selectExpr(
            "rid", "pos AS i", "x AS ex1", "y AS ey1",
            "coalesce(_nx, _fx) AS ex2", "coalesce(_ny, _fy) AS ey2",
        )
    )
    edges = pin(edges.join(sizes, "rid").where("m >= 3"))
    a = edges.selectExpr("rid", "m", "i AS ai", "ex1 AS a_x1",
                         "ey1 AS a_y1", "ex2 AS a_x2", "ey2 AS a_y2")
    b = edges.selectExpr("rid", "i AS bi", "ex1 AS b_x1",
                         "ey1 AS b_y1", "ex2 AS b_x2", "ey2 AS b_y2")
    pairs = a.join(b, "rid").where("ai < bi")
    stepped = pairs.selectExpr(
        "*", *[f"{e} AS {c}" for c, e in _D.items()]
    )
    # pair classes: consecutive (bi = ai+1), wrap (ai = 0, bi = m-1,
    # where edge m-1 PRECEDES edge 0 around the ring), else non-adjacent
    viol = (
        "CASE"
        f" WHEN bi = ai + 1 AND NOT (ai = 0 AND bi = m - 1) THEN ({_ADJ_VIOLATION})"
        f" WHEN ai = 0 AND bi = m - 1 THEN ("
        # roles swap: edge b(m-1) is followed by edge a(0)
        + _on_seg("a_x2", "a_y2", "b_x1", "b_y1", "b_x2", "b_y2")
        + " OR "
        + _on_seg("b_x1", "b_y1", "a_x1", "a_y1", "a_x2", "a_y2")
        + ")"
        f" ELSE ({_CROSSES}) END"
    )
    counted = (
        stepped.selectExpr("rid", f"CASE WHEN {viol} THEN 1 ELSE 0 END AS _v")
        .groupBy("rid").agg(F.sum("_v").alias("violations"))
    )
    return (
        sizes.join(counted, "rid", "left_outer")
        .selectExpr(
            "rid AS ring_id", "m AS n_vertices",
            "CASE WHEN m < 3 OR _nulls > 0 THEN -1L"
            " ELSE coalesce(violations, 0L) END AS violations",
            "m >= 3 AND _nulls = 0"
            " AND coalesce(violations, 0L) = 0 AS valid",
        )
    )


def sql_validate_rings(vertices_sql: str, key: str = "ring_id") -> str:
    """DuckDB twin: edges by position self-join (no window), same
    predicate text — the predicate IS the spec; the plans differ."""
    adj = _ADJ_VIOLATION
    wrap = (
        _on_seg("a_x2", "a_y2", "b_x1", "b_y1", "b_x2", "b_y2")
        + " OR "
        + _on_seg("b_x1", "b_y1", "a_x1", "a_y1", "a_x2", "a_y2")
    )
    d_cols = ",\n         ".join(f"{e} AS {c}" for c, e in _D.items())
    return f"""
WITH rawv AS (
  SELECT {key} AS rid, CAST(pos AS BIGINT) AS pos,
         CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y
  FROM ({vertices_sql})
  WHERE {key} IS NOT NULL
),
sizes AS (
  SELECT rid, CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(CASE WHEN pos IS NULL OR x IS NULL OR y IS NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS _nulls
  FROM rawv GROUP BY rid
),
verts AS (
  SELECT rawv.* FROM rawv
  JOIN sizes USING (rid) WHERE sizes._nulls = 0
),
edges AS (
  SELECT v.rid, v.pos AS i, v.x AS ex1, v.y AS ey1,
         COALESCE(n.x, f.x) AS ex2, COALESCE(n.y, f.y) AS ey2, s.m
  FROM verts v
  JOIN sizes s ON s.rid = v.rid AND s.m >= 3
  LEFT JOIN verts n ON n.rid = v.rid AND n.pos = v.pos + 1
  JOIN verts f ON f.rid = v.rid AND f.pos = 0
),
pairs AS (
  SELECT a.rid, a.m, a.i AS ai, b.i AS bi,
         a.ex1 AS a_x1, a.ey1 AS a_y1, a.ex2 AS a_x2, a.ey2 AS a_y2,
         b.ex1 AS b_x1, b.ey1 AS b_y1, b.ex2 AS b_x2, b.ey2 AS b_y2
  FROM edges a JOIN edges b ON a.rid = b.rid AND a.i < b.i
),
stepped AS (
  SELECT *,
         {d_cols}
  FROM pairs
),
counted AS (
  SELECT rid, CAST(SUM(CASE WHEN
    CASE
      WHEN bi = ai + 1 AND NOT (ai = 0 AND bi = m - 1) THEN ({adj})
      WHEN ai = 0 AND bi = m - 1 THEN ({wrap})
      ELSE ({_CROSSES})
    END
  THEN 1 ELSE 0 END) AS BIGINT) AS violations
  FROM stepped GROUP BY rid
)
SELECT s.rid AS ring_id, s.m AS n_vertices,
       CASE WHEN s.m < 3 OR s._nulls > 0 THEN CAST(-1 AS BIGINT)
            ELSE COALESCE(c.violations, 0) END AS violations,
       (s.m >= 3 AND s._nulls = 0
        AND COALESCE(c.violations, 0) = 0) AS valid
FROM sizes s LEFT JOIN counted c ON c.rid = s.rid
"""
