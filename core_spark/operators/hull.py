"""Distributed convex hull: two-phase monotone chain over integer points.

The convex hull is the footprint primitive — coverage extents for a
crawl's geotagged documents, bounding polygons for point clusters
(DBSCAN output), and the first step of spatial summaries ("what region
does this corpus cover?"). The sequential textbook answer is Andrew's
monotone chain (O(n log n)); the distributed shape exploits one fact:

    hull(S) = hull( union of hull(P_i) )  for any partition {P_i} of S

so each partition reduces its points to its LOCAL hull (at most a few
dozen vertices for lattice-like data, O(n^(1/3)) expected for random
points), and only those survivors meet in a single final chain. The
reduction is enormous — a 100-TB point corpus becomes a few thousand
candidate vertices after phase 1 — and phase 2 is a tiny single-task
pass over a repartition(1) shuffle of those survivors (repartition,
not coalesce: coalesce(1) would collapse the WHOLE upstream scan into
one task; the shuffle boundary keeps phase 1 parallel).

Plan shape:

1. hygiene + DISTINCT: NULL coordinates dropped, duplicate points
   collapsed in one hash-agg (duplicates contribute nothing to a hull
   and would only inflate phase-1 batches);
2. phase 1 — per-batch local hull: ONE ``mapInArrow`` stage running
   the monotone chain on each Arrow batch (a batch's local hull is a
   superset-reduction: any global hull vertex in the batch survives);
3. phase 2 — ``repartition(1)`` + a second ``mapInArrow`` that drains
   the full candidate iterator and emits the final hull with a CCW
   ``pos`` index starting at the lexicographically smallest vertex.

Exactness: coordinates are BIGINT by contract (callers fixed-point
scale doubles; the fixtures are integer lattices) and the kernel runs
on Python ints, so every orientation test ``cross(o, a, b)`` is exact
arbitrary-precision arithmetic — no epsilon, no float collinearity
ambiguity, bit-identical across engines and cluster runs. The chain
pops on ``cross <= 0``: collinear points interior to a hull edge are
NOT vertices (strict hull), matching the oracle's definition below.

Degenerate inputs follow the vertex definition ``p is a hull vertex
iff p not in conv(S \\ {p})``: a single point is its own hull, two
points are both vertices, an all-collinear set keeps exactly its two
endpoints.

The DuckDB oracle is an INDEPENDENT algorithm — Caratheodory's theorem
in the plane: ``p in conv(S \\ {p})`` iff p lies in a closed triangle
of three other points (non-degenerate sign test) or strictly within a
segment of two other points (the degenerate-triangle arm). That is an
O(n^4) NOT EXISTS over the deduped point set — honest at fixture scale
(the lattice fixture bounds distinct points by a modulus, so the
oracle's cost is SF-invariant) and structurally unrelated to the
chain, so the gate checks the geometry itself, not a reimplementation.

No reference counterpart (specvital/core has no spatial subsystem);
the algorithm is the published Andrew 1979 monotone chain with the
standard hull-of-local-hulls distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _chain(pts: list) -> list:
    """Monotone chain over sorted unique (x, y) int tuples -> CCW hull
    vertices starting at the lexicographically smallest point. Strict
    turns only (collinear edge-interior points excluded)."""
    n = len(pts)
    if n <= 2:
        return list(pts)

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    # all-collinear: both chains reduce to the two endpoints
    if len(lower) == 2 and len(upper) == 2:
        return lower
    return lower[:-1] + upper[:-1]


def _local_hull(batch_pts: list) -> list:
    """Superset-reduction for one Arrow batch: its local hull."""
    return _chain(sorted(set(batch_pts)))


def convex_hull(df: DataFrame, x: str = "x", y: str = "y") -> DataFrame:
    """CCW convex hull vertices of the (x, y) BIGINT point set.

    Output columns: ``pos`` (0-based CCW index from the lex-min
    vertex), ``x``, ``y``. Empty input yields an empty result with the
    stable schema.
    """
    pts = (
        df.where(f"{x} IS NOT NULL AND {y} IS NOT NULL")
        .selectExpr(f"CAST({x} AS BIGINT) AS x", f"CAST({y} AS BIGINT) AS y")
        .distinct()
    )

    cand_schema = "x bigint, y bigint"

    def phase1(batches):
        import pyarrow as pa

        out_schema = pa.schema([("x", pa.int64()), ("y", pa.int64())])
        for batch in batches:
            rows = batch.to_pylist()
            hull = _local_hull([(r["x"], r["y"]) for r in rows])
            yield pa.RecordBatch.from_pylist(
                [{"x": px, "y": py} for px, py in hull], schema=out_schema
            )

    final_schema = "pos int, x bigint, y bigint"

    def phase2(batches):
        import pyarrow as pa

        out_schema = pa.schema(
            [("pos", pa.int32()), ("x", pa.int64()), ("y", pa.int64())]
        )
        acc = set()
        for batch in batches:
            for r in batch.to_pylist():
                acc.add((r["x"], r["y"]))
        hull = _chain(sorted(acc))
        yield pa.RecordBatch.from_pylist(
            [{"pos": i, "x": px, "y": py} for i, (px, py) in enumerate(hull)],
            schema=out_schema,
        )

    return (
        pts.mapInArrow(phase1, cand_schema)
        .repartition(1)
        .mapInArrow(phase2, final_schema)
    )


def sql_convex_hull(src: str) -> str:
    """DuckDB twin: hull VERTEX SET via Caratheodory (independent of the
    chain). ``src`` must project columns x, y; output is the vertex set
    (x, y BIGINT) — the CCW ``pos`` is gated by pytest, not the oracle
    (order is a presentation concern; the driver compare is
    order-insensitive anyway)."""
    return f"""
WITH pts AS (
  SELECT DISTINCT CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y
  FROM ({src})
  WHERE x IS NOT NULL AND y IS NOT NULL
)
SELECT p.x AS x, p.y AS y
FROM pts p
WHERE NOT EXISTS (
  -- segment arm: p strictly interior to a segment of two other points
  -- (collinear + inside the bbox; p differs from both endpoints, so
  -- bbox containment IS strict betweenness on the line)
  SELECT 1 FROM pts a, pts b
  WHERE (a.x <> p.x OR a.y <> p.y) AND (b.x <> p.x OR b.y <> p.y)
    AND (a.x - p.x) * (b.y - p.y) - (a.y - p.y) * (b.x - p.x) = 0
    AND LEAST(a.x, b.x) <= p.x AND p.x <= GREATEST(a.x, b.x)
    AND LEAST(a.y, b.y) <= p.y AND p.y <= GREATEST(a.y, b.y)
)
AND NOT EXISTS (
  -- triangle arm: p inside-or-on a NON-degenerate triangle of three
  -- other points (all three edge orientations share a sign, zeros ok)
  SELECT 1 FROM pts a, pts b, pts c
  WHERE (a.x <> p.x OR a.y <> p.y) AND (b.x <> p.x OR b.y <> p.y)
    AND (c.x <> p.x OR c.y <> p.y)
    AND (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x) <> 0
    AND (
      ( (b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x) >= 0
        AND (c.x - b.x) * (p.y - b.y) - (c.y - b.y) * (p.x - b.x) >= 0
        AND (a.x - c.x) * (p.y - c.y) - (a.y - c.y) * (p.x - c.x) >= 0 )
      OR
      ( (b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x) <= 0
        AND (c.x - b.x) * (p.y - b.y) - (c.y - b.y) * (p.x - b.x) <= 0
        AND (a.x - c.x) * (p.y - c.y) - (a.y - c.y) * (p.x - c.x) <= 0 )
    )
)
ORDER BY x, y
"""
