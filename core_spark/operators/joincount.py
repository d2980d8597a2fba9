"""Join-count statistics: spatial association for CATEGORICAL surfaces.

Moran/Geary answer "does this NUMBER cluster in space"; join counts
(Moran 1948; Cliff & Ord 1981 ch.1 — historically the first spatial
autocorrelation test) answer it for a BINARY/categorical surface:
over grid cells labeled B or W, count rook-adjacent pairs by type —
BB, WW, BW — and compare BW to its expectation under random labeling
(nonfree sampling):

    E[BW] = 2 J nB nW / (n (n-1))

BW far BELOW expectation = segregation (same-label cells border each
other: language regions, topic enclaves, spam farms); far above =
checkerboard repulsion. The categorical twin the moran family lacks.

Exactness stance: every count is an EXACT BIGINT — adjacency pairs
via two shifted equi-joins (never a distance predicate), label
combinations via integer conditional sums, and the expectation's
num = 2*J*nB*nW / den = n*(n-1) emitted as exact factors. The two
reported doubles (bw_expected, bw_ratio) are each ONE fixed-order
IEEE division beside those factors, NULL via integer comparisons
when a margin is empty (single-label surfaces) or n < 2.

Scale shape: the cell table is pinned once (three consumers) and
joined to itself on (ix+1, iy) and (ix, iy+1) — two uniform equi
shuffles, each qualifying unordered pair enumerated exactly once
(right/down orientation, the mirror-free convention) — then ONE
1-row conditional re-agg crossJoined with the label totals. No
window, no distance math, no collect.

Overflow envelope: 2*J*nB*nW <= n³ fits int64 for n < 2e6 cells;
past that, coarsen the lattice.

The DuckDB twin is the INDEPENDENT plan: one self cross join with
the |dix| + |diy| = 1 distance predicate under a lexicographic
(ix, iy) ordering — distance semantics instead of shift enumeration.

No reference counterpart (specvital/core has no spatial-statistics
subsystem); the statistic is the published join-count formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from core_spark.plans.materialize import pin

# identical final projection text on both engines
_FINAL = (
    "CAST(n_cells AS BIGINT) AS n_cells",
    "CAST(n_b AS BIGINT) AS n_b",
    "CAST(n_w AS BIGINT) AS n_w",
    "CAST(j_pairs AS BIGINT) AS j_pairs",
    "CAST(bb AS BIGINT) AS bb",
    "CAST(ww AS BIGINT) AS ww",
    "CAST(bw AS BIGINT) AS bw",
    "CAST(2 * j_pairs * n_b * n_w AS BIGINT) AS exp_num",
    "CAST(n_cells * (n_cells - 1) AS BIGINT) AS exp_den",
    "CASE WHEN n_cells >= 2 THEN"
    " CAST(2 * j_pairs * n_b * n_w AS DOUBLE)"
    " / CAST(n_cells * (n_cells - 1) AS DOUBLE)"
    " END AS bw_expected",
    "CASE WHEN j_pairs <> 0 AND n_b <> 0 AND n_w <> 0 THEN"
    " (CAST(bw AS DOUBLE) * CAST(n_cells * (n_cells - 1) AS DOUBLE))"
    " / CAST(2 * j_pairs * n_b * n_w AS DOUBLE)"
    " END AS bw_ratio",
)


def join_counts(
    cells: DataFrame,
    ix_col: str = "ix",
    iy_col: str = "iy",
    is_b_col: str = "is_b",
) -> DataFrame:
    """One row (n_cells, n_b, n_w, j_pairs, bb, ww, bw, exp_num,
    exp_den, bw_expected, bw_ratio): rook-adjacency join counts of
    the boolean ``is_b_col`` surface over integer lattice cells;
    duplicate cells are an input error (enforce upstream); NULL
    coordinate/label rows are dropped."""
    base = pin(
        cells.where(
            F.col(ix_col).isNotNull()
            & F.col(iy_col).isNotNull()
            & F.col(is_b_col).isNotNull())
        .selectExpr(
            f"CAST({ix_col} AS BIGINT) AS ix",
            f"CAST({iy_col} AS BIGINT) AS iy",
            f"CASE WHEN {is_b_col} THEN 1L ELSE 0L END AS b",
        )
    )
    totals = base.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_cells"),
        F.expr("CAST(COALESCE(SUM(b), 0) AS BIGINT)").alias("n_b"),
        F.expr("CAST(COALESCE(SUM(1 - b), 0) AS BIGINT)").alias("n_w"),
    )
    right = base.selectExpr("ix + 1 AS ix", "iy", "b AS b2")
    down = base.selectExpr("ix", "iy + 1 AS iy", "b AS b2")
    pairs = (
        base.join(right, ["ix", "iy"]).select("b", "b2")
        .union(base.join(down, ["ix", "iy"]).select("b", "b2"))
    )
    pair_sums = pairs.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("j_pairs"),
        F.expr("CAST(COALESCE(SUM(b * b2), 0) AS BIGINT)").alias("bb"),
        F.expr(
            "CAST(COALESCE(SUM((1 - b) * (1 - b2)), 0) AS BIGINT)"
        ).alias("ww"),
        F.expr(
            "CAST(COALESCE(SUM(b + b2 - 2 * b * b2), 0) AS BIGINT)"
        ).alias("bw"),
    )
    return (
        totals.crossJoin(F.broadcast(pair_sums))
        .selectExpr(*_FINAL)
    )


def sql_join_counts(
    cells_sql: str,
    ix_col: str = "ix",
    iy_col: str = "iy",
    is_b_col: str = "is_b",
) -> str:
    """DuckDB twin via the INDEPENDENT plan: one self cross join with
    the |dix| + |diy| = 1 predicate under lexicographic ordering —
    distance semantics, not shift enumeration; same final projection
    text. ``cells_sql`` must yield (ix, iy, is_b)."""
    return f"""
        WITH c AS (
          SELECT CAST({ix_col} AS BIGINT) AS ix,
                 CAST({iy_col} AS BIGINT) AS iy,
                 CASE WHEN {is_b_col} THEN 1 ELSE 0 END AS b
          FROM ({cells_sql}) s
          WHERE {ix_col} IS NOT NULL AND {iy_col} IS NOT NULL
            AND {is_b_col} IS NOT NULL
        ),
        totals AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
                 CAST(COALESCE(SUM(b), 0) AS BIGINT) AS n_b,
                 CAST(COALESCE(SUM(1 - b), 0) AS BIGINT) AS n_w
          FROM c
        ),
        pair_sums AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS j_pairs,
                 CAST(COALESCE(SUM(p.b * q.b), 0) AS BIGINT) AS bb,
                 CAST(COALESCE(SUM((1 - p.b) * (1 - q.b)), 0) AS BIGINT)
                   AS ww,
                 CAST(COALESCE(SUM(p.b + q.b - 2 * p.b * q.b), 0)
                   AS BIGINT) AS bw
          FROM c p, c q
          WHERE abs(p.ix - q.ix) + abs(p.iy - q.iy) = 1
            AND (p.ix < q.ix OR (p.ix = q.ix AND p.iy < q.iy))
        )
        SELECT {", ".join(_FINAL)} FROM totals, pair_sums
    """
