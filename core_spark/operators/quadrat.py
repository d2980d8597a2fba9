"""Quadrat dispersion: variance-to-mean ratio of grid cell counts.

The first-order point-pattern screen (student's index of dispersion;
Greig-Smith 1952 quadrat analysis): partition a bounded window into
N equal cells, count points per cell, and compare the count variance
to the mean. VMR = 1 under complete spatial randomness (Poisson),
VMR >> 1 = clustered (a few cells hoard the mass — the link-farm /
event-burst shape), VMR < 1 = regular/inhibited. It is the O(n)
screen run BEFORE the O(n·density) Ripley's K: one number deciding
whether second-order analysis is worth the pairs.

Exactness (the gini recipe): empty cells matter — the universe size
N = nx*ny is a CLOSED FORM from the window definition, never a scan
— and with T = total points and SUMSQ = sum of squared cell counts
(occupied cells only; empties add zero),

    VMR = (N * SUMSQ - T^2) / (N * T)

num and den are EXACT BIGINTs; vmr is ONE trailing IEEE division
beside them, NULL via integer CASE when the window is empty (T = 0).
Points outside the window are DROPPED but counted and reported
(n_outside) so a mis-sized window is visible, never silent; NULL
coordinates likewise drop into that count's complement (audit
column, no-evidence convention).

Scale shape: ONE uniform hash-agg on the cell key (map-side combine
eats the point stream), ONE global 1-row re-agg, plus a 1-row
conditional count crossJoined — no window, no join, no collect.

Overflow envelope: N*SUMSQ — at 1e6 cells and 3e9 points on one
cell it is past int64; keep N*T^... bound N·max_cell² < 9e18 (1e4
cells × 3e7-point hot cells); past that, coarsen cells.

The DuckDB twin is the INDEPENDENT plan: cell counts densified
against a generate_series universe grid (empties materialized, the
textbook route) with the plain per-cell variance sum — no closed
form.

No reference counterpart (specvital/core has no spatial-statistics
subsystem); the statistic is the classical quadrat VMR.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# identical final projection text on both engines
_FINAL = (
    "CAST(n_cells AS BIGINT) AS n_cells",
    "CAST(n_points AS BIGINT) AS n_points",
    "CAST(n_occupied AS BIGINT) AS n_occupied",
    "CAST(n_outside AS BIGINT) AS n_outside",
    "CAST(sum_sq AS BIGINT) AS sum_sq",
    "CAST(n_cells * sum_sq - n_points * n_points AS BIGINT) AS num",
    "CAST(n_cells * n_points AS BIGINT) AS den",
    "CASE WHEN n_points <> 0 THEN"
    " CAST(n_cells * sum_sq - n_points * n_points AS DOUBLE)"
    " / CAST(n_cells * n_points AS DOUBLE)"
    " END AS vmr",
)


def quadrat_dispersion(
    points: DataFrame,
    lat0: float,
    lon0: float,
    cell: float,
    nx: int,
    ny: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """One row (n_cells, n_points, n_occupied, n_outside, sum_sq, num,
    den, vmr): index of dispersion of the point counts over the
    nx*ny grid of ``cell``-sized quadrats anchored at (lat0, lon0);
    out-of-window or NULL-coordinate points counted in n_outside."""
    cell = float(cell)
    nx, ny = int(nx), int(ny)
    if cell <= 0 or nx < 1 or ny < 1:
        raise ValueError(
            f"quadrat_dispersion: cell must be > 0 and nx/ny >= 1,"
            f" got {cell}, {nx}, {ny}")
    ix = f"CAST(FLOOR(({lat_col} - {float(lat0)!r}) / {cell!r}) AS BIGINT)"
    iy = f"CAST(FLOOR(({lon_col} - {float(lon0)!r}) / {cell!r}) AS BIGINT)"
    base = points.selectExpr(
        f"CASE WHEN {lat_col} IS NOT NULL AND {lon_col} IS NOT NULL"
        f" AND {ix} >= 0 AND {ix} < {nx}"
        f" AND {iy} >= 0 AND {iy} < {ny}"
        f" THEN {ix} * {ny} + {iy} END AS _cell"
    )
    per = (
        base.where("_cell IS NOT NULL")
        .groupBy("_cell")
        .agg(F.count("*").cast("long").alias("c"))
    )
    stats = per.agg(
        F.expr("CAST(COALESCE(SUM(c), 0) AS BIGINT)").alias("n_points"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_occupied"),
        F.expr("CAST(COALESCE(SUM(c * c), 0) AS BIGINT)").alias("sum_sq"),
    )
    outside = base.agg(F.expr(
        "CAST(SUM(CASE WHEN _cell IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
    ).alias("_out"))
    return (
        stats.crossJoin(F.broadcast(outside))
        .selectExpr(
            f"CAST({nx * ny} AS BIGINT) AS n_cells",
            "n_points", "n_occupied",
            "COALESCE(_out, 0) AS n_outside", "sum_sq")
        .selectExpr(*_FINAL)
    )


def sql_quadrat_dispersion(
    points_sql: str,
    lat0: float,
    lon0: float,
    cell: float,
    nx: int,
    ny: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> str:
    """DuckDB twin via the INDEPENDENT textbook plan: the cell
    universe materialized from generate_series (empties included, no
    closed form), per-cell counts left-joined on, plain sums; same
    final projection text. ``points_sql`` must yield (lat, lon)."""
    cell = float(cell)
    nx, ny = int(nx), int(ny)
    ix = f"CAST(FLOOR(({lat_col} - {float(lat0)!r}) / {cell!r}) AS BIGINT)"
    iy = f"CAST(FLOOR(({lon_col} - {float(lon0)!r}) / {cell!r}) AS BIGINT)"
    return f"""
        WITH base AS (
          SELECT CASE WHEN {lat_col} IS NOT NULL AND {lon_col} IS NOT NULL
                       AND {ix} >= 0 AND {ix} < {nx}
                       AND {iy} >= 0 AND {iy} < {ny}
                      THEN {ix} * {ny} + {iy} END AS cell
          FROM ({points_sql}) s
        ),
        per AS (
          SELECT cell, CAST(COUNT(*) AS BIGINT) AS c
          FROM base WHERE cell IS NOT NULL GROUP BY cell
        ),
        uni AS (
          SELECT CAST(gx.x AS BIGINT) * {ny} + CAST(gy.y AS BIGINT)
                   AS cell
          FROM generate_series(0, {nx - 1}) gx(x),
               generate_series(0, {ny - 1}) gy(y)
        ),
        dense AS (
          SELECT uni.cell, COALESCE(per.c, 0) AS c
          FROM uni LEFT JOIN per ON per.cell = uni.cell
        ),
        stats AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
                 CAST(SUM(c) AS BIGINT) AS n_points,
                 CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_occupied,
                 CAST(SUM(c * c) AS BIGINT) AS sum_sq
          FROM dense
        ),
        outside AS (
          SELECT CAST(COALESCE(
                   SUM(CASE WHEN cell IS NULL THEN 1 ELSE 0 END), 0)
                 AS BIGINT) AS n_outside
          FROM base
        )
        SELECT {", ".join(_FINAL)} FROM stats, outside
    """
