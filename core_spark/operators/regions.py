"""Contiguous-region labeling: the raster dissolve.

Given the raster density grid, label each connected blob of ACTIVE
cells (count >= ``min_count``, rook/4-connectivity) with one region
id and its size — raster connected-component labeling, the GIS
"dissolve"/"region group" operation. The footprint primitive between
``hull.py`` (one global outline) and ``dbscan`` (point-level density
clusters): regions operate on the ALREADY-GRIDDED surface, so the
expensive step is two cell-level passes over a table that is orders
of magnitude smaller than the points.

Plan shape — everything composes from audited primitives:
``moran.cell_counts`` (one uniform hash-agg over the points) →
activity cut → ``moran._rook_pairs`` (map-side ×4 shifted-key explode
+ ONE uniform equi shuffle — the same adjacency plan all four ESDA
statistics share; the non-equi |Δ|=1 join the ORACLE runs is a
cartesian at scale) → ``dedup.connected_components`` (Kiveris
large/small-star, O(log n) rounds, pinned per round) → label join
back, isolated active cells keeping their own id. Region sizes
(cells, point mass) ride one window over the region id — bounded by
the region count, not the points.

Cell ids pack into one BIGINT as (cx + B)·2B + (cy + B), B = 2^21 —
valid for any degree-grid resolution down to ~1e-4° globally; cells
outside the packable range are refused loudly (a silent drop would
unlabel a region edge). Everything compared is BIGINT; no floats
anywhere.

The DuckDB twin is the INDEPENDENT algorithm end to end: non-equi
|dx|+|dy|=1 adjacency (no explode) + recursive-CTE min-label closure
(label propagation, not star contraction) — the dbscan.py gating
convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from core_spark.operators.dedup import connected_components
from core_spark.operators.moran import _rook_pairs, cell_counts
from core_spark.plans.materialize import pin

_B = 1 << 21
_PACK = f"(cx + {_B}) * {2 * _B} + (cy + {_B})"


def regionize(
    df: DataFrame,
    cell: float,
    min_count: int = 1,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """(cx, cy, x, region, region_cells, region_mass): per active cell
    its point count, the region label (min packed cell id reachable),
    and the region's cell/point totals."""
    m = int(min_count)
    if m < 1:
        raise ValueError(f"regionize: min_count must be >= 1, got {min_count}")
    cells = cell_counts(df, cell, lat=lat_col, lon=lon_col).where(
        F.col("x") >= m)
    # refuse unpackable indices IN the plan (lazy, distributed — no extra
    # driver job); the twin needs no guard, its inputs are generated
    guard = (
        f"CASE WHEN abs(cx) >= {_B} OR abs(cy) >= {_B} THEN"
        " CAST(raise_error('regionize: cell index beyond packable"
        " range') AS BIGINT)"
        f" ELSE {_PACK} END"
    )
    cells = pin(cells.selectExpr("cx", "cy", "x", f"{guard} AS _id"))
    edges = _rook_pairs(cells, payload="_id", li="ia", ri="ib").where(
        "ia < ib")
    comp = connected_components(edges, id_a="ia", id_b="ib")
    labeled = cells.join(comp, cells._id == comp.node, "left").selectExpr(
        "cx", "cy", "x", "coalesce(component, _id) AS region")
    w = Window.partitionBy("region")
    return labeled.select(
        "cx", "cy", "x", "region",
        F.count(F.lit(1)).over(w).cast("long").alias("region_cells"),
        F.sum("x").over(w).cast("long").alias("region_mass"),
    )


def sql_regionize(
    points_sql: str,
    cell: float,
    min_count: int = 1,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> str:
    """DuckDB twin: non-equi adjacency + recursive min-label closure —
    independent of both the shifted-key explode and star contraction."""
    g = float(cell)
    m = int(min_count)
    return f"""
        WITH RECURSIVE cells AS (
          SELECT cx, cy, x, {_PACK} AS id
          FROM (
            SELECT CAST(FLOOR({lon_col} / {g!r}) AS BIGINT) AS cx,
                   CAST(FLOOR({lat_col} / {g!r}) AS BIGINT) AS cy,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM ({points_sql}) src
            WHERE {lat_col} IS NOT NULL AND {lon_col} IS NOT NULL
              AND NOT isnan({lat_col}) AND NOT isnan({lon_col})
            GROUP BY 1, 2
          ) grid
          WHERE x >= {m}
        ),
        adj AS (
          SELECT a.id AS ia, b.id AS ib
          FROM cells a JOIN cells b
            ON abs(a.cx - b.cx) + abs(a.cy - b.cy) = 1
        ),
        lab AS (
          SELECT id AS node, id AS comp FROM cells
          UNION
          SELECT e.ib, l.comp FROM lab l JOIN adj e ON e.ia = l.node
        ),
        comp AS (SELECT node, MIN(comp) AS region FROM lab GROUP BY node)
        SELECT c.cx, c.cy, c.x, p.region,
               CAST(COUNT(*) OVER (PARTITION BY p.region) AS BIGINT)
                 AS region_cells,
               CAST(SUM(c.x) OVER (PARTITION BY p.region) AS BIGINT)
                 AS region_mass
        FROM cells c JOIN comp p ON p.node = c.id
    """
