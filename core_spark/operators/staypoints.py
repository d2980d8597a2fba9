"""Stay-point detection: where an entity DWELLS, not just passes.

The trajectory-mining primitive (Zheng et al.'s stay points, grid
form): a maximal run of >= ``min_pings`` CONSECUTIVE pings inside one
grid cell is a stay — home/work/venue discovery, the unit
trip-chaining and co-location analyses consume. Consecutiveness is
what distinguishes a dwell from repeated visits: ten scattered
returns to a cafe are ten candidate stays, not one.

Plan shape — the gaps-and-islands classic, kept to ONE Exchange: two
window row_numbers over the SAME entity hash clustering (partition
(entity) and partition (entity, cell) — the second's keys are a
superset, so hash(entity) satisfies both and Spark plans one shuffle
+ two sorts, plan-asserted), island key = the row-number difference,
then one hash-agg per (entity, cell, island) and the min_pings cut.
Everything compared is BIGINT or a raw timestamp; no floats. A
mega-entity's window depth is its own history — the frontier/
trajectory caveat, upstream per-entity caps are the mitigation.

The DuckDB twin labels islands the OTHER classic way — a lag-based
cell-change flag and a running SUM over the ordered frame — so the
rn-difference trick is itself what the gate verifies.

NULL entity/position/timestamp rows drop on ingest. Ordering ties
break on the id column (unique by contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def stay_points(
    df: DataFrame,
    cell_size: float,
    min_pings: int = 3,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """(entity, cell_i, cell_j, enter_ts, exit_ts, n_pings) per maximal
    same-cell run of at least ``min_pings`` consecutive pings."""
    g = float(cell_size)
    if not g > 0:
        raise ValueError(f"cell_size must be > 0, got {cell_size}")
    k = int(min_pings)
    if k < 1:
        raise ValueError(f"min_pings must be >= 1, got {min_pings}")
    pings = df.selectExpr(
        f"{entity_col} AS _e", f"{ts_col} AS _ts", f"{id_col} AS _id",
        f"CAST(FLOOR(CAST({lat_col} AS DOUBLE) / {g!r}) AS BIGINT) AS _ci",
        f"CAST(FLOOR(CAST({lon_col} AS DOUBLE) / {g!r}) AS BIGINT) AS _cj",
    ).where(
        "_e IS NOT NULL AND _ts IS NOT NULL"
        " AND _ci IS NOT NULL AND _cj IS NOT NULL"
    )
    we = Window.partitionBy("_e").orderBy("_ts", "_id")
    wc = Window.partitionBy("_e", "_ci", "_cj").orderBy("_ts", "_id")
    return (
        pings.select(
            "_e", "_ts", "_ci", "_cj",
            (F.row_number().over(we) - F.row_number().over(wc))
            .alias("_island"),
        )
        .groupBy(
            F.col("_e").alias(entity_col),
            F.col("_ci").alias("cell_i"),
            F.col("_cj").alias("cell_j"),
            "_island",
        )
        .agg(
            F.min("_ts").alias("enter_ts"),
            F.max("_ts").alias("exit_ts"),
            F.count(F.lit(1)).cast("long").alias("n_pings"),
        )
        .where(F.col("n_pings") >= k)
        .drop("_island")
    )


def sql_stay_points(
    points_sql: str,
    cell_size: float,
    min_pings: int = 3,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> str:
    """DuckDB twin: lag-based change flags + running SUM island labels
    — the other classic gaps-and-islands formulation."""
    g = float(cell_size)
    k = int(min_pings)
    return f"""
        WITH pings AS (
          SELECT {entity_col} AS _e, {ts_col} AS _ts, {id_col} AS _id,
                 CAST(FLOOR(CAST({lat_col} AS DOUBLE) / {g!r}) AS BIGINT)
                   AS _ci,
                 CAST(FLOOR(CAST({lon_col} AS DOUBLE) / {g!r}) AS BIGINT)
                   AS _cj
          FROM ({points_sql}) src
          WHERE {entity_col} IS NOT NULL AND {ts_col} IS NOT NULL
            AND {lat_col} IS NOT NULL AND {lon_col} IS NOT NULL
        ),
        flagged AS (
          SELECT *,
                 CASE WHEN LAG(_ci) OVER w = _ci
                       AND LAG(_cj) OVER w = _cj
                      THEN 0 ELSE 1 END AS _new_run
          FROM pings
          WINDOW w AS (PARTITION BY _e ORDER BY _ts, _id)
        ),
        islands AS (
          SELECT *,
                 SUM(_new_run) OVER (PARTITION BY _e ORDER BY _ts, _id
                   ROWS UNBOUNDED PRECEDING) AS _island
          FROM flagged
        )
        SELECT _e AS {entity_col}, _ci AS cell_i, _cj AS cell_j,
               MIN(_ts) AS enter_ts, MAX(_ts) AS exit_ts,
               CAST(COUNT(*) AS BIGINT) AS n_pings
        FROM islands
        GROUP BY _e, _ci, _cj, _island
        HAVING COUNT(*) >= {k}
    """
