"""Per-entity trajectory statistics: the spatiotemporal rollup.

Events with (entity, timestamp, position) — users moving, vehicles
reporting, crawlers revisiting geo-tagged pages — roll up into
per-entity path statistics: point count, traveled path length, net
displacement, longest single step, and the bounding box. The classic
movement-data primitives (path/displacement ratio = tortuosity, max
step = teleport/outlier detection, bbox = coverage).

Exactness discipline: lengths are compared cross-engine, and a SUM of
raw doubles is association-order-dependent — so every step length
becomes a BIGINT FIRST (``FLOOR(sqrt(d²) · 1e6)`` micro-units) and the
per-entity sums are exact integer addition. ``sqrt`` is fair game
where trig is not: IEEE 754 requires correctly-rounded square roots,
so both engines produce the identical double for the identical ``d²``
(the repo's portability rules ban transcendentals, whose last ulp is
libm's choice — sqrt is not one of them). Geometry is planar over
equirectangular lon/lat, the hexgrid/rangejoin convention, caveats
documented there.

Plan shape (the reason this is one operator and not a window + agg the
caller hand-rolls): steps need a per-entity ``lag`` window ordered by
(ts, id) and the rollup needs a per-entity hash-agg — run in THIS
order they share the entity hash partitioning, so the whole operator
is ONE Exchange (plan-asserted in tests). Entity keys are the natural
shuffle key; a mega-entity (one user with millions of points) is the
same inherent skew as the frontier's mega-host — its window depth IS
the work, and upstream per-entity caps are the mitigation.

First/last positions: the Spark side rides ``MIN/MAX(STRUCT(ts, id,
lat, lon))`` (the weburl/paradedup lexicographic pattern, ties broken
by the id column); the DuckDB twin deliberately uses a DIFFERENT plan
— ``FIRST_VALUE/LAST_VALUE`` over the full-frame ordered window — so
endpoint agreement is evidence, not shared code.

No reference counterpart (specvital/core has no spatiotemporal
subsystem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def trajectory_stats(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """(entity, n_points, path_len_micro, displacement_micro,
    max_step_micro, min_lat, max_lat, min_lon, max_lon).

    Single-point entities have zero path, displacement, and max step.
    Rows with NULL position are dropped on ingest (a step to nowhere
    has no length; same hygiene rule as redirects/cmsketch).
    """
    pts = df.select(
        F.col(entity_col).alias("_e"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        F.col(lat_col).cast("double").alias("_lat"),
        F.col(lon_col).cast("double").alias("_lon"),
    ).where("_lat IS NOT NULL AND _lon IS NOT NULL")
    w = Window.partitionBy("_e").orderBy("_ts", "_id")
    stepped = pts.select(
        "_e", "_ts", "_id", "_lat", "_lon",
        F.lag("_lat").over(w).alias("_plat"),
        F.lag("_lon").over(w).alias("_plon"),
    ).withColumn(
        "_step",
        F.expr(
            "CAST(FLOOR(sqrt((_lat - _plat) * (_lat - _plat)"
            " + (_lon - _plon) * (_lon - _plon)) * 1000000.0) AS BIGINT)"
        ),
    )
    agged = stepped.groupBy(F.col("_e").alias(entity_col)).agg(
        F.count("*").alias("n_points"),
        F.coalesce(F.sum("_step"), F.lit(0)).cast("long")
        .alias("path_len_micro"),
        F.min(F.struct("_ts", "_id", "_lat", "_lon")).alias("_first"),
        F.max(F.struct("_ts", "_id", "_lat", "_lon")).alias("_last"),
        F.coalesce(F.max("_step"), F.lit(0)).cast("long")
        .alias("max_step_micro"),
        F.min("_lat").alias("min_lat"),
        F.max("_lat").alias("max_lat"),
        F.min("_lon").alias("min_lon"),
        F.max("_lon").alias("max_lon"),
    )
    return agged.selectExpr(
        entity_col,
        "n_points",
        "path_len_micro",
        "CAST(FLOOR(sqrt("
        " (_last._lat - _first._lat) * (_last._lat - _first._lat)"
        " + (_last._lon - _first._lon) * (_last._lon - _first._lon)"
        ") * 1000000.0) AS BIGINT) AS displacement_micro",
        "max_step_micro",
        "min_lat", "max_lat", "min_lon", "max_lon",
    )


def sql_trajectory_stats(
    points_sql: str,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> str:
    """DuckDB twin — same lag window and micro ints, but endpoints via
    FIRST_VALUE/LAST_VALUE over the full frame (a different plan than
    the Spark side's struct extrema, on purpose)."""
    return f"""
        WITH pts AS (
          SELECT {entity_col}, {ts_col}, {id_col},
                 CAST({lat_col} AS DOUBLE) AS {lat_col},
                 CAST({lon_col} AS DOUBLE) AS {lon_col}
          FROM ({points_sql})
          WHERE {lat_col} IS NOT NULL AND {lon_col} IS NOT NULL
        ),
        stepped AS (
          SELECT *,
                 LAG({lat_col}) OVER w AS _plat,
                 LAG({lon_col}) OVER w AS _plon,
                 FIRST_VALUE({lat_col}) OVER wf AS _flat,
                 FIRST_VALUE({lon_col}) OVER wf AS _flon,
                 LAST_VALUE({lat_col}) OVER wf AS _llat,
                 LAST_VALUE({lon_col}) OVER wf AS _llon
          FROM pts
          WINDOW w AS (PARTITION BY {entity_col}
                       ORDER BY {ts_col}, {id_col}),
                 wf AS (PARTITION BY {entity_col}
                        ORDER BY {ts_col}, {id_col}
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING)
        ),
        with_step AS (
          SELECT *,
                 CAST(FLOOR(sqrt(({lat_col} - _plat) * ({lat_col} - _plat)
                   + ({lon_col} - _plon) * ({lon_col} - _plon))
                   * 1000000.0) AS BIGINT) AS _step
          FROM stepped
        )
        SELECT {entity_col},
               CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(COALESCE(SUM(_step), 0) AS BIGINT) AS path_len_micro,
               CAST(FLOOR(sqrt(
                 (MIN(_llat) - MIN(_flat)) * (MIN(_llat) - MIN(_flat))
                 + (MIN(_llon) - MIN(_flon)) * (MIN(_llon) - MIN(_flon)))
                 * 1000000.0) AS BIGINT) AS displacement_micro,
               CAST(COALESCE(MAX(_step), 0) AS BIGINT) AS max_step_micro,
               MIN({lat_col}) AS min_lat, MAX({lat_col}) AS max_lat,
               MIN({lon_col}) AS min_lon, MAX({lon_col}) AS max_lon
        FROM with_step
        GROUP BY {entity_col}
    """
