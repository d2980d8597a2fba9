"""Origin-destination flow matrix with gravity-model anomaly flags.

The aggregate view of movement data that ``trajectory.py`` summarizes
per entity: where do trips START and END, and which corridors carry
more flow than the marginals predict? Per (entity, day) the first and
last ping (ordered by ts, then the unique id) define one trip; trips
aggregate into per-(origin cell, destination cell) flows; each flow is
then scored against the gravity/independence expectation
``m_o · m_d / N`` built from the matrix's own marginals. Flows whose
lift exceeds ``factor`` are flagged — corridor detection, the classic
OD anomaly statistic (a chi-square cell residual without the variance
denominator, kept rational for exactness).

Exactness: flows and marginals are BIGINT counts; the anomaly gate is
the pure cross-multiplication ``flow·N·den > num·m_o·m_d`` — no
division, no doubles compared. The gate is exact while ``flow·N·den``
fits int64 (N ≤ ~3e9 trips at den=1; flow ≤ N); beyond that scale
route the decision on the ``lift`` double instead (one identical IEEE
multiply/divide chain per row, deterministic on both engines because
nothing is ever summed in floating point).

Plan shape: two uniform-key hash-aggs (entity-day → trip; cell-pair →
flow). The flow matrix is multi-consumer (flows + two marginals +
total), so it is eagerly pinned (CLAUDE.md self-join rule). Marginals
are per-CELL aggregates — bounded by the occupied-cell count, tiny
next to the ping table — so they come back as ``broadcast`` joins and
the 1-row total as a broadcast cross join; the ping-scale data crosses
the wire exactly twice. A mega-cell origin (airport effect) skews only
the broadcast build side, never the probe.

Same-cell trips (origin == destination) are excluded: a stationary
entity contributes no flow, and keeping loops would dominate the
matrix with the grid's diagonal. NULL entity/position/timestamp rows
drop on ingest (redirects/cmsketch hygiene rule).

The DuckDB twin deliberately runs a DIFFERENT plan — trips via
ROW_NUMBER ASC/DESC windows instead of struct extrema, marginals via
window SUMs over the flow matrix instead of broadcast joins — so
agreement is evidence, not shared code.

No reference counterpart (specvital/core has no spatiotemporal
subsystem); the flow/marginal shape follows the public OD-matrix
literature (gravity model, Wilson 1971).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from core_spark.plans.materialize import pin


def od_flows(
    df: DataFrame,
    cell_size: float,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    factor_num: int = 2,
    factor_den: int = 1,
) -> DataFrame:
    """(o_i, o_j, d_i, d_j, flow, m_o, m_d, total, lift, anomalous).

    ``m_o`` / ``m_d`` are the origin-row / destination-column marginal
    trip counts, ``total`` the matrix total, ``lift`` the double ratio
    ``flow·total / (m_o·m_d)`` and ``anomalous`` the exact integer
    verdict ``flow·total·den > num·m_o·m_d`` as 0/1.
    """
    g = float(cell_size)
    if not g > 0:
        raise ValueError(f"cell_size must be > 0, got {cell_size}")
    num, den = int(factor_num), int(factor_den)
    if num < 1 or den < 1:
        raise ValueError(f"factor must be positive, got {num}/{den}")

    pings = df.selectExpr(
        f"{entity_col} AS _e",
        f"{ts_col} AS _ts",
        f"{id_col} AS _id",
        f"CAST(FLOOR(CAST({lat_col} AS DOUBLE) / {g!r}) AS BIGINT) AS _ci",
        f"CAST(FLOOR(CAST({lon_col} AS DOUBLE) / {g!r}) AS BIGINT) AS _cj",
    ).where(
        "_e IS NOT NULL AND _ts IS NOT NULL"
        " AND _ci IS NOT NULL AND _cj IS NOT NULL"
    )
    trips = (
        pings.selectExpr("_e", "CAST(_ts AS DATE) AS _day", "_ts", "_id",
                         "_ci", "_cj")
        .groupBy("_e", "_day")
        .agg(
            F.min(F.struct("_ts", "_id", "_ci", "_cj")).alias("_o"),
            F.max(F.struct("_ts", "_id", "_ci", "_cj")).alias("_d"),
        )
        .where("_o._ci != _d._ci OR _o._cj != _d._cj")
        .selectExpr("_o._ci AS o_i", "_o._cj AS o_j",
                    "_d._ci AS d_i", "_d._cj AS d_j")
    )
    flows = pin(
        trips.groupBy("o_i", "o_j", "d_i", "d_j")
        .agg(F.count(F.lit(1)).cast("long").alias("flow"))
    )
    m_o = flows.groupBy("o_i", "o_j").agg(
        F.sum("flow").cast("long").alias("m_o"))
    m_d = flows.groupBy("d_i", "d_j").agg(
        F.sum("flow").cast("long").alias("m_d"))
    total = flows.agg(F.sum("flow").cast("long").alias("total"))
    return (
        flows.join(F.broadcast(m_o), ["o_i", "o_j"])
        .join(F.broadcast(m_d), ["d_i", "d_j"])
        .crossJoin(F.broadcast(total))
        .selectExpr(
            "o_i", "o_j", "d_i", "d_j", "flow", "m_o", "m_d", "total",
            "CAST(flow AS DOUBLE) * CAST(total AS DOUBLE)"
            " / (CAST(m_o AS DOUBLE) * CAST(m_d AS DOUBLE)) AS lift",
            f"CAST(flow * total * {den} > {num} * m_o * m_d AS INT)"
            " AS anomalous",
        )
    )


def sql_od_flows(
    points_sql: str,
    cell_size: float,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    factor_num: int = 2,
    factor_den: int = 1,
) -> str:
    """DuckDB oracle twin on a DIFFERENT plan: ROW_NUMBER endpoint
    selection and window-SUM marginals (no joins at all past the flow
    aggregate)."""
    g = float(cell_size)
    num, den = int(factor_num), int(factor_den)
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
        ranked AS (
          SELECT _e, CAST(_ts AS DATE) AS _day, _ci, _cj,
                 ROW_NUMBER() OVER (PARTITION BY _e, CAST(_ts AS DATE)
                                    ORDER BY _ts ASC, _id ASC) AS _rf,
                 ROW_NUMBER() OVER (PARTITION BY _e, CAST(_ts AS DATE)
                                    ORDER BY _ts DESC, _id DESC) AS _rl
          FROM pings
        ),
        trips AS (
          SELECT f._ci AS o_i, f._cj AS o_j, l._ci AS d_i, l._cj AS d_j
          FROM (SELECT * FROM ranked WHERE _rf = 1) f
          JOIN (SELECT * FROM ranked WHERE _rl = 1) l
            ON f._e = l._e AND f._day = l._day
          WHERE f._ci != l._ci OR f._cj != l._cj
        ),
        flows AS (
          SELECT o_i, o_j, d_i, d_j, CAST(COUNT(*) AS BIGINT) AS flow
          FROM trips GROUP BY o_i, o_j, d_i, d_j
        ),
        scored AS (
          SELECT o_i, o_j, d_i, d_j, flow,
                 CAST(SUM(flow) OVER (PARTITION BY o_i, o_j) AS BIGINT)
                   AS m_o,
                 CAST(SUM(flow) OVER (PARTITION BY d_i, d_j) AS BIGINT)
                   AS m_d,
                 CAST(SUM(flow) OVER () AS BIGINT) AS total
          FROM flows
        )
        SELECT o_i, o_j, d_i, d_j, flow, m_o, m_d, total,
               CAST(flow AS DOUBLE) * CAST(total AS DOUBLE)
                 / (CAST(m_o AS DOUBLE) * CAST(m_d AS DOUBLE)) AS lift,
               CAST(flow * total * {den} > {num} * m_o * m_d AS INT)
                 AS anomalous
        FROM scored
    """
