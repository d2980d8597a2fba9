"""Kaplan-Meier survival: how long until a host/user goes dark?

The censoring-aware survival estimator (Kaplan & Meier 1958): over
subjects with an integer duration and an event flag (1 = the end was
OBSERVED — host stopped responding, user churned; 0 = censored —
still alive when the window closed),

    S(t) = PROD over event times t_j <= t of (1 - d_j / n_j)

with d_j = events at t_j and n_j = subjects still at risk
(duration >= t_j; the standard convention keeps subjects censored AT
t_j in the risk set). Naive "average lifetime" UNDERSTATES survival
whenever observation windows truncate — exactly the crawl situation
(most hosts are still alive when the snapshot ends) — which is why
retention/decay questions need KM, not a mean.

Exactness stance: d_j, c_j, n_j are EXACT BIGINTs — n_j in CLOSED
FORM from cumulative counts at the tie-collapsed distinct-duration
grain (n_j = N - #shorter; the gini recipe — no row-grain window).
The survival product is inherently a float chain, so determinism
comes from ORDER: both engines multiply STRICTLY LEFT-TO-RIGHT in
ascending-t order — Spark as a per-prefix within-row fold over the
sorted event array (m^2/2 lambda evals at the distinct-event-time
grain, tiny by construction), DuckDB as a RECURSIVE CTE stepping
rn -> rn+1 — never a windowed product aggregate, whose segment-tree
combination order is unspecified. Identical factor text
(1.0 - d/n) both sides => bit-identical curves.

Rows are emitted at EVENT times only (the classic KM step points);
censoring between events shapes n_j but adds no row. Keys with no
event emit nothing (a fully-censored stratum has no estimated drop).

Scale shape: ONE hash-agg buckets subjects to the (key, duration)
grain with event/censor conditional counts; ONE cumsum window over
that tiny grain; ONE collect + fold per key. Subject volume never
crosses a window.

No reference counterpart (specvital/core has no statistics
subsystem); the estimator is the published Kaplan-Meier
product-limit form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# identical final projection text on both engines
_FINAL = (
    "key",
    "CAST(t AS BIGINT) AS t",
    "CAST(n AS BIGINT) AS n_risk",
    "CAST(d AS BIGINT) AS d_events",
    "CAST(c AS BIGINT) AS c_censored",
    "survival",
)


def kaplan_meier(
    subjects: DataFrame,
    key_col: str = "key",
    duration_col: str = "duration",
    event_col: str = "event",
) -> DataFrame:
    """(key, t, n_risk, d_events, c_censored, survival) at each event
    time per key: the product-limit survival curve; fully-censored
    keys absent; NULL key/duration/event rows dropped."""
    from pyspark.sql import Window

    b = (
        subjects.selectExpr(
            f"{key_col} AS key",
            f"CAST({duration_col} AS BIGINT) AS t",
            f"CASE WHEN {event_col} = 1 THEN 1L ELSE 0L END AS ev",
        )
        .where(f"key IS NOT NULL AND t IS NOT NULL"
               f" AND {event_col} IS NOT NULL")
        .groupBy("key", "t")
        .agg(
            F.expr("CAST(SUM(ev) AS BIGINT)").alias("d"),
            F.expr("CAST(SUM(1 - ev) AS BIGINT)").alias("c"),
        )
    )
    wa = Window.partitionBy("key")
    wo = (
        Window.partitionBy("key").orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grain = (
        b.select(
            "key", "t", "d", "c",
            F.sum(F.col("d") + F.col("c")).over(wa).alias("_total"),
            F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(wo), F.lit(0)
            ).alias("_shorter"),
        )
        .selectExpr("key", "t", "d", "c", "_total - _shorter AS n")
        .where("d >= 1")
    )
    # per-prefix LEFT-TO-RIGHT fold at the event-time grain: element i
    # gets prod over j <= i of (1 - d_j/n_j), sequentially — matching
    # the twin's recursive CTE order exactly
    folded = (
        grain.groupBy("key")
        .agg(F.expr(
            "sort_array(collect_list(struct(t, d, c, n))) AS _a"))
        .selectExpr(
            "key",
            "transform(_a, (e, i) -> struct("
            " e.t AS t, e.d AS d, e.c AS c, e.n AS n,"
            " aggregate(slice(_a, 1, i + 1), CAST(1.0 AS DOUBLE),"
            " (acc, x) -> acc * (1.0 - CAST(x.d AS DOUBLE)"
            " / CAST(x.n AS DOUBLE))) AS s)) AS _rows",
        )
        .selectExpr("key", "explode(_rows) AS r")
        .selectExpr("key", "r.t AS t", "r.d AS d", "r.c AS c",
                    "r.n AS n", "r.s AS survival")
    )
    return folded.selectExpr(*_FINAL)


def sql_kaplan_meier(
    subjects_sql: str,
    key_col: str = "key",
    duration_col: str = "duration",
    event_col: str = "event",
) -> str:
    """DuckDB twin via the INDEPENDENT sequential plan: n_j from a
    correlated >=-join (no cumulative window), the product as a
    RECURSIVE CTE stepping rn -> rn+1 with the same left-to-right
    (1.0 - d/n) factor text — never a windowed product aggregate
    (segment-tree combination order is unspecified); same final
    projection text. ``subjects_sql`` must yield (key, duration,
    event)."""
    return f"""
        WITH RECURSIVE subj AS (
          SELECT {key_col} AS key,
                 CAST({duration_col} AS BIGINT) AS t,
                 CASE WHEN {event_col} = 1 THEN 1 ELSE 0 END AS ev
          FROM ({subjects_sql}) s
          WHERE {key_col} IS NOT NULL AND {duration_col} IS NOT NULL
            AND {event_col} IS NOT NULL
        ),
        grain AS (
          SELECT key, t,
                 CAST(SUM(ev) AS BIGINT) AS d,
                 CAST(SUM(1 - ev) AS BIGINT) AS c
          FROM subj GROUP BY key, t
        ),
        ev_grain AS (
          SELECT g.key, g.t, g.d, g.c,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM subj s2
                  WHERE s2.key = g.key AND s2.t >= g.t) AS n,
                 row_number() OVER (PARTITION BY g.key ORDER BY g.t)
                   AS rn
          FROM grain g WHERE g.d >= 1
        ),
        km AS (
          SELECT key, t, d, c, n, rn,
                 1.0 - CAST(d AS DOUBLE) / CAST(n AS DOUBLE)
                   AS survival
          FROM ev_grain WHERE rn = 1
          UNION ALL
          SELECT e.key, e.t, e.d, e.c, e.n, e.rn,
                 km.survival
                   * (1.0 - CAST(e.d AS DOUBLE) / CAST(e.n AS DOUBLE))
          FROM ev_grain e JOIN km
            ON e.key = km.key AND e.rn = km.rn + 1
        )
        SELECT {", ".join(_FINAL)} FROM km
    """
