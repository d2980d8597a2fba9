"""Longest activity streak per key: gaps-and-islands on the day grain.

The crawl-ops continuity question — "how long has this host/user been
continuously active, and what is its longest unbroken run?" — is the
classic gaps-and-islands problem. Runs of consecutive integer days
collapse via the textbook constant-difference trick: within a key,
day - dense_rank(day) is CONSTANT exactly along a run of consecutive
distinct days, so one window + one hash-agg finds every island
without a self-join (staypoints applies the same family of tricks to
trajectory dwell; this is the calendar-grain sibling).

All-integer by construction: days, ranks, island ids, lengths and
the argmax tie-break (longest run, then EARLIEST start) are BIGINTs
end to end — no doubles anywhere, so cross-engine agreement is pure
integer equality.

Scale shape: ONE distinct on the uniform (key, day) grain eats raw
event volume (a host's million hits on one day become one row),
then windows run at the DISTINCT-DAY grain only (≤ days-per-key
rows; the gini/cusum precedent), ONE island hash-agg, ONE per-key
selection agg via min_by on the UNIQUE island start. Keys
contribute however few days they have (a single active day is a
streak of 1 — unlike the pair-based statistics there is no n >= 2
gate).

The DuckDB twin is the INDEPENDENT plan: island boundaries from a
lag-flag cumulative sum (new island when day - prev > 1) instead of
the dense_rank constant-difference trick, selection via QUALIFY
row_number (len DESC, start ASC) instead of a max filter + min_by.

No reference counterpart (specvital/core has no temporal-analytics
subsystem); the technique is the standard SQL gaps-and-islands
formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# identical final projection text on both engines over the selected
# grain (key, n_active, n_streaks, len, start)
_FINAL = (
    "key",
    "CAST(n_active AS BIGINT) AS n_active_days",
    "CAST(n_streaks AS BIGINT) AS n_streaks",
    "CAST(len AS BIGINT) AS longest_streak",
    "CAST(start AS BIGINT) AS streak_start",
    "CAST(start + len - 1 AS BIGINT) AS streak_end",
)


def longest_streaks(
    events: DataFrame,
    key_col: str = "key",
    day_col: str = "day",
) -> DataFrame:
    """(key, n_active_days, n_streaks, longest_streak, streak_start,
    streak_end) per key over integer days; ties on length break to
    the earliest start; NULL key/day rows dropped."""
    from pyspark.sql import Window

    wo = Window.partitionBy("key").orderBy("day")
    days = (
        events.selectExpr(
            f"{key_col} AS key", f"CAST({day_col} AS BIGINT) AS day")
        .where("key IS NOT NULL AND day IS NOT NULL")
        .distinct()
    )
    islands = (
        days.select(
            "key", "day",
            (F.col("day") - F.dense_rank().over(wo)).alias("_isl"))
        .groupBy("key", "_isl")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("len"),
            F.expr("CAST(MIN(day) AS BIGINT)").alias("start"),
        )
    )
    wa = Window.partitionBy("key")
    picked = (
        islands.select(
            "*",
            F.max("len").over(wa).alias("_mx"),
            F.count("*").over(wa).alias("n_streaks"),
            F.sum("len").over(wa).alias("n_active"),
        )
        .where("len = _mx")
        .groupBy("key")
        .agg(
            F.expr("MIN(n_active) AS n_active"),
            F.expr("MIN(n_streaks) AS n_streaks"),
            F.expr("MIN(len) AS len"),
            F.expr("MIN(start) AS start"),
        )
    )
    return picked.selectExpr(*_FINAL)


def sql_longest_streaks(
    events_sql: str,
    key_col: str = "key",
    day_col: str = "day",
) -> str:
    """DuckDB twin via the INDEPENDENT plan: lag-flag cumulative-sum
    islands (new island when day - prev > 1) + QUALIFY row_number
    (len DESC, start ASC) selection; same final projection text.
    ``events_sql`` must yield (key, day)."""
    return f"""
        WITH days AS (
          SELECT DISTINCT {key_col} AS key,
                 CAST({day_col} AS BIGINT) AS day
          FROM ({events_sql}) s
          WHERE {key_col} IS NOT NULL AND {day_col} IS NOT NULL
        ),
        flagged AS (
          SELECT key, day,
                 CASE WHEN day - lag(day) OVER (PARTITION BY key
                                                ORDER BY day) > 1
                      OR lag(day) OVER (PARTITION BY key
                                        ORDER BY day) IS NULL
                      THEN 1 ELSE 0 END AS new_isl
          FROM days
        ),
        numbered AS (
          SELECT key, day,
                 SUM(new_isl) OVER (PARTITION BY key ORDER BY day)
                   AS isl
          FROM flagged
        ),
        islands AS (
          SELECT key, isl, CAST(COUNT(*) AS BIGINT) AS len,
                 CAST(MIN(day) AS BIGINT) AS start
          FROM numbered GROUP BY key, isl
        ),
        stats AS (
          SELECT key, isl, len, start,
                 CAST(COUNT(*) OVER (PARTITION BY key) AS BIGINT)
                   AS n_streaks,
                 CAST(SUM(len) OVER (PARTITION BY key) AS BIGINT)
                   AS n_active
          FROM islands
        ),
        picked AS (
          SELECT * FROM stats
          QUALIFY row_number() OVER (PARTITION BY key
                                     ORDER BY len DESC, start ASC) = 1
        )
        SELECT {", ".join(_FINAL)} FROM picked
    """
