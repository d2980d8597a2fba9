"""Sliding-window rate audit — RANGE frames over event time.

Every other window in the engine uses ROWS frames (positional);
rate limiting is the workload that genuinely needs RANGE: "how many
requests did this key make in the TRAILING W seconds" counts by
TIME DISTANCE, not row position — under bursty traffic the two
diverge exactly when it matters. This operator audits a historical
event stream against a limit: for every event, the count of
same-key events in (t − W, t] and the integer over-limit verdict.

RANGE frame semantics both engines share (and the oracle therefore
gates): the frame holds all rows whose ORDER-BY value lies in
[current − W, current] — PEER rows (equal t) are all included
regardless of which is "current", so equal-timestamp bursts count
fully for every member. That is the correct rate-limiter reading
(a burst of 100 simultaneous requests is 100 requests), and it is
also why the verdict needs no tie-break.

Exactness: counts are BIGINTs; the verdict is BIGINT 1/0 (§116: no
nullable/boolean verdicts in oracled projections — here it is
two-valued, but the integer form keeps the discipline uniform).

Scale shape: ONE window pass partitioned by key over integer
seconds (RANGE needs a numeric ORDER BY on both engines — the
caller converts timestamps once, map-side). State per key is
bounded by the window's event capacity, the same bound the online
limiter itself would hold.

No reference counterpart; the shape is the standard sliding-window
rate limiter, evaluated offline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sliding_rate(
    events: DataFrame,
    window_sec: int,
    limit: int,
    key_col: str = "k",
    t_col: str = "t_sec",
    id_col: str = "id",
) -> DataFrame:
    """Rows (k, t_sec, id, win_count, over_limit): every event with
    the count of same-key events in the trailing ``window_sec``
    seconds (inclusive frame [t−W, t]) and the BIGINT 1/0 verdict
    win_count > limit. NULL t dropped on ingest."""
    if window_sec < 1 or limit < 1:
        raise ValueError("window_sec and limit must be >= 1")
    v = events.where(F.col(t_col).isNotNull()).selectExpr(
        f"{key_col} AS k", f"CAST({t_col} AS BIGINT) AS t_sec",
        f"{id_col} AS id",
    )
    w = (
        Window.partitionBy("k").orderBy("t_sec")
        .rangeBetween(-window_sec, 0)
    )
    return (
        v.select(
            "k", "t_sec", "id",
            F.count("*").over(w).alias("wc"),
        )
        .selectExpr(
            "k", "t_sec", "id",
            "CAST(wc AS BIGINT) AS win_count",
            f"CAST(wc > {limit} AS BIGINT) AS over_limit",
        )
    )


def sql_sliding_rate(
    events_sql: str,
    window_sec: int,
    limit: int,
    key_col: str = "k",
    t_col: str = "t_sec",
    id_col: str = "id",
) -> str:
    """DuckDB twin: identical RANGE frame text — the cross-engine
    peer-row semantics agreement is what the oracle gates."""
    return f"""
        WITH v AS (
            SELECT {key_col} AS k, CAST({t_col} AS BIGINT) AS t_sec,
                   {id_col} AS id
            FROM ({events_sql}) s WHERE {t_col} IS NOT NULL
        )
        SELECT k, t_sec, id,
               CAST(COUNT(*) OVER (PARTITION BY k ORDER BY t_sec
                    RANGE BETWEEN {window_sec} PRECEDING
                    AND CURRENT ROW) AS BIGINT) AS win_count,
               CAST(COUNT(*) OVER (PARTITION BY k ORDER BY t_sec
                    RANGE BETWEEN {window_sec} PRECEDING
                    AND CURRENT ROW) > {limit} AS BIGINT) AS over_limit
        FROM v
    """
