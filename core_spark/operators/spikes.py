"""Trailing-window spike detection over per-key time series.

The monitoring counterpart to volume_shift (WHEN did the regime
break) and crawl_burstiness (HOW bursty overall): WHICH points sit
anomalously above their own recent baseline? The rule is the
operational one every alerting system ships first: flag t iff

    x_t > (num/den) · mean(x_{t-W} .. x_{t-1})

with a FULL W-point history required (partial baselines at a series'
start produce the classic cold-start false alarms — those rows
report is_spike NULL, not false: "not enough history" is a third
state, and coercing it to false would silently suppress audit rows).

Exactness: the comparison clears its denominators —

    x_t · W · den > num · Σ_{prev W}   (strict, all BIGINT)

— no mean, no ratio, no float anywhere.

Scale shape: ONE window pass per series key (frame ROWS W PRECEDING
TO 1 PRECEDING gives both the trailing sum and the history count),
partitioned by the key so state is bounded per series; day-grain
input rows arrive from an upstream hash-agg. A global unkeyed series
would serialize into one task — callers shard by entity exactly as
revenue_trend partitions by priority.

No reference counterpart; the rule is the classical moving-average
control chart (x̄-chart with a one-sided multiplicative limit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def trailing_spikes(
    series: DataFrame,
    key_col: str = "k",
    t_col: str = "t",
    x_col: str = "x",
    window: int = 7,
    num: int = 8,
    den: int = 7,
) -> DataFrame:
    """Rows (k, t, x, prev_sum, n_prev, is_spike): every input point
    with its trailing-W baseline and the cleared-denominator verdict
    as BIGINT 1/0/NULL — NULL until W history points exist. NULL x
    dropped on ingest (a gap contributes no baseline and no verdict
    row)."""
    if window < 1 or num < 1 or den < 1:
        raise ValueError("window, num, den must all be >= 1")
    v = series.where(F.col(x_col).isNotNull()).selectExpr(
        f"{key_col} AS k", f"{t_col} AS t",
        f"CAST({x_col} AS BIGINT) AS x",
    )
    w = (
        Window.partitionBy("k").orderBy("t")
        .rowsBetween(-window, -1)
    )
    return (
        v.select(
            "k", "t", "x",
            F.sum("x").over(w).alias("ps"),
            F.count("x").over(w).alias("np"),
        )
        .selectExpr(
            "k", "t", "x",
            "CAST(COALESCE(ps, 0) AS BIGINT) AS prev_sum",
            "CAST(np AS BIGINT) AS n_prev",
            # BIGINT 1/0/NULL, not BOOLEAN: a nullable bool crosses
            # pandas as None-vs-NaN between engines and fails the hash
            f"CASE WHEN np = {window} THEN"
            f" CAST(x * {window} * {den} > {num} * ps AS BIGINT)"
            " END AS is_spike",
        )
    )


def sql_trailing_spikes(
    series_sql: str,
    key_col: str = "k",
    t_col: str = "t",
    x_col: str = "x",
    window: int = 7,
    num: int = 8,
    den: int = 7,
) -> str:
    """DuckDB twin: identical frame text — the window FRAME semantics
    agreement between engines is part of what the oracle gates."""
    return f"""
        WITH v AS (
            SELECT {key_col} AS k, {t_col} AS t,
                   CAST({x_col} AS BIGINT) AS x
            FROM ({series_sql}) s WHERE {x_col} IS NOT NULL
        ),
        w AS (
            SELECT k, t, x,
                   SUM(x) OVER (PARTITION BY k ORDER BY t
                        ROWS BETWEEN {window} PRECEDING
                        AND 1 PRECEDING) AS ps,
                   COUNT(x) OVER (PARTITION BY k ORDER BY t
                        ROWS BETWEEN {window} PRECEDING
                        AND 1 PRECEDING) AS np
            FROM v
        )
        SELECT k, t, x,
               CAST(COALESCE(ps, 0) AS BIGINT) AS prev_sum,
               CAST(np AS BIGINT) AS n_prev,
               CASE WHEN np = {window} THEN
                    CAST(x * {window} * {den} > {num} * ps AS BIGINT)
                    END AS is_spike
        FROM w
    """
