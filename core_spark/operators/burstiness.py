"""Burstiness of inter-event gaps: bursty, Poisson, or periodic?

The Goh & Barabási (2008) burstiness parameter over a key's
inter-event time gaps g_1..g_m:

    B = (sigma - mu) / (sigma + mu)

B -> 1: heavy bursts separated by long silences (human/attack
traffic); B = 0: memoryless Poisson; B -> -1: metronome regularity
(cron jobs, polling bots). Per host/user it is the traffic-shape
fingerprint used for bot detection and politeness tuning — the
inter-arrival twin of acf (acf asks "does VOLUME repeat", burstiness
asks "are ARRIVALS clumped").

Exactness stance: with m gaps, S = sum(g), Q = sum(g^2) — exact
BIGINT aggregates — the variance clears to (m*Q - S^2)/m^2, so

    B = (sqrt(m*Q - S^2) - S) / (sqrt(m*Q - S^2) + S)

is ONE exactly-rounded IEEE sqrt over an exact integer plus a
fixed-order add/divide tail (the variogram sqrt precedent) riding
beside its exact factors (m, S, Q). B is NULL via integer CASE for
keys with < 2 gaps (< 3 events) and for the all-zero-gap degenerate
(S = 0: simultaneous timestamps carry no shape). mu and sigma are
also emitted as single-division/​sqrt doubles for
interpretability.

Scale shape: gaps come from ONE lag window partitioned by key over
the event grain — the one unavoidable per-event sort, on the uniform
key — followed by ONE hash-agg; nothing else shuffles. Duplicate
timestamps produce zero gaps (kept: they are real simultaneity,
and S = 0 degenerates to NULL, never NaN).

Overflow envelope: m * max(g)^2 < 9e18 — a month of second-grain
gaps (max 2.6e6) allows ~1e6 events per key; coarser than that,
pre-quantize gaps.

The DuckDB twin is the INDEPENDENT plan: gaps via a correlated
next-timestamp subquery (min t' > t ... with a rank fallback for
duplicates — concretely: an rn = rn' + 1 self-join on row_number),
no lag window.

No reference counterpart (specvital/core has no statistics
subsystem); the parameter is the published Goh-Barabási B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# identical final projection text on both engines over the grain
# (key, m, s, q) with v = m*q - s*s
_FINAL = (
    "key",
    "CAST(m AS BIGINT) AS n_gaps",
    "CAST(s AS BIGINT) AS gap_sum",
    "CAST(q AS BIGINT) AS gap_sumsq",
    "CAST(m * q - s * s AS BIGINT) AS var_num",
    "CAST(s AS DOUBLE) / CAST(m AS DOUBLE) AS mean_gap",
    "SQRT(CAST(m * q - s * s AS DOUBLE)) / CAST(m AS DOUBLE)"
    " AS sd_gap",
    "CASE WHEN m >= 2 AND s <> 0 THEN"
    " (SQRT(CAST(m * q - s * s AS DOUBLE)) - CAST(s AS DOUBLE))"
    " / (SQRT(CAST(m * q - s * s AS DOUBLE)) + CAST(s AS DOUBLE))"
    " END AS burstiness",
)


def burstiness(
    events: DataFrame,
    key_col: str = "key",
    t_col: str = "t",
) -> DataFrame:
    """(key, n_gaps, gap_sum, gap_sumsq, var_num, mean_gap, sd_gap,
    burstiness) per key over BIGINT timestamps; keys with < 2 events
    absent (no gap), burstiness NULL for < 2 gaps or all-zero gaps."""
    from pyspark.sql import Window

    w = Window.partitionBy("key").orderBy("t")
    gaps = (
        events.selectExpr(
            f"{key_col} AS key", f"CAST({t_col} AS BIGINT) AS t")
        .where("key IS NOT NULL AND t IS NOT NULL")
        .select("key", "t", F.lag("t").over(w).alias("_prev"))
        .where("_prev IS NOT NULL")
        .selectExpr("key", "t - _prev AS g")
    )
    agg = gaps.groupBy("key").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("m"),
        F.expr("CAST(SUM(g) AS BIGINT)").alias("s"),
        F.expr("CAST(SUM(g * g) AS BIGINT)").alias("q"),
    )
    return agg.selectExpr(*_FINAL)


def sql_burstiness(
    events_sql: str,
    key_col: str = "key",
    t_col: str = "t",
) -> str:
    """DuckDB twin via the INDEPENDENT plan: consecutive events paired
    through an rn = rn' + 1 self-join on row_number (no lag window);
    same final projection text. ``events_sql`` must yield (key, t)."""
    return f"""
        WITH ev AS (
          SELECT {key_col} AS key, CAST({t_col} AS BIGINT) AS t,
                 row_number() OVER (PARTITION BY {key_col}
                                    ORDER BY {t_col}) AS rn
          FROM ({events_sql}) s
          WHERE {key_col} IS NOT NULL AND {t_col} IS NOT NULL
        ),
        gaps AS (
          SELECT a.key, b.t - a.t AS g
          FROM ev a JOIN ev b ON a.key = b.key AND b.rn = a.rn + 1
        ),
        agg AS (
          SELECT key, CAST(COUNT(*) AS BIGINT) AS m,
                 CAST(SUM(g) AS BIGINT) AS s,
                 CAST(SUM(g * g) AS BIGINT) AS q
          FROM gaps GROUP BY key
        )
        SELECT {", ".join(_FINAL)} FROM agg
    """
