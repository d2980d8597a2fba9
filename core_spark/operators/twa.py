"""Time-weighted average over irregular samples — the gauge rollup.

Event counts average naturally; GAUGES (queue depth, connection
count, temperature) sampled at irregular times do not — the plain
mean over-weights bursts of samples. The standard fix is the
left-constant time-weighted average: each sample holds its value
until the next one, so

    TWA = Σ v_i · (t_{i+1} − t_i)  /  (t_max − t_min)

Exactness: with integer timestamps and integer values both the
numerator (a hash-agg SUM of BIGINT products) and denominator (max −
min) are exact; twa is ONE trailing IEEE division, NULL via integer
CASE for single-sample keys (zero span — the classic divide-by-zero
a float path would render NaN). The LAST sample contributes no
weighted term by construction (it holds until... nothing inside the
observed span); callers wanting a horizon append a sentinel sample.

Duplicate timestamps: samples are ordered by (t, id); equal-t
samples hold for zero duration except the last of the tie group —
deterministic, and exactly what "the value at time t was the latest
write" means.

Scale shape: one LEAD window + one hash-agg, BOTH on the key
clustering — Catalyst plans a single Exchange.

No reference counterpart; the statistic is the classical
left-Riemann time-weighted mean (every monitoring system's gauge
rollup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def time_weighted_avg(
    samples: DataFrame,
    key_col: str = "k",
    t_col: str = "t",
    v_col: str = "v",
    id_col: str = "id",
) -> DataFrame:
    """Rows (k, n, span, num, twa): per-key left-constant
    time-weighted average over the observed span; twa NULL when the
    span is zero (single sample or all-equal timestamps). NULL t/v
    dropped on ingest."""
    v = samples.where(
        F.col(t_col).isNotNull() & F.col(v_col).isNotNull()
    ).selectExpr(
        f"{key_col} AS k", f"CAST({t_col} AS BIGINT) AS t",
        f"CAST({v_col} AS BIGINT) AS v", f"{id_col} AS id",
    )
    w = Window.partitionBy("k").orderBy("t", "id")
    terms = v.select(
        "k", "t", "v",
        F.lead("t").over(w).alias("nt"),
    )
    return (
        terms.groupBy("k")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
            F.expr("CAST(MAX(t) - MIN(t) AS BIGINT)").alias("span"),
            F.expr(
                "CAST(COALESCE(SUM(v * (nt - t)), 0) AS BIGINT)"
            ).alias("num"),
        )
        .selectExpr(
            "k", "n", "span", "num",
            "CASE WHEN span > 0 THEN"
            " CAST(num AS DOUBLE) / CAST(span AS DOUBLE) END AS twa",
        )
    )


def sql_time_weighted_avg(
    samples_sql: str,
    key_col: str = "k",
    t_col: str = "t",
    v_col: str = "v",
    id_col: str = "id",
) -> str:
    """DuckDB twin: same LEAD formulation, same final text."""
    return f"""
        WITH v AS (
            SELECT {key_col} AS k, CAST({t_col} AS BIGINT) AS t,
                   CAST({v_col} AS BIGINT) AS v, {id_col} AS id
            FROM ({samples_sql}) s
            WHERE {t_col} IS NOT NULL AND {v_col} IS NOT NULL
        ),
        terms AS (
            SELECT k, t, v,
                   LEAD(t) OVER (PARTITION BY k ORDER BY t, id) AS nt
            FROM v
        ),
        agg AS (
            SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(MAX(t) - MIN(t) AS BIGINT) AS span,
                   CAST(COALESCE(SUM(v * (nt - t)), 0) AS BIGINT)
                       AS num
            FROM terms GROUP BY k
        )
        SELECT k, n, span, num,
               CASE WHEN span > 0 THEN
                    CAST(num AS DOUBLE) / CAST(span AS DOUBLE)
               END AS twa
        FROM agg
    """
