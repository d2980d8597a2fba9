"""Benford first-digit audit — the classic fabricated-numbers screen.

Naturally-occurring multiplicative quantities (transaction amounts,
populations, file sizes) follow Benford's law: leading digit d with
probability log10(1 + 1/d). Audits compare a column's observed
first-digit histogram against that law; heavy deviation flags
fabricated or truncated data. The repo's portability rules exclude
log in compared values, so the expectation ships as FIXED per-mille
literals (301, 176, 125, 97, 79, 67, 58, 51, 46 — they sum to 1000
exactly and are identical text on both engines), and the deviation is
the exact cross-multiplied one-sided mass

    dev_d = |n_d * 1000 - exp_d * N|   (BIGINT, order-free)

from which TV distance = SUM(dev_d) / (2000 * N) — derivable by the
caller with one division; each row also carries obs_millis (exact
integer DIV) and share (ONE trailing IEEE division).

First significant digit: values are FLOOR-truncated to BIGINT and the
leading character of the decimal rendering is taken — exact for
inputs >= 1 (both engines render BIGINTs identically). Values < 1,
zero, negative, or NULL are excluded and counted in n_excluded on
every row: generalizing to (0,1) needs log-scaling, which the
portable surface excludes by design (documented limit).

Scale shape: one codegen'd projection + ONE 9-bucket hash-agg
(map-side combine collapses the stream); the 9-digit spine is a
JVM-side range (never createDataFrame on a query path) left-joined so
zero-count digits still report; the 2-column totals row broadcasts.

No reference counterpart; the statistic is Benford 1938 / Nigrini's
audit practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from core_spark.plans.materialize import pin

# log10(1 + 1/d) in per-mille, d = 1..9; sums to exactly 1000
BENFORD_MILLIS = (301, 176, 125, 97, 79, 67, 58, 51, 46)

_DIGIT = (
    "CAST(SUBSTRING(CAST(CAST(FLOOR(v) AS BIGINT) AS STRING), 1, 1)"
    " AS BIGINT)"
)


def first_digit_audit(df: DataFrame, value_expr: str) -> DataFrame:
    """Rows (digit 1..9, n_obs, exp_millis, dev, obs_millis, share,
    n_total, n_excluded): the observed first-significant-digit
    histogram of ``value_expr`` against the Benford expectation.
    Rows with value < 1 (or NULL) are excluded and reported."""
    vals = df.selectExpr(f"CAST({value_expr} AS DOUBLE) AS v")
    digits = vals.selectExpr(
        f"CASE WHEN v >= 1.0 THEN {_DIGIT} END AS d"
    )
    # pinned: totals AND the spine join both consume the histogram —
    # unpinned, each branch re-scans the corpus
    counts = pin(
        digits.groupBy("d")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("c"))
    )
    totals = counts.agg(
        F.expr(
            "CAST(COALESCE(SUM(CASE WHEN d IS NOT NULL THEN c END), 0)"
            " AS BIGINT)"
        ).alias("n_total"),
        F.expr(
            "CAST(COALESCE(SUM(CASE WHEN d IS NULL THEN c END), 0)"
            " AS BIGINT)"
        ).alias("n_excluded"),
    )
    exp_arr = f"array({', '.join(str(m) for m in BENFORD_MILLIS)})"
    spine = counts.sparkSession.range(1, 10).selectExpr(
        "CAST(id AS BIGINT) AS digit",
        f"CAST(element_at({exp_arr}, CAST(id AS INT)) AS BIGINT)"
        " AS exp_millis",
    )
    # LEFT OUTER can only broadcast its right side — the ≤9-row counts
    return (
        spine.join(F.broadcast(counts.where("d IS NOT NULL")),
                   spine.digit == F.col("d"), "left")
        .selectExpr(
            "digit", "exp_millis",
            "CAST(COALESCE(c, 0) AS BIGINT) AS n_obs",
        )
        .join(F.broadcast(totals))
        .selectExpr(
            "digit", "n_obs", "exp_millis",
            "CAST(abs(n_obs * 1000 - exp_millis * n_total) AS BIGINT)"
            " AS dev",
            "CAST(CASE WHEN n_total > 0 THEN (n_obs * 1000) DIV n_total"
            " END AS BIGINT) AS obs_millis",
            "CASE WHEN n_total > 0 THEN"
            " CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE)"
            " END AS share",
            "n_total", "n_excluded",
        )
    )


def sql_first_digit_audit(table_sql: str, value_expr: str) -> str:
    """DuckDB twin: generate_series spine + list indexing instead of
    the join spine; same literal expectation, same final text."""
    exp_list = f"[{', '.join(str(m) for m in BENFORD_MILLIS)}]"
    return f"""
        WITH vals AS (
            SELECT CAST({value_expr} AS DOUBLE) AS v
            FROM ({table_sql}) t
        ),
        digits AS (
            SELECT CASE WHEN v >= 1.0 THEN {_DIGIT} END AS d FROM vals
        ),
        counts AS (
            SELECT d, CAST(COUNT(*) AS BIGINT) AS c
            FROM digits GROUP BY d
        ),
        tot AS (
            SELECT CAST(COALESCE(SUM(CASE WHEN d IS NOT NULL THEN c END),
                        0) AS BIGINT) AS n_total,
                   CAST(COALESCE(SUM(CASE WHEN d IS NULL THEN c END),
                        0) AS BIGINT) AS n_excluded
            FROM counts
        )
        SELECT CAST(g.digit AS BIGINT) AS digit,
               CAST(COALESCE(c, 0) AS BIGINT) AS n_obs,
               CAST({exp_list}[g.digit] AS BIGINT) AS exp_millis,
               CAST(abs(COALESCE(c, 0) * 1000
                        - {exp_list}[g.digit] * n_total) AS BIGINT)
                   AS dev,
               CAST(CASE WHEN n_total > 0 THEN
                    (COALESCE(c, 0) * 1000) // n_total END AS BIGINT)
                   AS obs_millis,
               CASE WHEN n_total > 0 THEN
                    CAST(COALESCE(c, 0) AS DOUBLE)
                        / CAST(n_total AS DOUBLE) END AS share,
               n_total, n_excluded
        FROM generate_series(1, 9) AS g(digit)
        LEFT JOIN counts ON counts.d = g.digit
        CROSS JOIN tot
    """
