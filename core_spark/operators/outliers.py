"""Robust per-group outlier detection — median/MAD, all-integer.

Mean/stddev outlier rules break on the very rows they hunt (one
mega-value drags the mean); the robust statistic is the median
absolute deviation: flag x iff |x − median| > k·MAD. Both the median
and MAD resist 50% contamination, which is why monitoring pipelines
standardize on them (Hampel's rule; k=3 ≈ 4.5 robust sigmas under
normality — the usual 1.4826 normal-consistency constant scales k,
never the data, so it folds into k's choice and the arithmetic stays
integer).

Exactness (the doubled-statistic recipe, same as quality_shift's
doubled ranks): with integer x,

    med2  = x_(k1) + x_(k2)          (doubled median; k1=(n+1)//2,
                                      k2=n//2+1 — equal when n is odd)
    dev   = |2·x − med2|             (= 2·|x − med|, integer)
    mad2d = dev_(k1) + dev_(k2)      (= 4·MAD)

    outlier  ⇔  |x − med| > k·MAD  ⇔  2·dev > k·mad2d

— every compared quantity is BIGINT; no float exists anywhere.

Scale shape: two ranking windows (values, then deviations) and two
tiny per-group medians, ALL clustered on the group key — Catalyst
reuses one Exchange across the chain; the per-group medians table is
group-cardinality-bounded and attaches by broadcast. The order
statistics are exact (the group_quantiles integer-rank discipline);
at extreme per-group cardinality the documented at-scale swap is the
log-bucket sketch (qsketch.py) feeding the same flag rule with
bounded error.

Output is flag-style (every row with its verdict — the semdedup
convention) so downstream chooses to drop, cap, or audit.

No reference counterpart; the statistic is the classical
Hampel/MAD rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from core_spark.plans.materialize import pin

_K1 = "(n + 1) DIV 2"
_K2 = "n DIV 2 + 1"


def mad_outliers(
    rows: DataFrame,
    grp_col: str = "g",
    id_col: str = "id",
    x_col: str = "x",
    k: int = 3,
) -> DataFrame:
    """Rows (g, id, x, med2, mad2d, is_outlier): per-group doubled
    median / doubled-doubled MAD and the integer Hampel verdict
    2·|2x − med2| > k·mad2d. NULL x dropped on ingest; ties in the
    order statistics broken by id (deterministic at every n)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    v = rows.where(F.col(x_col).isNotNull()).selectExpr(
        f"{grp_col} AS g", f"{id_col} AS id",
        f"CAST({x_col} AS BIGINT) AS x",
    )
    wg = Window.partitionBy("g")
    # r1/r2 are each consumed by their median agg AND the next stage —
    # pinned, or every branch re-runs the ranking window (CLAUDE.md)
    r1 = pin(v.select(
        "g", "id", "x",
        F.row_number().over(wg.orderBy("x", "id")).alias("rn"),
        F.count("*").over(wg).alias("n"),
    ))
    med = (
        r1.groupBy("g")
        .agg(F.expr(
            f"CAST(SUM(CASE WHEN rn = {_K1} THEN x ELSE 0 END"
            f" + CASE WHEN rn = {_K2} THEN x ELSE 0 END) AS BIGINT)"
        ).alias("med2"))
    )
    d = (
        r1.join(F.broadcast(med.withColumnRenamed("g", "_mg")),
                F.col("g") == F.col("_mg"))
        .selectExpr("g", "id", "x", "med2", "abs(2 * x - med2) AS dev")
    )
    r2 = pin(d.select(
        "g", "id", "x", "med2", "dev",
        F.row_number().over(wg.orderBy("dev", "id")).alias("rn"),
        F.count("*").over(wg).alias("n"),
    ))
    mad = (
        r2.groupBy(F.col("g").alias("_ag"))
        .agg(F.expr(
            f"CAST(SUM(CASE WHEN rn = {_K1} THEN dev ELSE 0 END"
            f" + CASE WHEN rn = {_K2} THEN dev ELSE 0 END) AS BIGINT)"
        ).alias("mad2d"))
    )
    return (
        r2.join(F.broadcast(mad), F.col("g") == F.col("_ag"))
        .selectExpr(
            "g", "id", "x", "med2", "mad2d",
            f"2 * dev > {k} * mad2d AS is_outlier",
        )
    )


def sql_mad_outliers(
    rows_sql: str,
    grp_col: str = "g",
    id_col: str = "id",
    x_col: str = "x",
    k: int = 3,
) -> str:
    """DuckDB twin: the same doubled-statistic definition through the
    same two-window chain (// for DIV); rows_sql yields the raw
    columns."""
    k1, k2 = "(n + 1) // 2", "n // 2 + 1"
    return f"""
        WITH v AS (
            SELECT {grp_col} AS g, {id_col} AS id,
                   CAST({x_col} AS BIGINT) AS x
            FROM ({rows_sql}) s WHERE {x_col} IS NOT NULL
        ),
        r1 AS (
            SELECT g, id, x,
                   ROW_NUMBER() OVER (PARTITION BY g ORDER BY x, id)
                       AS rn,
                   COUNT(*) OVER (PARTITION BY g) AS n
            FROM v
        ),
        med AS (
            SELECT g, CAST(SUM(CASE WHEN rn = {k1} THEN x ELSE 0 END
                        + CASE WHEN rn = {k2} THEN x ELSE 0 END)
                        AS BIGINT) AS med2
            FROM r1 GROUP BY g
        ),
        d AS (
            SELECT r1.g, id, x, med2, abs(2 * x - med2) AS dev
            FROM r1 JOIN med ON r1.g = med.g
        ),
        r2 AS (
            SELECT g, id, x, med2, dev,
                   ROW_NUMBER() OVER (PARTITION BY g ORDER BY dev, id)
                       AS rn,
                   COUNT(*) OVER (PARTITION BY g) AS n
            FROM d
        ),
        mad AS (
            SELECT g, CAST(SUM(CASE WHEN rn = {k1} THEN dev ELSE 0 END
                        + CASE WHEN rn = {k2} THEN dev ELSE 0 END)
                        AS BIGINT) AS mad2d
            FROM r2 GROUP BY g
        )
        SELECT r2.g, id, x, r2.med2, mad2d,
               2 * dev > {k} * mad2d AS is_outlier
        FROM r2 JOIN mad ON r2.g = mad.g
    """
