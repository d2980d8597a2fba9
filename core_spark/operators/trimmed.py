"""Exact trimmed mean per key: the robust center, shuffle-exactly.

The robust-statistics workhorse (Tukey's trimmed mean): drop the k
smallest and k largest observations per key and average the rest —
the host-quality / latency / score summary that survives the spam
outliers and sensor glitches a plain mean drowns in, without the
median's information loss. theil_sen robustifies SLOPES; this
robustifies LEVELS.

Exactness stance (the gini / mann-whitney grain trick): rows never
rank individually. At the tie-collapsed (key, value) grain, a value
block with c rows after cb smaller rows keeps

    kept = max(0, min(cb + c, n - k) - max(cb, k))

rows of the trimmed window [k+1, n-k] — pure BIGINT interval
arithmetic — so the trimmed sum SUM(v * kept) is EXACT, order-free,
and deterministic even when ties straddle a cut (the k smallest
rows form a unique multiset, so the dropped mass is well-defined).
The mean is ONE trailing IEEE division beside its exact factors.
Keys with n <= 2k are ABSENT (nothing survives the trim).

Scale shape: ONE uniform hash-agg to the value grain (map-side
combine eats duplicates), ONE cumsum window over the tiny distinct-
value table per key, ONE final hash-agg. No row-grain window ever.

Overflow envelope: |v| * n per key within int64 — past that,
pre-scale values.

The DuckDB twin is the INDEPENDENT row-grain plan: literal
row_number per key, filter rn BETWEEN k+1 AND n-k, plain SUM —
legal because the boundary-tie multiset argument above makes any
row order give the same sum.

No reference counterpart (specvital/core has no statistics
subsystem); the estimator is the classical trimmed mean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# identical final projection text on both engines
_FINAL = (
    "key",
    "CAST(n AS BIGINT) AS n_rows",
    "CAST(n - 2 * {k} AS BIGINT) AS n_kept",
    "CAST(tsum AS BIGINT) AS trimmed_sum",
    "CAST(tsum AS DOUBLE) / CAST(n - 2 * {k} AS DOUBLE)"
    " AS trimmed_mean",
)


def trimmed_mean(
    rows: DataFrame,
    trim_k: int,
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """(key, n_rows, n_kept, trimmed_sum, trimmed_mean) per key after
    dropping exactly ``trim_k`` rows from each side; keys with
    n <= 2*trim_k absent; NULL key/value rows dropped."""
    k = int(trim_k)
    if k < 1:
        raise ValueError(f"trimmed_mean: trim_k must be >= 1, got {trim_k}")
    from pyspark.sql import Window

    per = (
        rows.selectExpr(
            f"{key_col} AS key", f"CAST({value_col} AS BIGINT) AS v")
        .where("key IS NOT NULL AND v IS NOT NULL")
        .groupBy("key", "v")
        .agg(F.count("*").cast("long").alias("c"))
    )
    wo = (
        Window.partitionBy("key").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wa = Window.partitionBy("key")
    kept = (
        f"GREATEST(0L, LEAST(cb + c, n - {k}) - GREATEST(cb, {k}L))"
    )
    agg = (
        per.select(
            "key", "v", "c",
            F.coalesce(F.sum("c").over(wo), F.lit(0)).alias("cb"),
            F.sum("c").over(wa).alias("n"),
        )
        .where(f"n > {2 * k}")
        .selectExpr("key", "n", f"v * ({kept}) AS _vs")
        .groupBy("key")
        .agg(
            F.expr("MIN(n) AS n"),
            F.expr("CAST(SUM(_vs) AS BIGINT)").alias("tsum"),
        )
    )
    return agg.selectExpr(*[s.format(k=k) for s in _FINAL])


def sql_trimmed_mean(
    rows_sql: str,
    trim_k: int,
    key_col: str = "key",
    value_col: str = "value",
) -> str:
    """DuckDB twin via the INDEPENDENT row-grain plan: literal
    row_number per key, keep rn in [k+1, n-k], plain SUM (any row
    order sums identically — boundary ties form a unique multiset);
    same final projection text. ``rows_sql`` must yield (key,
    value)."""
    k = int(trim_k)
    return f"""
        WITH r AS (
          SELECT {key_col} AS key, CAST({value_col} AS BIGINT) AS v,
                 row_number() OVER (PARTITION BY {key_col}
                                    ORDER BY {value_col}) AS rn,
                 COUNT(*) OVER (PARTITION BY {key_col}) AS n
          FROM ({rows_sql}) s
          WHERE {key_col} IS NOT NULL AND {value_col} IS NOT NULL
        ),
        agg AS (
          SELECT key, CAST(MIN(n) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN rn > {k} AND rn <= n - {k}
                               THEN v ELSE 0 END) AS BIGINT) AS tsum
          FROM r
          WHERE n > {2 * k}
          GROUP BY key
        )
        SELECT {", ".join(s.format(k=k) for s in _FINAL)} FROM agg
    """
