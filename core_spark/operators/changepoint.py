"""CUSUM changepoint: where did a series' level shift?

The classic at-most-one-change estimator (Page 1954; the offline
max-CUSUM form): for a per-key series x_1..x_n in time order, the
split k* maximizing |S_k - k*mean| — equivalently, where the running
sum departs farthest from the global trend line — locates a level
shift (a crawl-volume regime change, a host going dark, a quality
drop after a pipeline deploy). Downstream segmentations recurse on
the two halves; this operator is that recursion's single step.

Exactness stance: the mean makes the textbook form float — clearing
denominators fixes it (the moran recipe, 1-D): with T = total and
integer x,

    D_k = n*S_k - k*T

is an EXACT BIGINT, |D_k| maximal exactly where |S_k - k*mean| is,
and the argmax + deterministic tie-break (smallest t among maxima)
is decided ENTIRELY on integers. The reported doubles — cusum =
|D|/n (the classic statistic's magnitude), mean_left = S/k,
mean_right = (T-S)/(n-k) — are each ONE trailing IEEE division
beside their exact factors. Proper splits only (1 <= k < n); keys
with < 2 buckets are ABSENT (no split, no evidence).

Scale shape: ONE uniform hash-agg buckets the raw stream to
(key, t, sum x) — duplicate t impossible after it — then window
functions AT THE BUCKET GRAIN ONLY (series length per key, never raw
rows; the gini/quantiles precedent) compute prefix sums, positions
and the per-key max, and ONE final hash-agg selects the argmax row
via min_by on the UNIQUE t (deterministic by construction). No
joins, no collect.

Overflow envelope: |D_k| <= n*T — fine while buckets-per-key times
total-volume stays under 9e18 (1e6 hourly buckets x 1e12 events);
past that, pre-bucket coarser.

The DuckDB twin is the INDEPENDENT plan: prefix sums via a t'<=t
self-join (no window frames) and the argmax row via QUALIFY
row_number ordered by (|D| DESC, t ASC) — different prefix route,
different selection mechanism, same integers.

No reference counterpart (specvital/core has no statistics
subsystem); the estimator is the published CUSUM formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# identical final projection text on both engines, over the selected
# argmax grain (key, n, total, k, t, s, d_abs)
_FINAL = (
    "key",
    "CAST(n AS BIGINT) AS n_points",
    "CAST(total AS BIGINT) AS total",
    "CAST(k AS BIGINT) AS k_split",
    "CAST(t AS BIGINT) AS t_split",
    "CAST(d_abs AS BIGINT) AS d_abs",
    "CAST(d_abs AS DOUBLE) / CAST(n AS DOUBLE) AS cusum",
    "CAST(s AS DOUBLE) / CAST(k AS DOUBLE) AS mean_left",
    "CAST(total - s AS DOUBLE) / CAST(n - k AS DOUBLE) AS mean_right",
)


def cusum_changepoint(
    series: DataFrame,
    key_col: str = "key",
    t_col: str = "t",
    x_col: str = "x",
) -> DataFrame:
    """(key, n_points, total, k_split, t_split, d_abs, cusum,
    mean_left, mean_right) per key: the max-|CUSUM| split of the
    (t, x) series; t_split is the LAST bucket of the left segment;
    ties broken to the smallest t; keys with < 2 buckets absent."""
    from pyspark.sql import Window

    b = (
        series.selectExpr(
            f"{key_col} AS key",
            f"CAST({t_col} AS BIGINT) AS t",
            f"CAST({x_col} AS BIGINT) AS x",
        )
        .where("key IS NOT NULL AND t IS NOT NULL AND x IS NOT NULL")
        .groupBy("key", "t")
        .agg(F.sum("x").alias("xb"))
    )
    wo = Window.partitionBy("key").orderBy("t")
    wa = Window.partitionBy("key")
    rows = (
        b.select(
            "key", "t",
            F.sum("xb").over(wo).alias("s"),
            F.row_number().over(wo).alias("k"),
            F.count("*").over(wa).alias("n"),
            F.sum("xb").over(wa).alias("total"),
        )
        .where("k < n")
        .selectExpr(
            "key", "t", "s", "k", "n", "total",
            "abs(n * s - k * total) AS d_abs")
    )
    picked = (
        rows.select(
            "*", F.max("d_abs").over(wa).alias("_mx"))
        .where("d_abs = _mx")
        .groupBy("key")
        .agg(
            F.expr("MIN(n) AS n"),
            F.expr("MIN(total) AS total"),
            F.expr("MIN(t) AS t"),
            F.expr("min_by(k, t) AS k"),
            F.expr("min_by(s, t) AS s"),
            F.expr("MIN(d_abs) AS d_abs"),
        )
    )
    return picked.selectExpr(*_FINAL)


def sql_cusum_changepoint(
    series_sql: str,
    key_col: str = "key",
    t_col: str = "t",
    x_col: str = "x",
) -> str:
    """DuckDB twin via the INDEPENDENT plan: prefix sums from a
    t'<=t self-join (no window frames), argmax row via QUALIFY
    row_number over (|D| DESC, t ASC); same final projection text.
    ``series_sql`` must yield (key, t, x)."""
    return f"""
        WITH b AS (
          SELECT {key_col} AS key, CAST({t_col} AS BIGINT) AS t,
                 CAST(SUM(CAST({x_col} AS BIGINT)) AS BIGINT) AS xb
          FROM ({series_sql}) src
          WHERE {key_col} IS NOT NULL AND {t_col} IS NOT NULL
            AND {x_col} IS NOT NULL
          GROUP BY 1, 2
        ),
        tot AS (
          SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(xb) AS BIGINT) AS total
          FROM b GROUP BY key
        ),
        pre AS (
          SELECT a.key, a.t,
                 CAST(SUM(b2.xb) AS BIGINT) AS s,
                 CAST(COUNT(*) AS BIGINT) AS k
          FROM b a JOIN b b2 ON a.key = b2.key AND b2.t <= a.t
          GROUP BY a.key, a.t
        ),
        scored AS (
          SELECT pre.key, pre.t, pre.s, pre.k, tot.n, tot.total,
                 abs(tot.n * pre.s - pre.k * tot.total) AS d_abs
          FROM pre JOIN tot ON pre.key = tot.key
          WHERE pre.k < tot.n
        ),
        picked AS (
          SELECT * FROM scored
          QUALIFY row_number() OVER (PARTITION BY key
                                     ORDER BY d_abs DESC, t ASC) = 1
        )
        SELECT {", ".join(_FINAL)} FROM picked
    """
