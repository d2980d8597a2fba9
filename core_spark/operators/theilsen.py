"""Theil-Sen robust trend slopes: the median of pairwise slopes.

The Mann-Kendall family's missing half: emerging.py answers IS there a
monotone trend (a pure-integer sign test); Theil-Sen (Theil 1950; Sen
1968) answers HOW STEEP, robustly — the median of all pairwise slopes
(y_j - y_i) / (t_j - t_i) over t_i < t_j tolerates up to ~29% corrupt
points, which is why it is the standard trend estimator for noisy
per-host / per-cell time series (crawl volumes, error rates).

Exactness stance: each slope is ONE IEEE division of exact BIGINT
differences — bit-identical cross-engine — and the median is RANK
SELECTION, not summation: sort the slope array, pick elements
(m+1) DIV 2 and (m+2) DIV 2 (1-based; equal when m is odd), average
with one fixed-order (lo + hi) / 2. No accumulation ever crosses a
shuffle, so no order-dependence exists to defend against.

Scale shape — the O(m²) pair generation is WITHIN-ROW, after the one
hash-agg that buckets the raw stream:

1. ONE uniform hash-agg to (key, t, SUM(y)) — map-side combine eats
   the raw event volume, and duplicate t per key becomes impossible
   (no dt=0 slopes by construction);
2. per key: sort_array(collect_list(struct(t, y))) — the second and
   last shuffle, carrying only bucket rows (series length per key,
   NOT raw events);
3. the slope array is a nested within-row HOF over the sorted struct
   array — zero joins, zero Python, bounded by the in-plan
   raise_error guard at ``max_points`` (m² doubles per row: 2k points
   = 2M slopes = 16 MB — a degenerate bucketing must fail loudly,
   not OOM the executor; re-bucket coarser instead);
4. keys with fewer than 2 points are ABSENT (no pair, no slope — the
   idw no-evidence convention).

The DuckDB twin is an INDEPENDENT plan: a t<t' self-join generates
slope ROWS (no arrays), and the median is explicit rank selection via
row_number — gating both the nested HOF and the rank arithmetic.

No reference counterpart (specvital/core has no statistics
subsystem); the estimator is the published Theil-Sen formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _check(max_points: int) -> None:
    if int(max_points) < 2:
        raise ValueError(
            f"theil_sen: max_points must be >= 2, got {max_points}")


def theil_sen(
    series: DataFrame,
    key_col: str = "key",
    t_col: str = "t",
    y_col: str = "y",
    max_points: int = 2000,
) -> DataFrame:
    """(key, n_points, n_pairs, slope): median-of-pairwise-slopes per
    key over the (t, y) series; y summed per (key, t) first, keys
    with < 2 distinct t absent, series longer than ``max_points``
    raise in-plan."""
    _check(max_points)
    slope = (
        "CAST(element_at(_a, i).y - element_at(_a, j).y AS DOUBLE)"
        " / CAST(element_at(_a, i).t - element_at(_a, j).t AS DOUBLE)"
    )
    guard = (
        f"CASE WHEN size(_a) > {int(max_points)} THEN"
        f" CAST(raise_error('theil_sen: series exceeds"
        f" {int(max_points)} points — re-bucket coarser') AS INT)"
        " ELSE size(_a) END"
    )
    return (
        series.selectExpr(
            f"{key_col} AS key",
            f"CAST({t_col} AS BIGINT) AS _t",
            f"CAST({y_col} AS BIGINT) AS _y",
        )
        .where("key IS NOT NULL AND _t IS NOT NULL AND _y IS NOT NULL")
        .groupBy("key", "_t")
        .agg(F.sum("_y").alias("_yb"))
        .groupBy("key")
        .agg(F.expr(
            "sort_array(collect_list(struct(_t AS t, _yb AS y))) AS _a"))
        .selectExpr("key", "_a", f"{guard} AS _n")
        .where("_n >= 2")
        .selectExpr(
            "key", "_n",
            "array_sort(flatten(transform(sequence(2, _n),"
            " i -> transform(sequence(1, i - 1),"
            f" j -> {slope})))) AS _s",
        )
        .selectExpr(
            "key",
            "CAST(_n AS BIGINT) AS n_points",
            "CAST(size(_s) AS BIGINT) AS n_pairs",
            "(element_at(_s, CAST((size(_s) + 1) DIV 2 AS INT))"
            " + element_at(_s, CAST((size(_s) + 2) DIV 2 AS INT))) / 2"
            " AS slope",
        )
    )


def sql_theil_sen(
    series_sql: str,
    key_col: str = "key",
    t_col: str = "t",
    y_col: str = "y",
) -> str:
    """DuckDB twin via the INDEPENDENT row plan: t<t' self-join slope
    rows + explicit row_number rank selection — no arrays, no HOFs."""
    return f"""
        WITH b AS (
          SELECT {key_col} AS key,
                 CAST({t_col} AS BIGINT) AS t,
                 CAST(SUM(CAST({y_col} AS BIGINT)) AS BIGINT) AS y
          FROM ({series_sql}) src
          WHERE {key_col} IS NOT NULL AND {t_col} IS NOT NULL
            AND {y_col} IS NOT NULL
          GROUP BY 1, 2
        ),
        sl AS (
          SELECT a.key,
                 CAST(b2.y - a.y AS DOUBLE)
                   / CAST(b2.t - a.t AS DOUBLE) AS s
          FROM b a
          JOIN b b2 ON a.key = b2.key AND a.t < b2.t
        ),
        rk AS (
          SELECT key, s,
                 row_number() OVER (PARTITION BY key ORDER BY s) AS rn,
                 COUNT(*) OVER (PARTITION BY key) AS m
          FROM sl
        ),
        np AS (
          SELECT key, CAST(COUNT(*) AS BIGINT) AS n_points
          FROM b GROUP BY key
        )
        SELECT rk.key, np.n_points,
               CAST(MIN(m) AS BIGINT) AS n_pairs,
               (MIN(CASE WHEN rn = (m + 1) // 2 THEN s END)
                + MIN(CASE WHEN rn = (m + 2) // 2 THEN s END)) / 2
                 AS slope
        FROM rk JOIN np ON rk.key = np.key
        GROUP BY rk.key, np.n_points
    """
