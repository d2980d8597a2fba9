"""Chao1 unseen-richness + Good-Turing coverage per group.

Two abundance-based estimators over the same (group, item) count
grain the Simpson operator uses — the OTHER half of the question:
diversity.py measures how mixed the items you SAW are; this module
estimates how many you HAVEN'T seen and what fraction of the mass
your sample covers. In crawl terms, per tile: "how many hosts exist
here beyond the ones crawled" (frontier sizing) and "what share of
this cell's traffic the crawl already covers" (stop criterion).

    Chao1 (bias-corrected; Chao 1984):
        S_hat = S_obs + f1*(f1-1) / (2*(f2+1))
    Good-Turing sample coverage (Good 1953):
        C_hat = 1 - f1/N  =  (N - f1)/N

where f1/f2 = the number of items seen exactly once/twice and N is
the row total. Both are FULLY RATIONAL on count data: every factor
(S_obs, f1, f2, N) is an exact BIGINT from hash-aggs, and each
estimate is ONE trailing IEEE division (+ one add) beside its exact
factors (the gini/diversity/assortativity recipe). Always defined:
N >= 1 per emitted group, and f2 = 0 costs nothing (the +1 in the
corrected denominator is the point of the bias-corrected form) — no
NULL arms, no NaN. NULL group/item rows are dropped (no-evidence
convention).

Scale shape: two hash-aggs — (group, item) with map-side combine
absorbing duplicate mass, then a re-agg on group computing all four
factors in ONE pass (conditional sums, not separate DISTINCT
passes) — both on uniform keys; no window, no join, no float
crossing a shuffle.

Overflow envelope: f1² per group — fine to 3e9 distinct singletons
in ONE group, far past any real cell.

The DuckDB twin is the INDEPENDENT count-of-counts plan: per-item
counts -> a (group, c) frequency-of-frequencies grain -> a second
re-agg reading f1/f2 as filtered sums over THAT table (a different
aggregation route with an extra grain level), same final projection
text.

No reference counterpart (specvital/core has no corpus-statistics
subsystem); the estimators are the published Chao/Good formulations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# identical final projection text on both engines
_FINAL = (
    "grp",
    "CAST(n AS BIGINT) AS n_rows",
    "CAST(s_obs AS BIGINT) AS s_obs",
    "CAST(f1 AS BIGINT) AS f1",
    "CAST(f2 AS BIGINT) AS f2",
    "CAST(s_obs AS DOUBLE) + CAST(f1 * (f1 - 1) AS DOUBLE)"
    " / CAST(2 * (f2 + 1) AS DOUBLE) AS chao1",
    "CAST(n - f1 AS DOUBLE) / CAST(n AS DOUBLE) AS coverage",
)


def chao1_richness(
    rows: DataFrame, group_col: str = "grp", item_col: str = "item"
) -> DataFrame:
    """(grp, n_rows, s_obs, f1, f2, chao1, coverage) per group:
    bias-corrected Chao1 richness and Good-Turing coverage of
    ``item_col`` within ``group_col``; NULL group/item rows dropped."""
    per = (
        rows.where(
            F.col(group_col).isNotNull() & F.col(item_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("grp"), F.col(item_col).alias("_it"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    agg = per.groupBy("grp").agg(
        F.expr("CAST(SUM(c) AS BIGINT)").alias("n"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("s_obs"),
        F.expr(
            "CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("f1"),
        F.expr(
            "CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("f2"),
    )
    return agg.selectExpr(*_FINAL)


def sql_chao1_richness(
    rows_sql: str, group_col: str = "grp", item_col: str = "item"
) -> str:
    """DuckDB twin via the INDEPENDENT count-of-counts plan: per-item
    counts -> (grp, c, cnt_items) frequency-of-frequencies -> one
    re-agg reading every factor off that grain; same final projection
    text. ``rows_sql`` must yield ``group_col`` and ``item_col``."""
    return f"""
        WITH per AS (
          SELECT {group_col} AS grp, {item_col} AS it,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM ({rows_sql}) s
          WHERE {group_col} IS NOT NULL AND {item_col} IS NOT NULL
          GROUP BY 1, 2
        ),
        foff AS (
          SELECT grp, c, CAST(COUNT(*) AS BIGINT) AS cnt_items
          FROM per GROUP BY 1, 2
        ),
        packed AS (
          SELECT grp,
                 CAST(SUM(c * cnt_items) AS BIGINT) AS n,
                 CAST(SUM(cnt_items) AS BIGINT) AS s_obs,
                 CAST(COALESCE(SUM(cnt_items) FILTER (WHERE c = 1), 0)
                   AS BIGINT) AS f1,
                 CAST(COALESCE(SUM(cnt_items) FILTER (WHERE c = 2), 0)
                   AS BIGINT) AS f2
          FROM foff GROUP BY grp
        )
        SELECT {", ".join(_FINAL)} FROM packed
    """
