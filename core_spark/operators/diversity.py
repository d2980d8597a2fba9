"""Simpson diversity of items within groups (hosts per tile, ...).

Per-group Simpson index: the probability that two documents drawn
from a group WITHOUT replacement come from different hosts —

    D = 1 − Σ n_i(n_i−1) / (N(N−1))

D = 0: a monoculture tile (one host owns it — link-farm / mirror
shape); D → 1: evenly mixed. It is the entropy-flavored diversity
rollup the tiling family lacked — Shannon needs the forbidden log,
Simpson is FULLY RATIONAL on count data: num = N(N−1) − Σn_i(n_i−1)
and den = N(N−1) are exact BIGINT sums, D is ONE trailing IEEE
division beside its exact factors (the gini/assortativity recipe).
Groups with N < 2 report NULL diversity via an exact integer CASE
(a single draw has no pair to differ), never NaN.

Scale shape: two hash-aggs — (group, item) with map-side combine
absorbing the duplicate mass, then a re-agg on group — both on
uniform keys; no window, no join, no float crossing a shuffle.
NULL groups or items are dropped (no-evidence convention).

Overflow envelope (the apportion convention): terms bounded by N² per
group — fine up to 3e9 rows in ONE group; past that, pre-divide
counts (D is not scale-invariant, but the 1e9-docs-on-one-tile case
is a fixture error, not a corpus).

The DuckDB twin is the INDEPENDENT plan: per-(group,item) counts fed
to a window-free single GROUP BY with the same final projection text
but the Σ computed over a LIST-aggregated per-group count array
(list_aggregate), exercising a different execution route.

No reference counterpart (specvital/core has no corpus-statistics
subsystem); the statistic is Simpson's 1949 published index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# identical final projection text on both engines
_FINAL = (
    "grp",
    "CAST(n_rows AS BIGINT) AS n_rows",
    "CAST(n_items AS BIGINT) AS n_items",
    "CAST(num AS BIGINT) AS num",
    "CAST(den AS BIGINT) AS den",
    "CASE WHEN den <> 0 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE)"
    " END AS simpson",
)


def simpson_diversity(
    rows: DataFrame, group_col: str = "grp", item_col: str = "item"
) -> DataFrame:
    """(grp, n_rows, n_items, num, den, simpson) per group: Simpson
    diversity of ``item_col`` within ``group_col``; NULL simpson for
    single-row groups; NULL group/item rows dropped."""
    per = (
        rows.where(
            F.col(group_col).isNotNull() & F.col(item_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("grp"), F.col(item_col).alias("_it"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    agg = per.groupBy("grp").agg(
        F.expr("CAST(SUM(c) AS BIGINT)").alias("n"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("k"),
        F.expr("CAST(SUM(c * (c - 1)) AS BIGINT)").alias("same"),
    )
    return agg.selectExpr(
        "grp",
        "n AS n_rows",
        "k AS n_items",
        "n * (n - 1) - same AS num",
        "n * (n - 1) AS den",
    ).selectExpr(*_FINAL)


def sql_simpson_diversity(
    rows_sql: str, group_col: str = "grp", item_col: str = "item"
) -> str:
    """DuckDB twin via the INDEPENDENT list-aggregate plan: one GROUP
    BY collecting the per-item counts into a list, Σn_i(n_i−1) via
    list_aggregate over a transformed list, same final projection
    text. ``rows_sql`` must yield ``group_col`` and ``item_col``."""
    return f"""
        WITH per AS (
          SELECT {group_col} AS grp, {item_col} AS it,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM ({rows_sql}) s
          WHERE {group_col} IS NOT NULL AND {item_col} IS NOT NULL
          GROUP BY 1, 2
        ),
        packed AS (
          SELECT grp, CAST(SUM(c) AS BIGINT) AS n,
                 CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(list_aggregate(
                     list_transform(list(c), x -> x * (x - 1)), 'sum')
                   AS BIGINT) AS same
          FROM per GROUP BY grp
        )
        SELECT {", ".join(_FINAL)} FROM (
          SELECT grp, n AS n_rows, k AS n_items,
                 n * (n - 1) - same AS num,
                 n * (n - 1) AS den
          FROM packed
        ) t
    """
