"""Gini concentration of a corpus across groups (hosts, domains, ...).

The crawl-concentration audit: how unequally are documents spread
across hosts? G = 0 — every host contributes equally; G → 1 — a few
mega-hosts dominate (the classic web shape, and the thing a per-host
cap is supposed to fix — this is the one-number BEFORE/AFTER meter
for weburl.host_cap and host_quality_gate).

Exactness — Gini is fully RATIONAL on count data. With x_1 ≤ … ≤ x_n
the sorted group sizes (BIGINT) and T = Σx:

    G = (2·Σ(i·x_i) − (n+1)·T) / (n·T)

Both factors are exact BIGINT sums; G is ONE trailing IEEE division
riding beside its exact num/den (the assortativity/od_flows recipe).
Empty input reports n=0 with NULL gini; a single group is exactly 0.
Ties are rank-permutation invariant (equal x share Σi·x across any
rank assignment), which is what makes the grain trick below sound.

Scale shape — NEVER a global row_number over the group table. Ranks
collapse in closed form at the tie-collapsed DISTINCT-COUNT grain:
groups with count c occupy ranks below_c+1 … below_c+m_c, so

    Σ(i·x_i) = Σ_c c·(m_c·below_c + m_c·(m_c+1)/2)

The per-group hash-agg shuffles on the uniform group key; the
per-count re-agg shrinks the table to ≤ max(count) rows (the
distinct-size grain — thousands, not the ~1e8 hosts of a 100-TB
crawl); only THAT tiny table crosses the single-partition cumsum
window, then ONE global 1-row aggregate. m·(m+1) DIV 2 is exact
(consecutive integers). NULL group keys are dropped (no-evidence
convention).

Overflow envelope (the apportion convention): terms are bounded by
n·T — fine up to n·T < 9e18 (1e8 hosts × 1e10 docs); past that,
pre-aggregate at a coarser grain or pre-divide counts (G is
scale-invariant in x).

The DuckDB twin is the INDEPENDENT plan: a literal row_number() over
(cnt, item) — the textbook rank formula with deterministic ties —
no distinct-count grain, no closed-form rank block.

No reference counterpart (specvital/core has no corpus-statistics
subsystem); the statistic is the classical Gini rank formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# identical final projection text on both engines: exact BIGINT
# num/den, one trailing IEEE division, NULL (never NaN) on empty input
_FINAL = (
    "CAST(n_groups AS BIGINT) AS n_groups",
    "CAST(total AS BIGINT) AS total",
    "CAST(num AS BIGINT) AS num",
    "CAST(den AS BIGINT) AS den",
    "CASE WHEN den <> 0 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE)"
    " END AS gini",
)


def gini_concentration(items: DataFrame, item_col: str = "item") -> DataFrame:
    """One row (n_groups, total, num, den, gini): Gini coefficient of
    the per-group row counts of ``items``; NULL gini on empty input,
    exactly 0.0 for a single group or all-equal groups."""
    per = (
        items.where(F.col(item_col).isNotNull())
        .groupBy(F.col(item_col).alias("_g"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    # tie-collapsed distinct-count grain: tiny (<= max count rows), the
    # only table that crosses the single-partition cumsum window
    byc = per.groupBy("cnt").agg(F.count("*").cast("long").alias("m"))
    w = (
        Window.orderBy("cnt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = byc.select(
        "cnt", "m", F.coalesce(F.sum("m").over(w), F.lit(0)).alias("below")
    )
    sums = cum.agg(
        F.expr("CAST(SUM(m) AS BIGINT)").alias("n"),
        F.expr("CAST(SUM(cnt * m) AS BIGINT)").alias("tot"),
        F.expr(
            "CAST(SUM(cnt * (m * below + (m * (m + 1)) DIV 2)) AS BIGINT)"
        ).alias("sri"),
    )
    return sums.selectExpr(
        "coalesce(n, 0) AS n_groups",
        "coalesce(tot, 0) AS total",
        "coalesce(2 * sri - (n + 1) * tot, 0) AS num",
        "coalesce(n * tot, 0) AS den",
    ).selectExpr(*_FINAL)


def sql_gini_concentration(items_sql: str, item_col: str = "item") -> str:
    """DuckDB twin via the INDEPENDENT textbook plan: literal
    row_number() over (cnt, item) with deterministic ties, the direct
    rank formula, the same final projection text. ``items_sql`` must
    yield ``item_col``."""
    return f"""
        WITH per AS (
          SELECT {item_col} AS g, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM ({items_sql}) s
          WHERE {item_col} IS NOT NULL
          GROUP BY {item_col}
        ),
        ranked AS (
          SELECT cnt, row_number() OVER (ORDER BY cnt, g) AS i FROM per
        ),
        sums AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(cnt) AS BIGINT) AS tot,
                 CAST(SUM(i * cnt) AS BIGINT) AS sri
          FROM ranked
        )
        SELECT {", ".join(_FINAL)} FROM (
          SELECT COALESCE(n, 0) AS n_groups,
                 COALESCE(tot, 0) AS total,
                 COALESCE(2 * sri - (n + 1) * tot, 0) AS num,
                 COALESCE(n * tot, 0) AS den
          FROM sums
        ) t
    """
