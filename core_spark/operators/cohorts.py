"""Cohort retention: of the users who arrived in week W, how many
were still active k weeks later?

The canonical growth-analytics matrix (cohort = first-activity
period, age = periods since): retention(W, k) = |users with first
activity in W active in W+k| / |cohort W|. For a crawl it reads
"of the hosts first seen in week W, how many still respond k weeks
on" — the decay curve capacity planning and recrawl scheduling key
on.

All-integer: periods are integer buckets, cohort assignment is a
MIN, activity is a DISTINCT, cell counts are exact BIGINT;
retention is the ONE trailing IEEE division beside its exact
factors. Age 0 is the cohort itself (retention exactly 1.0 by
construction — emitted as a verification row, not dropped). Cells
with zero retained users are ABSENT (sparse matrix semantics; the
downstream pivot densifies if it wants zeros).

Scale shape: ONE distinct on the uniform (user, period) grain eats
raw event volume; cohorts via ONE min hash-agg on the user key; ONE
uniform equi join attaches the cohort to each active period (never
a window over events); two final hash-aggs (cell counts, cohort
sizes) + ONE broadcast join of the tiny cohort-size table. No
window anywhere.

The DuckDB twin is the INDEPENDENT plan: cohort via a min() window
over the distinct grain (no join), cells from the same windowed
table — window semantics instead of join semantics.

No reference counterpart (specvital/core has no event-analytics
subsystem); the construct is the standard cohort-retention matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# identical final projection text on both engines
_FINAL = (
    "CAST(cohort AS BIGINT) AS cohort",
    "CAST(age AS BIGINT) AS age",
    "CAST(n_active AS BIGINT) AS n_active",
    "CAST(cohort_size AS BIGINT) AS cohort_size",
    "CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE)"
    " AS retention",
)


def cohort_retention(
    events: DataFrame,
    key_col: str = "key",
    period_col: str = "period",
) -> DataFrame:
    """(cohort, age, n_active, cohort_size, retention) — sparse
    cohort-retention matrix over integer periods; age 0 rows carry
    retention 1.0 by construction; NULL key/period rows dropped."""
    active = (
        events.selectExpr(
            f"{key_col} AS key",
            f"CAST({period_col} AS BIGINT) AS period")
        .where("key IS NOT NULL AND period IS NOT NULL")
        .distinct()
    )
    cohorts = active.groupBy("key").agg(
        F.expr("CAST(MIN(period) AS BIGINT)").alias("cohort"))
    cells = (
        active.join(cohorts, "key")
        .selectExpr("cohort", "period - cohort AS age")
        .groupBy("cohort", "age")
        .agg(F.count("*").cast("long").alias("n_active"))
    )
    sizes = cohorts.groupBy("cohort").agg(
        F.count("*").cast("long").alias("cohort_size"))
    return (
        cells.join(F.broadcast(sizes), "cohort")
        .selectExpr(*_FINAL)
    )


def sql_cohort_retention(
    events_sql: str,
    key_col: str = "key",
    period_col: str = "period",
) -> str:
    """DuckDB twin via the INDEPENDENT window plan: cohort = min()
    window over the distinct grain (no cohort join); same final
    projection text. ``events_sql`` must yield (key, period)."""
    return f"""
        WITH active AS (
          SELECT DISTINCT {key_col} AS key,
                 CAST({period_col} AS BIGINT) AS period
          FROM ({events_sql}) s
          WHERE {key_col} IS NOT NULL AND {period_col} IS NOT NULL
        ),
        tagged AS (
          SELECT key, period,
                 MIN(period) OVER (PARTITION BY key) AS cohort
          FROM active
        ),
        cells AS (
          SELECT cohort, period - cohort AS age,
                 CAST(COUNT(*) AS BIGINT) AS n_active
          FROM tagged GROUP BY 1, 2
        ),
        sizes AS (
          SELECT cohort, CAST(COUNT(DISTINCT key) AS BIGINT)
                   AS cohort_size
          FROM tagged GROUP BY cohort
        )
        SELECT {", ".join(_FINAL)} FROM (
          SELECT c.cohort, c.age, c.n_active, s.cohort_size
          FROM cells c JOIN sizes s ON c.cohort = s.cohort
        ) t
    """
