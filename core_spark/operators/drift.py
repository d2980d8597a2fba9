"""Total-variation drift between two corpus slices' histograms.

The distribution-shift meter monitoring pipelines gate on: over a
shared bucketing (length deciles, language, score bands), how far
apart are slice A's and slice B's histograms? The industry habit is
PSI — a log formula this engine's portability rules exclude; total
variation distance

    TV = (1/2) * SUM over buckets |p_b - q_b|

is the tighter, metric, log-free alternative (it bounds every
event-probability difference, which is the operational guarantee a
drift alarm actually wants): TV = 0 identical, TV = 1 disjoint.

Exactness (the cross-multiplication recipe): with per-bucket counts
a_b, b_b and totals N_a, N_b,

    TV = SUM |a_b * N_b - b_b * N_a| / (2 * N_a * N_b)

whose numerator is an EXACT BIGINT sum of absolute integer
cross-differences (order-free) and whose denominator is one exact
product — TV itself is ONE trailing IEEE division beside both, NULL
via integer CASE when either slice is empty. Buckets seen in only
one slice contribute their full one-sided mass (COALESCE 0 on the
other side) — dropping them would understate drift.

Scale shape: ONE uniform hash-agg on the bucket key with
conditional slice sums (map-side combine eats the row stream), ONE
1-row re-agg. No window, no join in the Spark plan.

Overflow envelope: a_b * N_b needs slice sizes < 3e9 rows; past
that pre-divide counts by a common factor (TV is scale-invariant).

The DuckDB twin is the INDEPENDENT plan: per-slice histograms as two
subqueries FULL-OUTER-joined on bucket (the keyness twin's shape)
with totals attached by scalar subqueries.

No reference counterpart (specvital/core has no monitoring
subsystem); the statistic is the classical total variation
distance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# identical final projection text on both engines
_FINAL = (
    "CAST(n_a AS BIGINT) AS n_a",
    "CAST(n_b AS BIGINT) AS n_b",
    "CAST(n_buckets AS BIGINT) AS n_buckets",
    "CAST(num AS BIGINT) AS num",
    "CAST(2 * n_a * n_b AS BIGINT) AS den",
    "CASE WHEN n_a <> 0 AND n_b <> 0 THEN"
    " CAST(num AS DOUBLE) / CAST(2 * n_a * n_b AS DOUBLE)"
    " END AS tv",
)


def tv_distance(
    rows: DataFrame, is_a_col: str = "is_a", bucket_col: str = "bucket"
) -> DataFrame:
    """One row (n_a, n_b, n_buckets, num, den, tv): total variation
    distance between the bucket histograms of slice A (``is_a_col``
    true) and slice B; NULL bucket rows dropped, one-sided buckets
    fully counted; NULL tv when either slice is empty."""
    per = (
        rows.where(
            F.col(is_a_col).isNotNull() & F.col(bucket_col).isNotNull())
        .selectExpr(
            f"{bucket_col} AS b",
            f"CASE WHEN {is_a_col} THEN 1L ELSE 0L END AS _ia",
        )
        .groupBy("b")
        .agg(
            F.expr("CAST(SUM(_ia) AS BIGINT)").alias("ca"),
            F.expr("CAST(SUM(1 - _ia) AS BIGINT)").alias("cb"),
        )
    )
    agg = per.agg(
        F.expr("CAST(COALESCE(SUM(ca), 0) AS BIGINT)").alias("n_a"),
        F.expr("CAST(COALESCE(SUM(cb), 0) AS BIGINT)").alias("n_b"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_buckets"),
    )
    # numerator needs the totals per bucket: one broadcast of the
    # 1-row totals back onto the tiny bucket table
    num = (
        per.crossJoin(F.broadcast(agg.select("n_a", "n_b")))
        .selectExpr("abs(ca * n_b - cb * n_a) AS _d")
        .agg(F.expr("CAST(COALESCE(SUM(_d), 0) AS BIGINT)").alias("num"))
    )
    return (
        agg.crossJoin(F.broadcast(num))
        .selectExpr(*_FINAL)
    )


def sql_tv_distance(
    rows_sql: str, is_a_col: str = "is_a", bucket_col: str = "bucket"
) -> str:
    """DuckDB twin via the INDEPENDENT two-histogram plan: per-slice
    subqueries FULL-OUTER-joined on bucket + scalar-subquery totals;
    same final projection text. ``rows_sql`` must yield (is_a,
    bucket)."""
    base = (
        f"SELECT {bucket_col} AS b,"
        f" CASE WHEN {is_a_col} THEN 1 ELSE 0 END AS ia"
        f" FROM ({rows_sql}) s"
        f" WHERE {is_a_col} IS NOT NULL AND {bucket_col} IS NOT NULL"
    )
    return f"""
        WITH base AS ({base}),
        ha AS (
          SELECT b, CAST(COUNT(*) AS BIGINT) AS ca
          FROM base WHERE ia = 1 GROUP BY b
        ),
        hb AS (
          SELECT b, CAST(COUNT(*) AS BIGINT) AS cb
          FROM base WHERE ia = 0 GROUP BY b
        ),
        merged AS (
          SELECT COALESCE(ha.b, hb.b) AS b,
                 COALESCE(ha.ca, 0) AS ca, COALESCE(hb.cb, 0) AS cb
          FROM ha FULL OUTER JOIN hb ON ha.b = hb.b
        ),
        tot AS (
          SELECT CAST(COALESCE(SUM(ia), 0) AS BIGINT) AS n_a,
                 CAST(COALESCE(SUM(1 - ia), 0) AS BIGINT) AS n_b
          FROM base
        ),
        agg AS (
          SELECT tot.n_a, tot.n_b,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM merged)
                   AS n_buckets,
                 (SELECT CAST(COALESCE(SUM(
                      abs(m.ca * tot.n_b - m.cb * tot.n_a)), 0)
                    AS BIGINT) FROM merged m) AS num
          FROM tot
        )
        SELECT {", ".join(_FINAL)} FROM agg
    """
