"""Two-proportion A/B test — the experiment readout beside the rank tests.

quality_shift (Mann-Whitney) asks whether two score DISTRIBUTIONS
differ; an experiment usually asks the simpler sharper question: did
variant B's CONVERSION RATE beat variant A's? The standard readout is
the pooled two-proportion z statistic

    z = (p_a - p_b) / sqrt( p·(1-p) · (1/n_a + 1/n_b) ),   p pooled.

Exactness discipline: the four sufficient statistics (n_a, c_a, n_b,
c_b) are exact BIGINTs from ONE hash-agg; every reported ratio and
the z itself are a FIXED-ORDER IEEE chain over those integers,
emitted from IDENTICAL projection text on both engines — division,
multiplication and the correctly-rounded sqrt are the portable
carve-outs (the hotspots_gi precedent), so the driver hash compares
the DOUBLE bit-for-bit. Degenerate arms (empty variant, p in {0,1}
making the standard error zero) report NULL z via integer CASE,
never NaN/Inf.

Scale shape: a per-unit conversion table (one row per experimental
unit — the caller aggregates events to units first, which is also
what guards against within-user pseudo-replication) → one 2-row
hash-agg with map-side combine → a 1-row final projection. Nothing
shuffles but partial sums.

No reference counterpart; the statistic is the classical pooled
two-proportion z-test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# identical final projection text on both engines (the drift.py pattern)
_FINAL = (
    "CAST(n_a AS BIGINT) AS n_a",
    "CAST(c_a AS BIGINT) AS c_a",
    "CAST(n_b AS BIGINT) AS n_b",
    "CAST(c_b AS BIGINT) AS c_b",
    "CASE WHEN n_a > 0 THEN CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
    " END AS rate_a",
    "CASE WHEN n_b > 0 THEN CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE)"
    " END AS rate_b",
    # pooled variance factor is zero iff all units converted or none:
    # the integer guard keeps NULL (never NaN/Inf) out of the hash
    "CASE WHEN n_a > 0 AND n_b > 0"
    " AND (c_a + c_b) > 0 AND (c_a + c_b) < (n_a + n_b) THEN"
    " (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
    "  - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
    " / sqrt("
    "   (CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))"
    "   * (1.0 - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))"
    "   * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))"
    " ) END AS z",
)


def two_proportion(units: DataFrame) -> DataFrame:
    """One row (n_a, c_a, n_b, c_b, rate_a, rate_b, z) from a
    per-unit table (is_a BOOLEAN, converted BOOLEAN). NULL flags are
    dropped (a unit outside both arms measures nothing)."""
    agg = (
        units.where("is_a IS NOT NULL AND converted IS NOT NULL")
        .selectExpr(
            "CASE WHEN is_a THEN 1L ELSE 0L END AS ia",
            "CASE WHEN converted THEN 1L ELSE 0L END AS cv",
        )
        .agg(
            F.expr("CAST(COALESCE(SUM(ia), 0) AS BIGINT)").alias("n_a"),
            F.expr(
                "CAST(COALESCE(SUM(ia * cv), 0) AS BIGINT)"
            ).alias("c_a"),
            F.expr(
                "CAST(COALESCE(SUM(1 - ia), 0) AS BIGINT)"
            ).alias("n_b"),
            F.expr(
                "CAST(COALESCE(SUM((1 - ia) * cv), 0) AS BIGINT)"
            ).alias("c_b"),
        )
    )
    return agg.selectExpr(*_FINAL)


def sql_two_proportion(units_sql: str) -> str:
    """DuckDB twin: same sufficient-statistic agg, same final text.
    ``units_sql`` must yield (is_a, converted)."""
    return f"""
        WITH agg AS (
            SELECT CAST(COALESCE(SUM(ia), 0) AS BIGINT) AS n_a,
                   CAST(COALESCE(SUM(ia * cv), 0) AS BIGINT) AS c_a,
                   CAST(COALESCE(SUM(1 - ia), 0) AS BIGINT) AS n_b,
                   CAST(COALESCE(SUM((1 - ia) * cv), 0) AS BIGINT)
                       AS c_b
            FROM (
                SELECT CASE WHEN is_a THEN 1 ELSE 0 END AS ia,
                       CASE WHEN converted THEN 1 ELSE 0 END AS cv
                FROM ({units_sql}) u
                WHERE is_a IS NOT NULL AND converted IS NOT NULL
            ) s
        )
        SELECT {", ".join(_FINAL)} FROM agg
    """
