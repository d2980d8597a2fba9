"""Cross-correlation: does series A lead series B by k buckets?

The lead-lag screen (the CCF of Box-Jenkins transfer-function
modeling): for two bucketed series a(t), b(t) and lag L,

    r_L = corr( a(t), b(t+L) )   over the matched bucket pairs

r positive and peaked at L = 2 reads "A leads B by two buckets" —
clicks lead purchases, crawl errors lead host withdrawal, one
mirror's traffic leads its replica's. acf correlates a series with
ITSELF; this is the two-series generalization, and the per-lag
LOCAL Pearson convention (mean over the matched support, not the
global mean) is the right one when supports differ or have gaps —
documented, and mirrored exactly in the twin.

Exactness stance: the five aggregates per lag (m, Sx, Sy, Sxy, Sxx,
Syy) are EXACT BIGINTs from one hash-agg over the joined pairs; the
Pearson combination num = m*Sxy - Sx*Sy over
sqrt((m*Sxx - Sx^2)(m*Syy - Sy^2)) is evaluated as a FIXED-ORDER
IEEE double tail over those exact integers — m*Sxx can exceed int64
long before the inputs are big (unlike acf's deviation form), so
the combination deliberately crosses to double: precision-bounded
but bit-identical cross-engine, with the exact factors emitted
beside it for any consumer needing to recombine. NULL via
double-zero comparisons when either series is constant on the
matched support or m < 2.

Scale shape: ONE hash-agg buckets each side; the a-side explodes
once per lag (x|lags|, bounded small) into ONE uniform equi join on
(t + L) = t'; ONE final hash-agg per lag. Lags may be negative
(B leading A); lag rows with no matched bucket report m = 0 and
NULL r.

The DuckDB twin is the INDEPENDENT plan: one explicit self-join per
lag UNION ALL'd (no explode), aggregates in one pass per lag.

No reference counterpart (specvital/core has no statistics
subsystem); the estimator is the standard sample CCF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# identical final projection text on both engines
_FINAL = (
    "CAST(lag AS BIGINT) AS lag",
    "CAST(m AS BIGINT) AS m_pairs",
    "CAST(sx AS BIGINT) AS sx",
    "CAST(sy AS BIGINT) AS sy",
    "CAST(sxy AS BIGINT) AS sxy",
    "CAST(sxx AS BIGINT) AS sxx",
    "CAST(syy AS BIGINT) AS syy",
    "CASE WHEN m >= 2"
    " AND CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)"
    "   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0"
    " AND CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)"
    "   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0.0"
    " THEN (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)"
    "   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / SQRT((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)"
    "   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)"
    "   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
    " END AS ccf",
)


def cross_correlation(
    series: DataFrame,
    key_a,
    key_b,
    lags: tuple[int, ...] = (0,),
    key_col: str = "key",
    t_col: str = "t",
    x_col: str = "x",
) -> DataFrame:
    """(lag, m_pairs, sx, sy, sxy, sxx, syy, ccf) for each lag:
    Pearson correlation of series ``key_a`` at t with series
    ``key_b`` at t+lag over the matched buckets; unmatched lags
    report m_pairs = 0 with NULL ccf."""
    lags = tuple(int(v) for v in lags)
    if not lags or len(set(lags)) != len(lags):
        raise ValueError(
            f"cross_correlation: lags must be distinct, got {lags}")
    lit_a = repr(key_a) if isinstance(key_a, str) else str(key_a)
    lit_b = repr(key_b) if isinstance(key_b, str) else str(key_b)
    b = (
        series.selectExpr(
            f"{key_col} AS key",
            f"CAST({t_col} AS BIGINT) AS t",
            f"CAST({x_col} AS BIGINT) AS x",
        )
        .where("key IS NOT NULL AND t IS NOT NULL AND x IS NOT NULL")
        .where(f"key = {lit_a} OR key = {lit_b}")
        .groupBy("key", "t")
        .agg(F.sum("x").alias("xb"))
    )
    lag_arr = ", ".join(f"{v}L" for v in lags)
    probe = b.where(f"key = {lit_a}").selectExpr(
        "xb AS xa", f"explode(array({lag_arr})) AS lag", "t"
    ).selectExpr("xa", "lag", "t + lag AS t2")
    home = b.where(f"key = {lit_b}").selectExpr("t AS t2", "xb AS xv")
    sums = (
        probe.join(home, "t2")
        .groupBy("lag")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("m"),
            F.expr("CAST(SUM(xa) AS BIGINT)").alias("sx"),
            F.expr("CAST(SUM(xv) AS BIGINT)").alias("sy"),
            F.expr("CAST(SUM(xa * xv) AS BIGINT)").alias("sxy"),
            F.expr("CAST(SUM(xa * xa) AS BIGINT)").alias("sxx"),
            F.expr("CAST(SUM(xv * xv) AS BIGINT)").alias("syy"),
        )
    )
    grid = series.sparkSession.range(1).selectExpr(
        f"explode(array({lag_arr})) AS lag")
    return (
        grid.join(sums, "lag", "left")
        .selectExpr(
            "lag",
            "COALESCE(m, 0L) AS m",
            "COALESCE(sx, 0L) AS sx", "COALESCE(sy, 0L) AS sy",
            "COALESCE(sxy, 0L) AS sxy", "COALESCE(sxx, 0L) AS sxx",
            "COALESCE(syy, 0L) AS syy")
        .selectExpr(*_FINAL)
    )


def sql_cross_correlation(
    series_sql: str,
    key_a,
    key_b,
    lags: tuple[int, ...] = (0,),
    key_col: str = "key",
    t_col: str = "t",
    x_col: str = "x",
) -> str:
    """DuckDB twin via the INDEPENDENT plan: one explicit self-join
    per lag UNION ALL'd (no explode), COALESCE-densified against the
    literal lag list; same final projection text. ``series_sql``
    must yield (key, t, x)."""
    lags = tuple(int(v) for v in lags)
    lit_a = repr(key_a) if isinstance(key_a, str) else str(key_a)
    lit_b = repr(key_b) if isinstance(key_b, str) else str(key_b)
    lag_joins = "\n          UNION ALL\n".join(
        f"""          SELECT CAST({v} AS BIGINT) AS lag,
                 CAST(COUNT(*) AS BIGINT) AS m,
                 CAST(SUM(a.xb) AS BIGINT) AS sx,
                 CAST(SUM(b2.xb) AS BIGINT) AS sy,
                 CAST(SUM(a.xb * b2.xb) AS BIGINT) AS sxy,
                 CAST(SUM(a.xb * a.xb) AS BIGINT) AS sxx,
                 CAST(SUM(b2.xb * b2.xb) AS BIGINT) AS syy
          FROM ba a JOIN bb b2 ON b2.t = a.t + {v}"""
        for v in lags
    )
    lag_values = ", ".join(f"({v})" for v in lags)
    return f"""
        WITH b AS (
          SELECT {key_col} AS key, CAST({t_col} AS BIGINT) AS t,
                 CAST(SUM(CAST({x_col} AS BIGINT)) AS BIGINT) AS xb
          FROM ({series_sql}) src
          WHERE {key_col} IS NOT NULL AND {t_col} IS NOT NULL
            AND {x_col} IS NOT NULL
            AND ({key_col} = {lit_a} OR {key_col} = {lit_b})
          GROUP BY 1, 2
        ),
        ba AS (SELECT t, xb FROM b WHERE key = {lit_a}),
        bb AS (SELECT t, xb FROM b WHERE key = {lit_b}),
        nums AS (
{lag_joins}
        ),
        grid AS (
          SELECT CAST(v AS BIGINT) AS lag
          FROM (VALUES {lag_values}) lv(v)
        )
        SELECT {", ".join(_FINAL)} FROM (
          SELECT g.lag,
                 COALESCE(nums.m, 0) AS m,
                 COALESCE(nums.sx, 0) AS sx, COALESCE(nums.sy, 0) AS sy,
                 COALESCE(nums.sxy, 0) AS sxy,
                 COALESCE(nums.sxx, 0) AS sxx,
                 COALESCE(nums.syy, 0) AS syy
          FROM grid g LEFT JOIN nums ON nums.lag = g.lag
        ) q
    """
