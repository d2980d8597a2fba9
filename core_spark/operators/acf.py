"""Sample autocorrelation per key: is the series periodic?

The standard sample ACF (Box & Jenkins 1970): for a per-key series
x_1..x_n in bucket order and lag L,

    r_L = SUM_t (x_t - mean)(x_{t+L} - mean) / SUM_t (x_t - mean)^2

r_24 high on hourly buckets = daily periodicity; r_168 = weekly —
the seasonality screen run before any forecasting or anomaly model
of crawl volume, and the autocorrelation flavor the trend family
lacks (emerging = IS there a trend, theil_sen = how steep, cusum =
when did it break, acf = does it REPEAT).

Exactness stance (the moran denominator-clearing recipe): with
S = sum(x) and integer x, the scaled deviation d_t = n*x_t - S is an
EXACT BIGINT, and both

    num_L = SUM d_t * d_{t+L}        den = SUM d_t^2

are exact integer aggregates whose n^2 factors cancel in num/den;
acf is ONE trailing IEEE division beside its exact factors, NULL via
integer CASE when the series is constant (den = 0). Lag pairs are
matched at EXACT bucket distance (t' = t + L): a gap in a sparse
series contributes no pair rather than a wrong one (documented
sparse-series semantics — densify upstream if zeros are meant).

Overflow envelope: d_t^2 <= (n * max|x|)^2 must fit int64, so
n * max(x) < 3e9 (a thousand buckets of million-count volumes) — an
in-plan raise_error guard enforces it loudly; past that, pre-divide
or coarsen buckets.

Scale shape: ONE uniform hash-agg buckets the raw stream; n and S
attach via an unordered window AT THE BUCKET GRAIN (no join, no
sort); the lag pairing explodes each bucket row once per lag
(x max_lag, bounded small) into ONE uniform equi join on
(key, t + L) = (key, t'); final hash-agg per (key, lag). No window
over raw rows, no collect.

The DuckDB twin is the INDEPENDENT plan: per-key scalar stats via a
plain GROUP BY joined back (no window), lag pairs via an explicit
t' = t + L self-join per lag UNION ALL'd (no explode).

No reference counterpart (specvital/core has no statistics
subsystem); the estimator is the standard sample ACF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_D_MAX = 3_000_000_000  # sqrt(int64)-ish: |d| above this overflows d^2

# identical final projection text on both engines
_FINAL = (
    "key",
    "CAST(lag AS BIGINT) AS lag",
    "CAST(n AS BIGINT) AS n_points",
    "CAST(n_pairs AS BIGINT) AS n_pairs",
    "CAST(num AS BIGINT) AS num",
    "CAST(den AS BIGINT) AS den",
    "CASE WHEN den <> 0 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE)"
    " END AS acf",
)


def acf(
    series: DataFrame,
    lags: tuple[int, ...] = (1,),
    key_col: str = "key",
    t_col: str = "t",
    x_col: str = "x",
) -> DataFrame:
    """(key, lag, n_points, n_pairs, num, den, acf) per key and lag:
    sample autocorrelation of the bucketed (t, x) series at exact
    bucket distance ``lag``; constant series report NULL acf; lags
    with no pair report n_pairs = 0 and num = 0."""
    lags = tuple(int(v) for v in lags)
    if not lags or any(v < 1 for v in lags) or len(set(lags)) != len(lags):
        raise ValueError(
            f"acf: lags must be distinct positive ints, got {lags}")
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
    wa = Window.partitionBy("key")
    guard = (
        f"CASE WHEN abs(n * xb - s) > {_D_MAX} THEN"
        " CAST(raise_error('acf: scaled deviation overflows the int64"
        " envelope — coarsen buckets or pre-divide') AS BIGINT)"
        " ELSE n * xb - s END"
    )
    devs = (
        b.select(
            "key", "t", "xb",
            F.count("*").over(wa).alias("n"),
            F.sum("xb").over(wa).alias("s"),
        )
        .selectExpr("key", "t", "n", f"{guard} AS d")
    )
    stats = devs.groupBy("key").agg(
        F.expr("MIN(n) AS n"),
        F.expr("CAST(SUM(d * d) AS BIGINT)").alias("den"),
    )
    lag_arr = ", ".join(f"{v}L" for v in lags)
    probe = devs.selectExpr(
        "key", "d AS d0", f"explode(array({lag_arr})) AS lag", "t"
    ).selectExpr("key", "d0", "lag", "t + lag AS t2")
    home = devs.selectExpr("key", "t AS t2", "d AS d1")
    nums = (
        probe.join(home, ["key", "t2"])
        .groupBy("key", "lag")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.expr("CAST(SUM(d0 * d1) AS BIGINT)").alias("num"),
        )
    )
    return (
        stats.selectExpr(
            "key", "n", "den", f"explode(array({lag_arr})) AS lag")
        .join(nums, ["key", "lag"], "left")
        .selectExpr(
            "key", "lag", "n",
            "COALESCE(n_pairs, 0L) AS n_pairs",
            "COALESCE(num, 0L) AS num", "den")
        .selectExpr(*_FINAL)
    )


def sql_acf(
    series_sql: str,
    lags: tuple[int, ...] = (1,),
    key_col: str = "key",
    t_col: str = "t",
    x_col: str = "x",
) -> str:
    """DuckDB twin via the INDEPENDENT plan: per-key scalar stats from
    a plain GROUP BY joined back (no window), one explicit self-join
    per lag UNION ALL'd (no explode); same final projection text.
    ``series_sql`` must yield (key, t, x)."""
    lags = tuple(int(v) for v in lags)
    lag_joins = "\n          UNION ALL\n".join(
        f"""          SELECT a.key, CAST({v} AS BIGINT) AS lag,
                 CAST(COUNT(*) AS BIGINT) AS n_pairs,
                 CAST(SUM(a.d * b2.d) AS BIGINT) AS num
          FROM devs a JOIN devs b2
            ON a.key = b2.key AND b2.t = a.t + {v}
          GROUP BY a.key"""
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
          GROUP BY 1, 2
        ),
        st AS (
          SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(xb) AS BIGINT) AS s
          FROM b GROUP BY key
        ),
        devs AS (
          SELECT b.key, b.t, st.n, st.n * b.xb - st.s AS d
          FROM b JOIN st ON b.key = st.key
        ),
        dens AS (
          SELECT key, CAST(MIN(n) AS BIGINT) AS n,
                 CAST(SUM(d * d) AS BIGINT) AS den
          FROM devs GROUP BY key
        ),
        nums AS (
{lag_joins}
        ),
        grid AS (
          SELECT dens.key, dens.n, dens.den, l.lag
          FROM dens, (SELECT CAST(v AS BIGINT) AS lag
                      FROM (VALUES {lag_values}) lv(v)) l
        )
        SELECT {", ".join(_FINAL)} FROM (
          SELECT g.key, g.lag, g.n,
                 COALESCE(nums.n_pairs, 0) AS n_pairs,
                 COALESCE(nums.num, 0) AS num, g.den
          FROM grid g
          LEFT JOIN nums ON nums.key = g.key AND nums.lag = g.lag
        ) q
    """
