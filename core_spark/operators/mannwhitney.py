"""Mann-Whitney U rank-sum test per key: did the distribution shift?

The nonparametric two-sample location test (Mann & Whitney 1947;
Wilcoxon 1945) with its ROC identity: U/(n_a*n_b) IS the AUC — the
probability a random A-row outranks a random B-row. In a corpus
setting it is the quality-shift detector between slices (did
mega-host documents get shorter than the long tail? did this crawl's
scores drop vs the last one?) — a DISTRIBUTION comparison where
t-tests' normality assumption is web-data fiction.

    U_A = R_A - n_a(n_a+1)/2        (R_A = rank sum of group A,
                                     average ranks for ties)
    z   = (U - n_a n_b/2) / sigma,
    sigma^2 = n_a n_b [(n^3 - n) - SUM(t^3 - t)] / (12 n (n-1))

Exactness stance: everything is integers until the last step. Ranks
NEVER materialize per row — at the tie-collapsed DISTINCT-VALUE
grain (the gini recipe), a value block with c rows after cb smaller
rows has DOUBLED average rank 2*cb + c + 1 (always integer), so the
doubled rank sum r2a = SUM(c_a * (2*cb + c + 1)), the doubled U
u2 = r2a - n_a(n_a+1), and the tie term SUM(c^3 - c) are all EXACT
BIGINTs from hash-aggs. auc = u2 / (2 n_a n_b) and
z = (u2 - n_a n_b) / SQRT(n_a n_b ((n^3-n) - ties) / (3 n (n-1)))
are each a short fixed-order IEEE tail (mul/div/sqrt are all
correctly rounded — the variogram sqrt precedent) beside their exact
factors. z is NULL via integer CASE when the variance vanishes (all
values tied); keys missing either group are ABSENT (no contrast, no
evidence). NULL key/group/value rows are dropped.

Scale shape: ONE hash-agg to (key, value) with per-group conditional
counts — map-side combine eats the row volume — then a cumsum window
over the tie-collapsed distinct-value grain ONLY (score domains are
small; the ~1e8-row table never crosses a window), then ONE re-agg
per key. An in-plan raise_error guard fails loudly past ``max_n``
rows per key (the n^3 BIGINT envelope: n < 2e6 — past that,
pre-bucket the value domain coarser).

The DuckDB twin is the INDEPENDENT literal-ranks plan: row-level
row_number within key, per-block doubled average rank recovered as
2*SUM(rn)/COUNT(*) (exactly divisible), no closed-form rank blocks.

No reference counterpart (specvital/core has no statistics
subsystem); the test is the published Mann-Whitney formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# identical final projection text on both engines, over the computed
# grain (key, n1, n2, n, r2a, tsum) with u2 = r2a - n1*(n1+1)
_FINAL = (
    "key",
    "CAST(n1 AS BIGINT) AS n_a",
    "CAST(n2 AS BIGINT) AS n_b",
    "CAST(r2a - n1 * (n1 + 1) AS BIGINT) AS u2",
    "CAST(tsum AS BIGINT) AS tie_sum",
    "CAST(r2a - n1 * (n1 + 1) AS DOUBLE)"
    " / (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS auc",
    "CASE WHEN (n * n * n - n) - tsum > 0 THEN"
    " CAST(r2a - n1 * (n1 + 1) - n1 * n2 AS DOUBLE)"
    " / SQRT(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)"
    " * CAST((n * n * n - n) - tsum AS DOUBLE)"
    " / CAST(3 * n * (n - 1) AS DOUBLE))"
    " END AS z",
)


def rank_sum_test(
    rows: DataFrame,
    group_a,
    key_col: str = "key",
    group_col: str = "grp",
    value_col: str = "value",
    max_n: int = 1_000_000,
) -> DataFrame:
    """(key, n_a, n_b, u2, tie_sum, auc, z) per key: Mann-Whitney U of
    ``value_col`` between rows where ``group_col`` = ``group_a`` (A)
    and all other non-null groups (B); keys missing either group are
    absent; NULL z when all values tie; > ``max_n`` rows per key
    raises in-plan."""
    if int(max_n) < 2:
        raise ValueError(
            f"rank_sum_test: max_n must be >= 2, got {max_n}")
    lit_a = repr(group_a) if isinstance(group_a, str) else str(group_a)
    per = (
        rows.where(
            F.col(key_col).isNotNull()
            & F.col(group_col).isNotNull()
            & F.col(value_col).isNotNull())
        .selectExpr(
            f"{key_col} AS key",
            f"CAST({value_col} AS BIGINT) AS v",
            f"CASE WHEN {group_col} = {lit_a} THEN 1L ELSE 0L END AS _ia",
        )
        .groupBy("key", "v")
        .agg(
            F.expr("CAST(SUM(_ia) AS BIGINT)").alias("ca"),
            F.expr("CAST(SUM(1 - _ia) AS BIGINT)").alias("cb"),
        )
    )
    w = (
        Window.partitionBy("key").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = per.select(
        "key", "ca", "cb",
        (F.col("ca") + F.col("cb")).alias("c"),
        F.coalesce(F.sum(F.col("ca") + F.col("cb")).over(w), F.lit(0))
        .alias("below"),
    )
    guard = (
        f"CASE WHEN n1 + n2 > {int(max_n)} THEN"
        f" CAST(raise_error('rank_sum_test: key exceeds {int(max_n)}"
        f" rows — pre-bucket the value domain') AS BIGINT)"
        " ELSE n1 + n2 END"
    )
    agg = (
        cum.groupBy("key")
        .agg(
            F.expr("CAST(SUM(ca) AS BIGINT)").alias("n1"),
            F.expr("CAST(SUM(cb) AS BIGINT)").alias("n2"),
            F.expr(
                "CAST(SUM(ca * (2 * below + c + 1)) AS BIGINT)"
            ).alias("r2a"),
            F.expr(
                "CAST(SUM(c * (c - 1) * (c + 1)) AS BIGINT)"
            ).alias("tsum"),
        )
        .where("n1 >= 1 AND n2 >= 1")
        .selectExpr("key", "n1", "n2", "r2a", "tsum", f"{guard} AS n")
    )
    return agg.selectExpr(*_FINAL)


def sql_rank_sum_test(
    rows_sql: str,
    group_a,
    key_col: str = "key",
    group_col: str = "grp",
    value_col: str = "value",
) -> str:
    """DuckDB twin via the INDEPENDENT literal-ranks plan: row-level
    row_number within key, doubled block-average ranks recovered as
    2*SUM(rn)/COUNT(*) per (key, value) — exactly divisible, no
    closed-form rank arithmetic; same final projection text.
    ``rows_sql`` must yield (key_col, group_col, value_col)."""
    lit_a = repr(group_a) if isinstance(group_a, str) else str(group_a)
    return f"""
        WITH r AS (
          SELECT {key_col} AS key,
                 CAST({value_col} AS BIGINT) AS v,
                 CASE WHEN {group_col} = {lit_a} THEN 1 ELSE 0 END AS ia,
                 row_number() OVER (PARTITION BY {key_col}
                                    ORDER BY {value_col}) AS rn
          FROM ({rows_sql}) s
          WHERE {key_col} IS NOT NULL AND {group_col} IS NOT NULL
            AND {value_col} IS NOT NULL
        ),
        blocks AS (
          SELECT key, v,
                 CAST(SUM(ia) AS BIGINT) AS ca,
                 CAST(COUNT(*) AS BIGINT) AS c,
                 CAST((2 * SUM(rn)) // COUNT(*) AS BIGINT) AS dr
          FROM r GROUP BY key, v
        ),
        agg AS (
          SELECT key,
                 CAST(SUM(ca) AS BIGINT) AS n1,
                 CAST(SUM(c - ca) AS BIGINT) AS n2,
                 CAST(SUM(ca * dr) AS BIGINT) AS r2a,
                 CAST(SUM(c * (c - 1) * (c + 1)) AS BIGINT) AS tsum
          FROM blocks GROUP BY key
        )
        SELECT {", ".join(_FINAL)} FROM (
          SELECT key, n1, n2, r2a, tsum, n1 + n2 AS n
          FROM agg WHERE n1 >= 1 AND n2 >= 1
        ) t
    """
