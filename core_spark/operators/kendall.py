"""Kendall tau-b rank correlation per key: did the ranking shift?

The rank-stability statistic (Kendall 1938; tau-b tie correction,
Kendall 1945): over paired values (x, y) — the same items measured in
two periods, two scorers, two retrieval systems —

    tau_b = (C - D) / sqrt((n0 - n1) * (n0 - n2))

with C/D = concordant/discordant pairs, n0 = n(n-1)/2, n1/n2 = pairs
tied in x / in y. tau_b = 1: the ranking held exactly; 0: unrelated;
-1: fully inverted. In a crawl setting it is the drift meter between
snapshots (host-popularity stability, BM25-vs-new-scorer agreement)
— the theilsen family's missing CORRELATION flavor (emerging.py's
Mann-Kendall S is exactly C - D against time; this generalizes to
arbitrary paired columns and adds the tie-corrected normalizer).

Exactness stance: every pair contributes integers — the sign product
sign(dx)*sign(dy) in {-1,0,1} via nested integer CASE (never the
engine SIGN(), whose return type differs cross-engine) and tie
indicators — so cd, n1, n2, n0 are EXACT BIGINTs; tau_b is ONE
trailing IEEE division over one exactly-rounded SQRT of a DOUBLE
product of exact factors (the variogram sqrt precedent), NULL via
integer CASE when x or y is constant (n0 = n1 or n0 = n2). Pair
contributions are symmetric under swap (both signs flip, the product
doesn't), so NO item identity or ordering is needed — any pair
enumeration gives the same sums.

Scale shape (the theilsen recipe): ONE hash-agg buckets the raw rows
to (key, x, y) — callers usually aggregate upstream — then per key a
collect_list + ONE within-row HOF aggregate over the i<j pair stream
with a struct accumulator (zero joins, zero Python; interpreted-HOF
volume bounded by the in-plan raise_error guard at ``max_points`` —
PLANS §109 budget: the default 2000 points = 2M lambda evals per
key). Keys with < 2 items are ABSENT (no pair, no evidence).

The DuckDB twin is the INDEPENDENT row plan: an rn < rn' self-join
over row_number'd items generates pair ROWS (no arrays, no HOFs)
summed by plain conditional aggregates — legal because of the swap
symmetry above.

No reference counterpart (specvital/core has no statistics
subsystem); the statistic is the published Kendall formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# identical final projection text on both engines
_FINAL = (
    "key",
    "CAST(n AS BIGINT) AS n_points",
    "CAST(n * (n - 1) DIV 2 AS BIGINT) AS n0",
    "CAST(cd AS BIGINT) AS cd",
    "CAST(tx AS BIGINT) AS n1",
    "CAST(ty AS BIGINT) AS n2",
    "CASE WHEN n * (n - 1) DIV 2 > tx AND n * (n - 1) DIV 2 > ty THEN"
    " CAST(cd AS DOUBLE)"
    " / SQRT(CAST(n * (n - 1) DIV 2 - tx AS DOUBLE)"
    " * CAST(n * (n - 1) DIV 2 - ty AS DOUBLE))"
    " END AS tau_b",
)


def _sgn(d: str) -> str:
    return f"CASE WHEN {d} > 0 THEN 1L WHEN {d} < 0 THEN -1L ELSE 0L END"


def kendall_tau(
    pairs: DataFrame,
    key_col: str = "key",
    x_col: str = "x",
    y_col: str = "y",
    max_points: int = 2000,
) -> DataFrame:
    """(key, n_points, n0, cd, n1, n2, tau_b): Kendall tau-b of the
    paired (x, y) rows per key; keys with < 2 rows absent, constant
    x or y reports NULL tau_b, groups beyond ``max_points`` raise
    in-plan."""
    if int(max_points) < 2:
        raise ValueError(
            f"kendall_tau: max_points must be >= 2, got {max_points}")
    dx = "(element_at(_a, i).x - element_at(_a, j).x)"
    dy = "(element_at(_a, i).y - element_at(_a, j).y)"
    pair = (
        f"struct({_sgn(dx)} * {_sgn(dy)} AS cd,"
        f" CASE WHEN {dx} = 0 THEN 1L ELSE 0L END AS tx,"
        f" CASE WHEN {dy} = 0 THEN 1L ELSE 0L END AS ty)"
    )
    guard = (
        f"CASE WHEN size(_a) > {int(max_points)} THEN"
        f" CAST(raise_error('kendall_tau: group exceeds"
        f" {int(max_points)} points — aggregate coarser') AS INT)"
        " ELSE size(_a) END"
    )
    return (
        pairs.selectExpr(
            f"{key_col} AS key",
            f"CAST({x_col} AS BIGINT) AS _x",
            f"CAST({y_col} AS BIGINT) AS _y",
        )
        .where("key IS NOT NULL AND _x IS NOT NULL AND _y IS NOT NULL")
        .groupBy("key")
        .agg(F.expr("collect_list(struct(_x AS x, _y AS y)) AS _a"))
        .selectExpr("key", "_a", f"{guard} AS _n")
        .where("_n >= 2")
        .selectExpr(
            "key", "_n AS n",
            "aggregate(flatten(transform(sequence(2, _n),"
            " i -> transform(sequence(1, i - 1),"
            f" j -> {pair}))),"
            " struct(0L AS cd, 0L AS tx, 0L AS ty),"
            " (a, p) -> struct(a.cd + p.cd AS cd, a.tx + p.tx AS tx,"
            " a.ty + p.ty AS ty)) AS _s",
        )
        .selectExpr("key", "n", "_s.cd AS cd", "_s.tx AS tx", "_s.ty AS ty")
        .selectExpr(*_FINAL)
    )


def sql_kendall_tau(
    pairs_sql: str,
    key_col: str = "key",
    x_col: str = "x",
    y_col: str = "y",
) -> str:
    """DuckDB twin via the INDEPENDENT row plan: row_number'd items,
    rn < rn' self-join pair rows, conditional-sum aggregates (swap
    symmetry makes any enumeration order correct); same final
    projection text. ``pairs_sql`` must yield (key, x, y)."""
    return f"""
        WITH items AS (
          SELECT {key_col} AS key,
                 CAST({x_col} AS BIGINT) AS x,
                 CAST({y_col} AS BIGINT) AS y,
                 row_number() OVER (PARTITION BY {key_col}
                                    ORDER BY {x_col}, {y_col}) AS rn
          FROM ({pairs_sql}) s
          WHERE {key_col} IS NOT NULL AND {x_col} IS NOT NULL
            AND {y_col} IS NOT NULL
        ),
        pair_sums AS (
          SELECT a.key,
                 CAST(SUM(
                   (CASE WHEN a.x - b.x > 0 THEN 1
                         WHEN a.x - b.x < 0 THEN -1 ELSE 0 END)
                   * (CASE WHEN a.y - b.y > 0 THEN 1
                           WHEN a.y - b.y < 0 THEN -1 ELSE 0 END)
                 ) AS BIGINT) AS cd,
                 CAST(SUM(CASE WHEN a.x = b.x THEN 1 ELSE 0 END)
                   AS BIGINT) AS tx,
                 CAST(SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END)
                   AS BIGINT) AS ty
          FROM items a
          JOIN items b ON a.key = b.key AND a.rn < b.rn
          GROUP BY a.key
        ),
        counts AS (
          SELECT key, CAST(COUNT(*) AS BIGINT) AS n
          FROM items GROUP BY key
        )
        SELECT {", ".join(_FINAL).replace(" DIV ", " // ")}
        FROM (
          SELECT c.key, c.n, p.cd, p.tx, p.ty
          FROM counts c JOIN pair_sums p ON c.key = p.key
          WHERE c.n >= 2
        ) t
    """
