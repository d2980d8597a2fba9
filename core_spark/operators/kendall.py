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

Scale shape: callers aggregate the raw stream to (key, x, y) rows
upstream; the O(m²) pair sums then run as ONE Arrow-batched numpy
stage per key group (applyInPandas) — a nested-HOF formulation is
interpreted per element and measured 27s vs <1s at 1.5k points/key
(the hausdorff lesson, PLANS §109); numpy int64 sign/compare/sum is
exact, so the SQL twin still bit-agrees. Transient m×m matrices are
bounded by 256-row blocks; groups beyond ``max_points`` fail loudly
inside the stage. Keys with < 2 items are ABSENT (no pair, no
evidence).

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


def kendall_tau(
    pairs: DataFrame,
    key_col: str = "key",
    x_col: str = "x",
    y_col: str = "y",
    max_points: int = 2000,
) -> DataFrame:
    """(key, n_points, n0, cd, n1, n2, tau_b): Kendall tau-b of the
    paired (x, y) rows per key; keys with < 2 rows absent, constant
    x or y reports NULL tau_b, groups beyond ``max_points`` fail
    loudly inside the Arrow stage.

    The O(m²) pair sums run as ONE Arrow-batched numpy stage per key
    group (applyInPandas) — nested HOF lambdas are interpreted, never
    codegen'd, and measured 27s vs <1s at 1.5k points/key (the
    hausdorff/PLANS §109 rule). All arithmetic is int64 sign/compare/
    sum — exact, so the SQL twin still bit-agrees. Row blocks of 256
    bound the transient m×m matrices regardless of max_points.
    """
    if int(max_points) < 2:
        raise ValueError(
            f"kendall_tau: max_points must be >= 2, got {max_points}")
    import numpy as np
    import pandas as pd

    key_type = pairs.schema[key_col].dataType.simpleString()
    limit = int(max_points)

    def _sums(pdf: "pd.DataFrame") -> "pd.DataFrame":
        m = len(pdf)
        if m < 2:
            return pd.DataFrame(
                {"key": [], "n": [], "cd": [], "tx": [], "ty": []}
            ).astype({"n": "int64", "cd": "int64",
                      "tx": "int64", "ty": "int64"})
        if m > limit:
            raise ValueError(
                f"kendall_tau: group exceeds {limit} points"
                " — aggregate coarser")
        x = pdf["_x"].to_numpy(dtype=np.int64)
        y = pdf["_y"].to_numpy(dtype=np.int64)
        cd = tx = ty = 0
        for lo in range(0, m, 256):
            hi = min(lo + 256, m)
            dx = x[lo:hi, None] - x[None, :]
            dy = y[lo:hi, None] - y[None, :]
            # strict upper triangle of the (block-rows x all) slab
            cols = np.arange(m)[None, :]
            mask = cols > np.arange(lo, hi)[:, None]
            sgn = np.sign(dx) * np.sign(dy)
            cd += int(sgn[mask].sum())
            tx += int(((dx == 0) & mask).sum())
            ty += int(((dy == 0) & mask).sum())
        return pd.DataFrame({
            "key": [pdf["key"].iloc[0]], "n": [m],
            "cd": [cd], "tx": [tx], "ty": [ty],
        })

    cleaned = pairs.selectExpr(
        f"{key_col} AS key",
        f"CAST({x_col} AS BIGINT) AS _x",
        f"CAST({y_col} AS BIGINT) AS _y",
    ).where("key IS NOT NULL AND _x IS NOT NULL AND _y IS NOT NULL")
    sums = cleaned.groupBy("key").applyInPandas(
        _sums,
        schema=(f"key {key_type}, n long, cd long, tx long, ty long"),
    )
    return sums.selectExpr(*_FINAL)


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
