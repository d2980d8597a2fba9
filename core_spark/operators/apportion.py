"""Integer budget apportionment: largest-remainder (Hamilton) method.

The scheduling end of the monitoring stack: emerging_hotspots says
where density is rising, frontier.py schedules within a host — this
operator decides HOW MANY fetch slots each stratum (cell, host
bucket, language, mixture component) gets out of a fixed global
budget B, proportionally to its mass. Naive proportional rounding
either over- or under-spends the budget; the Hamilton / largest-
remainder method is the classic exact fix: every stratum gets
``floor(B·m/M)``, and the leftover ``R = B − Σ floor`` slots go to
the R largest remainders — the unique allocation that (a) sums to
exactly B, (b) never differs from the real quota by ≥ 1, and (c) is
deterministic under the stated tie-break (remainder DESC, key ASC).

Exactness: the quota floor is ``(B·m) DIV M`` and the remainder
``(B·m) % M`` — pure BIGINT (both engines truncate non-negative
division identically); nothing floating exists anywhere. The product
B·m must fit int64: B·M ≤ ~9.2e18 — a million-slot budget against a
trillion-point mass is fine; beyond that, pre-scale masses (the
allocation only depends on mass RATIOS, documented).

Plan shape: masses are a per-stratum aggregate the caller usually
already has (bounded by strata, not data). One 1-row total broadcast
cross join, one codegen'd quota/remainder projection, and ONE window
over the full stratum set for the remainder rank — the single
intentionally-global step; strata ≪ data by contract (cells, hosts
buckets, languages), and the window input carries three BIGINTs per
stratum. The R cut compares rank ≤ R per row — no second pass, no
driver collect.

The DuckDB twin deliberately computes the total and the remainder
rank with scalar subqueries and a correlated COUNT(*) instead of the
window — an independent plan for the same allocation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def apportion_budget(
    masses: DataFrame,
    budget: int,
    key_cols: list[str],
    mass_col: str = "mass",
) -> DataFrame:
    """(key_cols..., mass, base, extra, alloc): Hamilton allocation of
    ``budget`` over strata; Σ alloc == budget exactly (pytest-pinned).
    Zero-mass strata get 0; NULL-mass rows drop."""
    b = int(budget)
    if b < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    m = (
        masses.selectExpr(*key_cols, f"CAST({mass_col} AS BIGINT) AS mass")
        .where("mass IS NOT NULL AND mass >= 0")
    )
    total = m.agg(F.sum("mass").cast("long").alias("_mtot"),
                  F.count(F.lit(1)).cast("long").alias("_nstrata"))
    quoted = m.crossJoin(F.broadcast(total)).selectExpr(
        *key_cols, "mass", "_mtot",
        f"CASE WHEN _mtot > 0 THEN ({b} * mass) DIV _mtot ELSE 0L END"
        " AS base",
        f"CASE WHEN _mtot > 0 THEN ({b} * mass) % _mtot ELSE 0L END"
        " AS _rem",
    )
    w = Window.orderBy(F.col("_rem").desc(), *[F.col(c) for c in key_cols])
    ranked = quoted.select(
        *key_cols, "mass", "base", "_rem", "_mtot",
        F.row_number().over(w).cast("long").alias("_rk"),
        F.sum("base").over(
            Window.partitionBy(F.lit(1))
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).cast("long").alias("_bsum"),
    )
    return ranked.selectExpr(
        *key_cols, "mass", "base",
        f"CAST(CASE WHEN _mtot > 0 AND _rk <= {b} - _bsum"
        " THEN 1 ELSE 0 END AS BIGINT) AS extra",
    ).selectExpr(*key_cols, "mass", "base", "extra",
                 "base + extra AS alloc")


def sql_apportion_budget(
    masses_sql: str,
    budget: int,
    key_cols: list[str],
    mass_col: str = "mass",
) -> str:
    """DuckDB oracle twin: scalar-subquery total + correlated-count
    remainder rank — no window, an independent plan."""
    b = int(budget)
    keys = ", ".join(key_cols)
    tie = " OR ".join(
        "(" + " AND ".join(
            [f"q2._rem = q._rem"]
            + [f"q2.{c} = q.{c}" for c in key_cols[:i]]
            + [f"q2.{c} < q.{c}" for c in key_cols[i:i + 1]]
        ) + ")"
        for i in range(len(key_cols))
    )
    return f"""
        WITH m AS (
          SELECT {keys}, CAST({mass_col} AS BIGINT) AS mass
          FROM ({masses_sql}) src
          WHERE {mass_col} IS NOT NULL AND {mass_col} >= 0
        ),
        tot AS (SELECT CAST(COALESCE(SUM(mass), 0) AS BIGINT) AS mtot
                FROM m),
        q AS (
          SELECT {keys}, mass,
                 CASE WHEN (SELECT mtot FROM tot) > 0
                      THEN ({b} * mass) // (SELECT mtot FROM tot)
                      ELSE 0 END AS base,
                 CASE WHEN (SELECT mtot FROM tot) > 0
                      THEN ({b} * mass) % (SELECT mtot FROM tot)
                      ELSE 0 END AS _rem
          FROM m
        ),
        leftover AS (
          SELECT {b} - CAST(COALESCE(SUM(base), 0) AS BIGINT) AS r FROM q
        )
        SELECT {keys}, mass, CAST(base AS BIGINT) AS base,
               CAST(_extra AS BIGINT) AS extra,
               CAST(base + _extra AS BIGINT) AS alloc
        FROM (
          SELECT *,
                 CASE WHEN (SELECT mtot FROM tot) > 0 AND (
                   SELECT COUNT(*) FROM q q2
                   WHERE q2._rem > q._rem OR {tie}
                 ) < (SELECT r FROM leftover)
                 THEN 1 ELSE 0 END AS _extra
          FROM q
        ) scored
    """
