"""Deterministic stratified sampling (training-data mixture control).

Two samplers, both fully deterministic and engine-portable:

- ``sample_stratified`` — hash-threshold Bernoulli per stratum: keep a row
  iff ``md5_60bit(key || salt) % 1e6 < rate(stratum) * 1e6``. A pure
  codegen'd FILTER: no shuffle, no state, embarrassingly parallel, and the
  kept set is stable under corpus repartitioning/reordering — the correct
  shape for down/up-weighting sources at 100 TB (the per-stratum kept
  fraction concentrates to the rate by Chernoff; exact quotas don't matter
  for mixture weights).
- ``sample_quota`` — exact per-stratum top-N by the same hash order
  (ROW_NUMBER window). Exact counts, but requires a per-stratum sort: with
  few strata the window is skew-bound at scale, so it's for small/medium
  quota jobs (eval set carving), not corpus-wide mixing. Documented
  trade-off, both orderable bit-identically in DuckDB.

Hash recipe is the repo's portable 60-bit md5 (CLAUDE.md): identical
integers on Spark and DuckDB. Rates are emitted as INTEGER thresholds out
of 1e6 so no float literal crosses an engine boundary.

No reference counterpart (specvital/core has no sampling subsystem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 1_000_000


def _hash_expr(key: str, salt: str, dialect: str) -> str:
    if dialect == "spark":
        return (
            f"CAST(conv(substr(md5(CAST({key} AS STRING) || '{salt}'), 1, 15),"
            f" 16, 10) AS BIGINT) % {SCALE}"
        )
    return (
        f"('0x' || substr(md5(CAST({key} AS VARCHAR) || '{salt}'), 1, 15))"
        f"::BIGINT % {SCALE}"
    )


def _rate_case(stratum_col: str, rates: dict[str, float],
               default_rate: float) -> str:
    arms = " ".join(
        f"WHEN '{s}' THEN {int(round(r * SCALE))}"
        for s, r in sorted(rates.items())
    )
    return (
        f"CASE {stratum_col} {arms} "
        f"ELSE {int(round(default_rate * SCALE))} END"
    )


def keep_predicate(
    rates: dict[str, float],
    stratum_col: str = "lang",
    key: str = "doc_id",
    salt: str = ":sample",
    default_rate: float = 1.0,
    dialect: str = "spark",
) -> str:
    """SQL boolean: row survives the stratified hash gate."""
    return (
        f"{_hash_expr(key, salt, dialect)} < "
        f"{_rate_case(stratum_col, rates, default_rate)}"
    )


def sample_stratified(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    key: str = "doc_id",
    salt: str = ":sample",
    default_rate: float = 1.0,
) -> DataFrame:
    """Hash-threshold stratified sample — a pure filter, no shuffle."""
    return df.filter(
        F.expr(keep_predicate(rates, stratum_col, key, salt, default_rate))
    )


def sample_quota(
    df: DataFrame,
    n_per_stratum: int,
    stratum_col: str = "lang",
    key: str = "doc_id",
    salt: str = ":quota",
) -> DataFrame:
    """Exact per-stratum quota: first N rows in deterministic hash order.

    One shuffle on the stratum key; skew-bound when strata are few — use
    ``sample_stratified`` for corpus-scale mixing (module docstring).
    """
    from pyspark.sql import Window

    h = F.expr(_hash_expr(key, salt, "spark"))
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(h.asc(), F.col(key).asc())
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def sql_sample_quota(
    table: str,
    n_per_stratum: int,
    select_cols: str,
    stratum_col: str = "lang",
    key: str = "doc_id",
    salt: str = ":quota",
) -> str:
    """DuckDB twin of ``sample_quota``."""
    h = _hash_expr(key, salt, "duckdb")
    return f"""
        SELECT {select_cols} FROM (
          SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY {stratum_col}
                   ORDER BY {h} ASC, {key} ASC) AS _rn
          FROM {table}
        ) WHERE _rn <= {n_per_stratum}
    """
