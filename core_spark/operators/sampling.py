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


def mixture_sample(
    df: DataFrame,
    targets: dict[str, float],
    token_expr: str,
    stratum_col: str = "lang",
    key: str = "doc_id",
    salt: str = ":mixture",
) -> DataFrame:
    """Downsample strata to a TARGET token mixture (training-mix
    reweighting): output token shares follow ``targets`` while only ever
    downsampling. The binding stratum — smallest tokens/share — is kept
    in full and fixes the output size ``T_out = min_s tokens_s/share_s``;
    every other stratum is hash-thresholded to
    ``rate_s = share_s * T_out / tokens_s``. Strata without a target are
    DROPPED (the mixture is the contract).

    Scale shape: rates derive from one per-stratum token aggregate
    (map-side combine) — tiny, broadcast both ways; the corpus pass is a
    broadcast join + codegen'd hash filter, no shuffle of data rows and
    NO driver collect. ``token_expr`` is a Spark SQL integer expression
    (e.g. ``size(split(trim(text), ' '))``); the kept fraction
    concentrates to the rate exactly as in ``sample_stratified``.
    """
    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(s, float(p)) for s, p in sorted(targets.items())],
        f"{stratum_col} string, _share double",
    )
    stats = (
        df.selectExpr(stratum_col, f"CAST({token_expr} AS BIGINT) AS _nt")
        .groupBy(stratum_col)
        .agg(F.sum("_nt").alias("_toks"))
        .join(F.broadcast(tgt), stratum_col)
    )
    tout = stats.selectExpr("MIN(_toks / _share) AS _tout")
    rates = stats.crossJoin(F.broadcast(tout)).selectExpr(
        stratum_col, "_share * _tout / _toks AS _rate"
    )
    h = _hash_expr(key, salt, "spark")
    return (
        df.join(F.broadcast(rates), stratum_col)
        .filter(F.expr(f"{h} < _rate * {SCALE}"))
        .drop("_rate")
    )


def sql_mixture_sample(
    table: str,
    targets: dict[str, float],
    token_expr: str,
    stratum_col: str = "lang",
    key: str = "doc_id",
    salt: str = ":mixture",
    select_cols: str = "*",
) -> str:
    """DuckDB twin of mixture_sample (``token_expr`` in DuckDB dialect,
    e.g. ``len(string_split(trim(text), ' '))``). Arithmetic order is
    identical to the Spark emission (share * tout / toks, min over
    toks/share), so the double rates are bit-identical."""
    values = ", ".join(f"('{s}', {float(p)!r})"
                       for s, p in sorted(targets.items()))
    return f"""
WITH tgt({stratum_col}, _share) AS (VALUES {values}),
stats AS (
  SELECT {stratum_col}, SUM(CAST({token_expr} AS BIGINT)) AS _toks
  FROM {table} GROUP BY {stratum_col}
),
joined AS (
  SELECT s.{stratum_col}, _toks, _share
  FROM stats s JOIN tgt USING ({stratum_col})
),
tout AS (SELECT MIN(_toks / _share) AS _tout FROM joined),
rates AS (
  SELECT {stratum_col}, _share * _tout / _toks AS _rate FROM joined, tout
)
SELECT {select_cols} FROM {table} d JOIN rates USING ({stratum_col})
WHERE {_hash_expr(key, salt, "duckdb")} < _rate * {SCALE}
"""
