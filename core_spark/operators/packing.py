"""Deterministic sequence packing (context-window assembly for training).

Training pipelines concatenate documents in a fixed order and cut the
stream into fixed token-budget windows ("packing"). This operator computes,
for every doc, WHERE it lands — (shard, bin, offset) — without ever
materializing the concatenated stream:

- ``shard`` = portable md5(key) mod n_shards. Packing is embarrassingly
  parallel across shards; n_shards is the scale knob (each shard's window
  sort must fit an executor — at 100 TB you size n_shards so a shard is
  a few GB, and the per-shard running sum is the only non-map work).
- within a shard, docs are ordered by (md5 hash, key) — deterministic,
  repartition-stable, resumable;
- ``cum_before`` = running token sum over that order (one window SUM);
- ``bin`` = floor(cum_before / budget), ``offset`` = cum_before % budget.

These are the exact "concatenate then chunk" semantics (a doc whose start
falls near a window boundary straddles into the next bin; ``offset`` +
doc tokens tells the reader how far). First-fit bin packing that never
splits docs is a different operator with inherently sequential state —
out of scope and documented as such.

All arithmetic is BIGINT (token counts, md5-60bit) so the DuckDB oracle
is bit-identical. No reference counterpart (specvital/core has no
training-data subsystem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SALT = ":pack"


def _hash60(key: str, dialect: str) -> str:
    if dialect == "spark":
        return (
            f"CAST(conv(substr(md5(CAST({key} AS STRING) || '{_SALT}'),"
            f" 1, 15), 16, 10) AS BIGINT)"
        )
    return (
        f"('0x' || substr(md5(CAST({key} AS VARCHAR) || '{_SALT}'),"
        f" 1, 15))::BIGINT"
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    n_shards: int,
    tokens_col: str = "n_tokens",
    key: str = "doc_id",
) -> DataFrame:
    """Add (shard, bin, offset) packing coordinates per doc.

    One projection (hash/shard), one per-shard window SUM in deterministic
    hash order — the only shuffle is on ``shard`` (uniform md5 keys).
    """
    from pyspark.sql import Window

    h = F.expr(_hash60(key, "spark"))
    df = df.withColumn("_h", h).withColumn(
        "shard", (F.col("_h") % F.lit(n_shards)).cast("long")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("_h").asc(), F.col(key).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long")
    return (
        df.withColumn("_cum", cum)
        .withColumn(
            "bin", F.floor(F.col("_cum") / F.lit(budget)).cast("long")
        )
        .withColumn("offset", (F.col("_cum") % F.lit(budget)).cast("long"))
        .drop("_h", "_cum")
    )


def sql_pack_sequences(
    inner_sql: str,
    budget: int,
    n_shards: int,
    select_cols: str,
    tokens_col: str = "n_tokens",
    key: str = "doc_id",
) -> str:
    """DuckDB oracle twin (same math, window syntax spelled natively)."""
    h = _hash60(key, "duckdb")
    return f"""
        SELECT {select_cols} FROM (
          SELECT *,
                 CAST(FLOOR(_cum / {budget}) AS BIGINT) AS bin,
                 CAST(_cum % {budget} AS BIGINT) AS "offset"
          FROM (
            SELECT *,
                   COALESCE(SUM({tokens_col}) OVER (
                     PARTITION BY shard ORDER BY _h ASC, {key} ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS _cum
            FROM (
              SELECT *, _h % {n_shards} AS shard
              FROM (SELECT *, {h} AS _h FROM ({inner_sql}))
            )
          )
        )
    """
