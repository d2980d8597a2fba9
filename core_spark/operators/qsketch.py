"""Mergeable log-bucket quantile sketch: bounded state, 25%-error bound.

``quantiles.py`` computes EXACT group quantiles (one shuffle of the raw
values per group) — the right tool when groups fit a sort. At 100 TB the
per-group value stream doesn't fit anywhere, and the production answer is
a MERGEABLE fixed-size summary. This module is that path, built so the
result is deterministic and integer-exact (portable to the DuckDB oracle —
unlike ``approx_percentile``, whose output is implementation-defined):

  bucket(v) for v >= 0:
    v < 4:   bucket_id = v                       (small values exact)
    v >= 4:  e = floor(log2 v) = length(bin(v)) - 1       [bin() has no
             leading zeros in Spark AND DuckDB, so this is portable]
             sub = v >> (e-2)   in [4, 8)        (top 3 bits)
             bucket_id = 4*e + sub - 4           (>= 8: disjoint from smalls)
             lb = sub << (e-2)                   (bucket lower bound)

  Each bucket spans [lb, lb + 2^(e-2)) with lb >= 2^e, so reporting lb for
  any member overshoots by < 2^(e-2)/2^e = 25% relative — the classic
  base-(1+eps) histogram sketch (Greenwald-Khanna territory; this is the
  fixed-universe variant used by DDSketch/HdrHistogram, with 4 sub-buckets
  per octave). At most 4*63 + 4 = 256 buckets EVER exist per group
  regardless of data volume — the sketch is a bounded hash-agg row set.

  Merge = per-(group, bucket) count addition, which is exactly what
  map-side combine and shard-union already do: sketch(A ∪ B) ==
  sketch(A) + sketch(B) under ANY partitioning (pinned by a 1/7/32-way
  repartition pytest, same discipline as heavyhitters.py).

  Quantile estimate for p = num/den over a group of n values: target
  rank r = ceil(n*num/den) = (n*num + den - 1) DIV den (pure BIGINT),
  estimate = lb of the first bucket whose cumulative count reaches r.
  The cumulative window runs over the BOUNDED per-group bucket set
  (<= 256 rows), never the raw values.

Domain: nonnegative BIGINT measures (token counts, byte sizes, doc
lengths). Negative values raise (raise_error arm in the bucket CASE) —
silent two's-complement garbage from bin() is the alternative.

No reference counterpart (specvital/core has no sketch subsystem); the
bucket scheme follows the published log-histogram sketch literature
cited above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: quantiles a fixture/query asks for, as (label, num, den) rationals
DEFAULT_PS: list[tuple[str, int, int]] = [
    ("p50", 1, 2),
    ("p90", 9, 10),
    ("p99", 99, 100),
]


def _bucket_sql(v: str, dialect: str) -> tuple[str, str]:
    """(bucket_id, lb) SQL for a nonnegative BIGINT expression ``v``."""
    if dialect == "spark":
        e = f"(length(bin({v})) - 1)"
        sub = f"shiftright({v}, CAST({e} - 2 AS INT))"
        lb = f"shiftleft({sub}, CAST({e} - 2 AS INT))"
        guard = f"WHEN {v} < 0 THEN CAST(raise_error('qsketch: negative value') AS BIGINT)"
    else:
        e = f"(length(bin(CAST({v} AS BIGINT))) - 1)"
        sub = f"(CAST({v} AS BIGINT) >> ({e} - 2))"
        lb = f"({sub} << ({e} - 2))"
        guard = f"WHEN {v} < 0 THEN CAST(error('qsketch: negative value') AS BIGINT)"
    bucket = (
        f"CASE {guard} WHEN {v} < 4 THEN CAST({v} AS BIGINT) "
        f"ELSE CAST(4 * {e} + {sub} - 4 AS BIGINT) END"
    )
    lower = (
        f"CASE WHEN {v} < 0 THEN NULL WHEN {v} < 4 THEN CAST({v} AS BIGINT) "
        f"ELSE CAST({lb} AS BIGINT) END"
    )
    return bucket, lower


def value_sketch(
    df: DataFrame,
    group_col: str,
    value_sql: str,
) -> DataFrame:
    """(group, bucket_id, lb, cnt) — the mergeable summary. ``value_sql``
    is a Spark SQL expression producing the nonnegative BIGINT measure;
    NULL measures are dropped (not zero)."""
    bucket, lb = _bucket_sql("_v", "spark")
    return (
        df.selectExpr(group_col, f"CAST({value_sql} AS BIGINT) AS _v")
        .filter(F.col("_v").isNotNull())
        .selectExpr(
            group_col, f"{bucket} AS bucket_id", f"{lb} AS lb"
        )
        .groupBy(group_col, "bucket_id", "lb")
        .agg(F.count("*").alias("cnt"))
    )


def sketch_quantiles(
    sketch: DataFrame,
    group_col: str,
    ps: list[tuple[str, int, int]] = DEFAULT_PS,
) -> DataFrame:
    """(group, p, est) quantile estimates from a ``value_sketch`` result.

    est = lb of the first bucket whose cumulative count reaches
    rank ceil(n * num/den); exact for values < 4, within 25% relative
    above (the bucket-width bound). The cumulative window is over the
    bounded (<= 256-row) per-group bucket set.
    """
    w = Window.partitionBy(group_col).orderBy("bucket_id")
    cum = sketch.withColumn(
        "_cum", F.sum("cnt").over(w)
    ).withColumn("_n", F.sum("cnt").over(Window.partitionBy(group_col)))
    parts = []
    for label, num, den in ps:
        rank = f"(_n * {num} + {den} - 1) DIV {den}"
        parts.append(
            cum.filter(F.expr(f"_cum >= {rank}"))
            .groupBy(group_col)
            .agg(F.min("bucket_id").alias("_b"))
            .join(cum.select(group_col, F.col("bucket_id").alias("_b"), "lb"),
                  [group_col, "_b"])
            .select(
                group_col,
                F.lit(label).alias("p"),
                F.col("lb").alias("est"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def group_quantile_sketch(
    df: DataFrame,
    group_col: str,
    value_sql: str,
    ps: list[tuple[str, int, int]] = DEFAULT_PS,
) -> DataFrame:
    """sketch + estimate in one call: (group, p, est)."""
    from core_spark.plans.materialize import pin

    # the sketch feeds |ps| estimate branches — pinned (CLAUDE.md rule);
    # it is a bounded table (<= 256 rows per group), so the pin is tiny
    return sketch_quantiles(
        pin(value_sketch(df, group_col, value_sql)), group_col, ps
    )


def sql_group_quantile_sketch(
    table: str,
    group_col: str,
    value_sql: str,
    ps: list[tuple[str, int, int]] = DEFAULT_PS,
) -> str:
    """DuckDB twin — same bucket math, independent plan (one windowed
    scan + a lateral-style quantile unnest instead of unioned branches).
    """
    bucket, lb = _bucket_sql("_v", "duck")
    p_rows = ", ".join(f"('{lbl}', {num}, {den})" for lbl, num, den in ps)
    return f"""
        WITH vals AS (
          SELECT {group_col}, CAST({value_sql} AS BIGINT) AS _v
          FROM {table}
          WHERE {value_sql} IS NOT NULL
        ), sk AS (
          SELECT {group_col}, {bucket} AS bucket_id, {lb} AS lb,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM vals GROUP BY 1, 2, 3
        ), cum AS (
          SELECT {group_col}, bucket_id, lb,
                 SUM(cnt) OVER (PARTITION BY {group_col}
                                ORDER BY bucket_id) AS _cum,
                 SUM(cnt) OVER (PARTITION BY {group_col}) AS _n
          FROM sk
        ), q AS (
          SELECT * FROM (VALUES {p_rows}) _p(p, num, den)
        )
        SELECT {group_col}, p, est FROM (
          SELECT c.{group_col} AS {group_col}, q.p AS p, c.lb AS est,
                 ROW_NUMBER() OVER (
                   PARTITION BY c.{group_col}, q.p ORDER BY c.bucket_id
                 ) AS _r
          FROM cum c JOIN q
            ON c._cum >= (c._n * q.num + q.den - 1) // q.den
        ) WHERE _r = 1
    """
