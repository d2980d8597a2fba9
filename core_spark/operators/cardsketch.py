"""Mergeable cardinality sketch (linear counting) with a deterministic gate.

At 10^12 rows, per-group COUNT(DISTINCT key) shuffles every distinct key;
the sketch answer is a fixed-size bitmap per group: hash each key into m
buckets, count the buckets hit (V), estimate distinct ≈ −m·ln(1 − V/m)
(Whang et al. 1990, linear counting). The bitmap is MERGEABLE (bitwise
OR), so partial sketches combine map-side and across corpus shards /
days — the property exact distinct counting fundamentally lacks.

What this module gates EXACTLY: the bucket-hit count V, computed from
the portable 60-bit md5 — deterministic and bit-identical in DuckDB.
The ln-based ESTIMATE is deliberately NOT a compared value (CLAUDE.md
portability: no transcendentals cross engines); ``estimate_distinct``
computes it driver-side from the gated integers. Spark's native
approx_count_distinct (HLL++) is the production alternative but is not
cross-engine reproducible, hence not the oracled operator — same
trade-off as ann_ivf vs ann_topk.

No reference counterpart (specvital/core has no sketch subsystem).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

_SALT = ":lc"


def _bucket(key_sql: str, m: int, dialect: str) -> str:
    if dialect == "spark":
        return (
            f"CAST(conv(substr(md5(CAST({key_sql} AS STRING) || '{_SALT}'),"
            f" 1, 15), 16, 10) AS BIGINT) % {m}"
        )
    return (
        f"('0x' || substr(md5(CAST({key_sql} AS VARCHAR) || '{_SALT}'),"
        f" 1, 15))::BIGINT % {m}"
    )


def distinct_sketch(
    df: DataFrame,
    group_col: str,
    key_sql: str,
    m: int = 4096,
) -> DataFrame:
    """(group, n_rows, n_distinct_exact, lc_buckets_hit).

    ``n_distinct_exact`` rides along at fixture scale so the sketch's
    accuracy is VISIBLE in the gated data; at production scale you drop
    it and keep only the mergeable bucket count.
    """
    bucket = _bucket(key_sql, m, "spark")
    return (
        df.select(
            F.col(group_col),
            F.expr(key_sql).alias("_k"),
            F.expr(bucket).alias("_b"),
        )
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("_k").alias("n_distinct_exact"),
            F.countDistinct("_b").alias("lc_buckets_hit"),
        )
    )


def sql_distinct_sketch(
    table: str, group_col: str, key_sql: str, m: int = 4096
) -> str:
    """DuckDB oracle twin (same md5-bucket definition)."""
    bucket = _bucket(key_sql, m, "duckdb")
    return f"""
        SELECT {group_col},
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT {key_sql}) AS BIGINT)
                 AS n_distinct_exact,
               CAST(COUNT(DISTINCT {bucket}) AS BIGINT) AS lc_buckets_hit
        FROM {table}
        GROUP BY {group_col}
    """


def estimate_distinct(buckets_hit: int, m: int = 4096) -> float:
    """Linear-counting estimate from the gated integer (driver-side —
    ln never enters a compared value). Saturated sketch (V == m) has no
    finite estimate; callers should grow m."""
    if buckets_hit >= m:
        return float("inf")
    return -m * math.log(1.0 - buckets_hit / m)
