"""Corpus term statistics: document frequency + per-doc distinctive terms.

The TF-IDF-shaped primitive a training-data pipeline needs for topic /
boilerplate analysis, keyword indexing, and quality heuristics — built so
every stage has a 100-TB shape:

- ``document_frequency`` — (term, df_count) over the corpus. Tokens are
  deduplicated WITHIN each row first (``array_distinct``, no shuffle), so
  the explode→groupBy shuffles only distinct-terms-per-doc, not every
  token occurrence; the aggregate gets map-side combine.
- ``top_vocab`` — the top-V terms by (df DESC, term ASC). At web scale the
  full vocabulary rivals the corpus (typos, hashes, numbers), so the
  join-back operates over a BOUNDED broadcast vocabulary; everything
  outside it is by definition too rare or too common to matter for the
  ranking and is dropped (documented contract, mirrored in the oracle).
- ``distinctive_terms`` — per-doc top-k vocabulary terms ranked by
  (tf DESC, df ASC, term ASC). Term frequencies are computed WITHIN the
  row (higher-order functions over the token array — O(distinct × n)
  compares, no token-level shuffle); the vocabulary join is a broadcast
  hash join; the only shuffle is the per-doc reassembly, and the top-k
  cut happens within-row after ``sort_array`` (no window over the corpus).

Ranking is integer-exact on purpose: a float ``tf·ln(N/df)`` score would
hang cross-engine correctness on libm rounding (CLAUDE.md portability
rules — no transcendentals in compared values). (tf DESC, df ASC) is
monotone in tf for fixed df and in rarity for fixed tf, which is the
ordering TF-IDF induces along each axis; ties break on the term.

No reference counterpart (specvital/core has no term-statistics
subsystem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def document_frequency(
    df: DataFrame, toks_col: str = "toks", key: str = "doc_id"
) -> DataFrame:
    """(term, df_count) — within-row distinct first, then one hash-agg."""
    return (
        df.select(F.explode(F.array_distinct(F.col(toks_col))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df_count"))
    )


def top_vocab(df_stats: DataFrame, v: int) -> DataFrame:
    """Top-V terms by (df DESC, term ASC) — the broadcast vocabulary."""
    return (
        df_stats.orderBy(F.col("df_count").desc(), F.col("term").asc())
        .limit(v)
    )


def distinctive_terms(
    df: DataFrame,
    vocab: DataFrame,
    k: int,
    toks_col: str = "toks",
    key: str = "doc_id",
) -> DataFrame:
    """Per-doc top-k vocabulary terms by (tf DESC, df ASC, term ASC).

    Returns (key, term, tf, df_count, rank), rank 1-based. ``vocab`` must
    be small enough to broadcast (use ``top_vocab``).
    """
    # stepwise: materialize the distinct-term array once per row
    # (CLAUDE.md rule; also pins zip alignment to one evaluation)
    per_term = df.select(
        key, F.col(toks_col), F.array_distinct(F.col(toks_col)).alias("_terms")
    ).select(
        key,
        F.explode(
            F.arrays_zip(
                F.col("_terms").alias("term"),
                F.expr(
                    f"transform(_terms, "
                    f"t -> size(filter({toks_col}, x -> x = t)))"
                ).alias("tf"),
            )
        ).alias("_z"),
    ).select(
        key,
        F.col("_z.term").alias("term"),
        F.col("_z.tf").cast("long").alias("tf"),
    )
    joined = per_term.join(F.broadcast(vocab), "term")
    # within-row top-k: sort struct list by (-tf, df, term), slice k
    ranked = (
        joined.groupBy(key)
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            (-F.col("tf")).alias("_ntf"),
                            F.col("df_count").alias("df_count"),
                            F.col("term").alias("term"),
                            F.col("tf").alias("tf"),
                        )
                    )
                ),
                1,
                k,
            ).alias("_top")
        )
        .select(key, F.posexplode("_top").alias("_i", "_s"))
        .select(
            key,
            F.col("_s.term").alias("term"),
            F.col("_s.tf").alias("tf"),
            F.col("_s.df_count").alias("df_count"),
            (F.col("_i") + 1).cast("long").alias("rank"),
        )
    )
    return ranked


def sql_distinctive_terms(
    table: str,
    toks_sql: str,
    v: int,
    k: int,
    key: str = "doc_id",
) -> str:
    """DuckDB oracle twin (independent plan: windows instead of slices).

    ``toks_sql`` is the DuckDB expression producing the token array.
    """
    return f"""
        WITH toks AS (
          SELECT {key}, _toks, list_distinct(_toks) AS _terms
          FROM (SELECT {key}, {toks_sql} AS _toks FROM {table})
        ), per_term AS (
          SELECT {key},
                 unnest(_terms) AS term,
                 unnest(list_transform(_terms,
                        t -> len(list_filter(_toks, x -> x = t)))) AS tf
          FROM toks
        ), dfreq AS (
          SELECT term, CAST(COUNT(*) AS BIGINT) AS df_count
          FROM per_term GROUP BY term
        ), vocab AS (
          SELECT term, df_count FROM dfreq
          ORDER BY df_count DESC, term ASC LIMIT {v}
        )
        SELECT {key}, term, CAST(tf AS BIGINT) AS tf, df_count,
               CAST(rank AS BIGINT) AS rank
        FROM (
          SELECT p.{key} AS {key}, p.term AS term, p.tf AS tf,
                 v.df_count AS df_count,
                 ROW_NUMBER() OVER (
                   PARTITION BY p.{key}
                   ORDER BY p.tf DESC, v.df_count ASC, p.term ASC
                 ) AS rank
          FROM per_term p JOIN vocab v USING (term)
        ) WHERE rank <= {k}
    """
