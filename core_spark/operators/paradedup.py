"""Corpus-wide paragraph-level exact dedup (first occurrence wins).

The highest-value text dedup below document level (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better") drops REPEATED
PASSAGES — boilerplate, licenses, navigation chrome — while keeping each
passage's first occurrence. This module implements the paragraph-hash
variant (exact match on paragraph text; the suffix-array substring variant
is a different algorithm and out of scope, noted in the docstring so the
boundary is explicit):

1. explode (doc, pos, paragraph) with a per-row ordinal;
2. portable 60-bit md5 per paragraph;
3. global winner per hash = MIN(struct(doc, pos)) — lexicographic struct
   min on both engines (no scalar ordinal, so no overflow at any doc_id
   or paragraph count — ADVICE r4), a hash aggregate with map-side
   combine, so a boilerplate paragraph repeated 10^9 times still reduces
   to one partial per partition before the shuffle;
4. equi-join the winner ordinal back onto the exploded table (uniform md5
   keys; a mega-duplicate paragraph is one hot key on the probe side —
   AQE skew-join splits it) and keep rows whose ordinal is the winner;
5. reassemble per doc: n_paras, n_dup, and the deduped text in original
   paragraph order (within-row sort, no extra shuffle beyond the per-doc
   groupBy).

Two shuffles total — paragraph-hash and doc reassembly — both on uniform
keys. The winner table is distinct-paragraph-sized; it is NOT broadcast
(web-scale it rivals the corpus) — the join shuffles both sides on the
hash key, which is the right shape.

The fixture corpus has no newline structure, so the driver query derives
paragraphs as fixed 10-token chunks via ``paragraphs_expr`` (real corpora:
``split(text, '\\n\\n')``); the chunk expression is dialect-shared so the
DuckDB oracle derives byte-identical paragraphs.

No reference counterpart (specvital/core has no text-dedup subsystem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tokens_expr(text_col: str, dialect: str) -> str:
    """Token array (single-space split) — emit as a STEPWISE column so the
    chunk expression below references it once (CLAUDE.md stepwise rule)."""
    if dialect == "spark":
        return f"split(trim({text_col}), ' ')"
    return f"string_split(trim({text_col}), ' ')"


def paragraphs_expr(toks_col: str, n_tokens: int, dialect: str) -> str:
    """Array<string> of fixed ``n_tokens``-token chunks of a token-array
    column. Same chunking on both engines (Spark ``slice`` is
    (start, length); DuckDB list slicing is 1-based inclusive ``[a:b]``;
    both clamp at the array end)."""
    if dialect == "spark":
        n = f"CAST(ceil(size({toks_col}) / {n_tokens}.0) AS INT)"
        return (
            f"transform(sequence(1, {n}), i -> "
            f"array_join(slice({toks_col}, (i-1)*{n_tokens}+1, {n_tokens}),"
            f" ' '))"
        )
    n = f"CAST(ceil(len({toks_col}) / {n_tokens}.0) AS BIGINT)"
    return (
        f"list_transform(generate_series(1, {n}), i -> "
        f"array_to_string({toks_col}[((i-1)*{n_tokens}+1):"
        f"((i-1)*{n_tokens}+{n_tokens})], ' '))"
    )


def _hash60(col: str, dialect: str) -> str:
    if dialect == "spark":
        return f"CAST(conv(substr(md5({col}), 1, 15), 16, 10) AS BIGINT)"
    return f"('0x' || substr(md5({col}), 1, 15))::BIGINT"


def dedup_paragraphs(
    df: DataFrame, paras_col: str = "paras", key: str = "doc_id"
) -> DataFrame:
    """Per-doc (key, n_paras, n_dup, text_dedup) after corpus-wide
    first-occurrence paragraph dedup (module docstring for the plan)."""
    exploded = (
        df.select(key, F.posexplode(paras_col).alias("_pos", "_para"))
        .withColumn("_h", F.expr(_hash60("_para", "spark")))
        .withColumn("_ord", F.struct(F.col(key), F.col("_pos")))
    )
    winners = exploded.groupBy("_h").agg(F.min("_ord").alias("_win"))
    kept = (
        exploded.join(winners, "_h")
        .withColumn("_keep", F.col("_ord") == F.col("_win"))
    )
    return (
        kept.groupBy(key)
        .agg(
            F.count("*").alias("n_paras"),
            F.sum(F.when(~F.col("_keep"), 1).otherwise(0)).alias("n_dup"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(
                                F.col("_keep"),
                                F.struct("_pos", "_para"),
                            )
                        )
                    ),
                    lambda s: s["_para"],
                ),
                " ",
            ).alias("text_dedup"),
        )
    )


def sql_dedup_paragraphs(
    table: str,
    n_tokens: int,
    key: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle twin: parallel-unnest explode + window-free winner."""
    toks = tokens_expr(text_col, "duckdb")
    paras = paragraphs_expr("_toks", n_tokens, "duckdb")
    h = _hash60("_para", "duckdb")
    return f"""
        WITH exploded AS (
          SELECT {key},
                 unnest(generate_series(1, len(_paras))) - 1 AS _pos,
                 unnest(_paras) AS _para
          FROM (SELECT {key}, {paras} AS _paras
                FROM (SELECT {key}, {toks} AS _toks FROM {table}))
        ), hashed AS (
          SELECT {key}, _pos, _para, {h} AS _h,
                 ROW({key}, _pos) AS _ord
          FROM exploded
        ), winners AS (
          SELECT _h, MIN(_ord) AS _win FROM hashed GROUP BY _h
        )
        SELECT hashed.{key} AS {key},
               CAST(COUNT(*) AS BIGINT) AS n_paras,
               CAST(SUM(CASE WHEN _ord = _win THEN 0 ELSE 1 END) AS BIGINT)
                 AS n_dup,
               COALESCE(string_agg(CASE WHEN _ord = _win THEN _para END, ' '
                                   ORDER BY _pos), '') AS text_dedup
        FROM hashed JOIN winners USING (_h)
        GROUP BY hashed.{key}
    """
