"""RAG / embedding-window document chunking with provenance spans.

Retrieval pipelines (and long-context training mixes) cut documents into
fixed-size overlapping token windows before embedding or packing. This
operator computes, for every doc, the standard sliding window over its
whitespace tokens:

    stride   = size - overlap
    n_chunks = 1                                  if n_tokens <= size
               (n_tokens - size + stride - 1) DIV stride + 1   otherwise
    chunk k  = tokens[k*stride : min(k*stride + size, n_tokens))

i.e. every token is covered, consecutive chunks share exactly
``overlap`` tokens, and the final chunk is the only one allowed to be
short (it absorbs the tail instead of emitting a fully-redundant
window). Offsets follow the repo-wide location convention: 0-based
token positions, end EXCLUSIVE — the same SHAPE as span_dedup /
decontaminate_spans coordinates. Note the tokenizers differ, though:
this operator splits on whitespace RUNS with empty artifacts dropped
(``filter(split(text, '\\s+'), w -> w != '')`` — trim() strips only
0x20, so leading/trailing \\n or \\t would otherwise plant phantom
empty tokens), while span_dedup splits on single spaces and keeps
empty tokens; chunk offsets and span offsets only
align index-for-index on text whose tokens are single-space separated
(e.g. post-``text_normalize``, which collapses runs). To join the two
coordinate systems on raw text, re-chunk with the span tokenizer or
normalize first.

Plan shape: ONE codegen'd projection + one within-row explode — no
shuffle, no Python, no window. At 100 TB chunking is a map-only stage
that multiplies rows by ~n_tokens/stride; the downstream consumer
(embedding UDF, ANN index build) decides the partitioning, so this
operator deliberately leaves the child partitioning untouched instead
of forcing a repartition the consumer would immediately override.

All arithmetic is BIGINT; tokenization is the repo's shared
whitespace-regex split (textstats convention), so the DuckDB twin is
bit-identical (Spark ``slice`` is 1-based with a length; DuckDB list
slicing is 1-based end-inclusive — both mapped from the same 0-based
end-exclusive span).

No reference counterpart (specvital/core has no corpus subsystem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _check(size: int, overlap: int) -> int:
    if size <= 0:
        raise ValueError(f"chunking: size must be positive, got {size}")
    if not (0 <= overlap < size):
        raise ValueError(
            f"chunking: overlap must be in [0, size), got overlap={overlap} "
            f"size={size}")
    return size - overlap


def chunk_documents(
    df: DataFrame,
    size: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (id_col, chunk_ix, tok_start, tok_end, n_tokens, chunk_text).

    ``chunk_ix`` is the 0-based window ordinal; ``[tok_start, tok_end)``
    the 0-based end-exclusive token span; ``chunk_text`` the
    space-rejoined window. Docs with no tokens emit no rows.
    """
    stride = _check(size, overlap)
    # drop empty split artifacts (leading/trailing whitespace yields ''
    # elements — trim() strips only 0x20, not \n/\t), then gate on
    # n > 0 so whitespace-only docs emit no rows, per the contract
    toks = df.filter(F.col(text_col).isNotNull()).select(
        id_col,
        F.expr(
            rf"filter(split({text_col}, '\\s+'), w -> w != '')"
        ).alias("_toks"),
    ).withColumn("_n", F.size("_toks").cast("long")).filter(
        F.col("_n") > 0
    ).withColumn(
        "_n_chunks",
        F.expr(f"CASE WHEN _n <= {size} THEN CAST(1 AS BIGINT) "
               f"ELSE (_n - {size} + {stride} - 1) DIV {stride} + 1 END"),
    )
    return toks.select(
        id_col, "_toks", "_n",
        F.explode(F.expr("sequence(CAST(0 AS BIGINT), _n_chunks - 1)"))
        .alias("chunk_ix"),
    ).select(
        id_col,
        "chunk_ix",
        (F.col("chunk_ix") * stride).alias("tok_start"),
        F.least(F.col("chunk_ix") * stride + size, F.col("_n"))
        .alias("tok_end"),
        "_toks",
    ).select(
        id_col, "chunk_ix", "tok_start", "tok_end",
        (F.col("tok_end") - F.col("tok_start")).alias("n_tokens"),
        F.expr("array_join(slice(_toks, CAST(tok_start + 1 AS INT), "
               "CAST(tok_end - tok_start AS INT)), ' ')").alias("chunk_text"),
    )


def sql_chunk_documents(
    table_sql: str,
    size: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin — same integer window derivation, list slicing mapped
    from the shared 0-based end-exclusive span to DuckDB's 1-based
    end-inclusive form."""
    stride = _check(size, overlap)
    return f"""
        WITH toks AS (
          SELECT {id_col},
                 list_filter(string_split_regex({text_col}, '\\s+'),
                             w -> w <> '') AS _toks
          FROM {table_sql}
          WHERE {text_col} IS NOT NULL
        ), counted AS (
          SELECT {id_col}, _toks, CAST(len(_toks) AS BIGINT) AS _n,
                 CASE WHEN len(_toks) <= {size} THEN CAST(1 AS BIGINT)
                      ELSE (len(_toks) - {size} + {stride} - 1)
                           // {stride} + 1 END AS _n_chunks
          FROM toks
          WHERE len(_toks) > 0
        ), exploded AS (
          SELECT {id_col}, _toks, _n,
                 CAST(unnest(generate_series(0, _n_chunks - 1)) AS BIGINT)
                   AS chunk_ix
          FROM counted
        )
        SELECT {id_col}, chunk_ix,
               chunk_ix * {stride} AS tok_start,
               least(chunk_ix * {stride} + {size}, _n) AS tok_end,
               least(chunk_ix * {stride} + {size}, _n) - chunk_ix * {stride}
                 AS n_tokens,
               array_to_string(
                 _toks[chunk_ix * {stride} + 1 :
                       least(chunk_ix * {stride} + {size}, _n)],
                 ' ') AS chunk_text
        FROM exploded
    """
