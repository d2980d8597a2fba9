"""Benchmark decontamination: flag docs sharing token k-grams with an
eval/benchmark set (training-data curation).

The standard pre-training hygiene pass (public practice: GPT-3 appendix C /
Dolma decontamination): a document is contaminated when any of its k-token
shingles appears in a benchmark snippet. Shape at 100 TB:

- The benchmark side is tiny (eval suites are MBs) -> its distinct k-gram
  set is **broadcast**; the corpus-side exploded grams are filtered
  MAP-SIDE by the broadcast hash join, so only matching grams (rare) ever
  shuffle into the per-doc count. The corpus explode itself is streamed by
  the scan pipeline, never materialized.
- The final left join attaching ``n_hits`` back to every doc broadcasts
  the (small) hit table against a second column-pruned scan of the corpus
  — two cheap scans beat one groupBy over every token in the corpus.

No reference counterpart (specvital/core has no corpus subsystem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _doc_grams(df: DataFrame, key: str, text_col: str, k: int) -> DataFrame:
    """Distinct k-token shingles, exploded to (key, gram) rows.

    Short docs are removed by a FILTER, not CASE-guarded empty arrays:
    wrapping the higher-order transform in CASE measured 12x slower
    (6.3s vs 0.5s for the same 250k grams at sf0.1 — the conditional
    forces the whole projection off the codegen path), and a filtered
    row produces exactly the same zero grams a CASE branch would. NULL
    text is safe without its own guard: size(NULL) = -1 < k.
    """
    toks = f"split(trim({text_col}), '\\\\s+')"
    return (
        df.select(key, text_col)
        .filter(f"size({toks}) >= {k}")
        .selectExpr(key, f"{toks} AS _toks")
        .selectExpr(
            key,
            f"explode(array_distinct(transform(sequence(0, size(_toks) - {k}),"
            f" i -> array_join(slice(_toks, i + 1, {k}), ' ')))) AS gram",
        )
    )


def contaminated_docs(
    docs: DataFrame,
    bench: DataFrame,
    k: int = 5,
    key: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc benchmark-overlap counts: (key, n_hits, contaminated).

    ``n_hits`` counts DISTINCT shared k-grams (doc grams are deduped
    within-row before the explode). ``bench`` needs only ``text_col``.
    """
    bench_grams = (
        _doc_grams(bench.select(F.lit(0).alias("_b"), text_col), "_b", text_col, k)
        .select("gram")
        .distinct()
    )
    hits = (
        _doc_grams(docs, key, text_col, k)
        .join(F.broadcast(bench_grams), "gram")
        .groupBy(key)
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        docs.select(key)
        .join(F.broadcast(hits), key, "left")
        .select(
            key,
            F.expr("CAST(coalesce(n_hits, 0) AS BIGINT)").alias("n_hits"),
            F.expr("CAST(coalesce(n_hits, 0) > 0 AS INT)").alias("contaminated"),
        )
    )


def sql_contaminated_docs(
    table: str,
    bench_where: str,
    k: int = 5,
    key: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin: benchmark = ``SELECT {text_col} FROM {table} WHERE
    {bench_where}`` (the driver query plants the benchmark inside the same
    corpus so no external data is needed)."""
    toks = (
        f"CASE WHEN {text_col} IS NULL OR trim({text_col}) = '' "
        "THEN CAST([] AS VARCHAR[]) "
        f"ELSE string_split_regex(trim({text_col}), '\\s+') END"
    )
    concat = " || ' ' || ".join(f"_toks[i + {j}]" for j in range(k))
    grams = (
        f"CASE WHEN len(_toks) >= {k} THEN list_distinct("
        f"list_transform(range(1, len(_toks) - {k} + 2), i -> {concat})) "
        "ELSE CAST([] AS VARCHAR[]) END"
    )
    return f"""
        WITH dg AS (
          SELECT {key}, unnest(_grams) AS gram
          FROM (SELECT {key}, {grams} AS _grams
                FROM (SELECT {key}, {toks} AS _toks FROM {table}))
        ),
        bg AS (SELECT DISTINCT gram FROM dg WHERE {bench_where}),
        hits AS (
          SELECT {key}, CAST(COUNT(*) AS BIGINT) AS n_hits
          FROM dg JOIN bg USING (gram) GROUP BY {key}
        )
        SELECT d.{key},
               coalesce(h.n_hits, 0) AS n_hits,
               CAST(coalesce(h.n_hits, 0) > 0 AS INT) AS contaminated
        FROM {table} d LEFT JOIN hits h USING ({key})
    """


def decontaminate_spans(
    docs: DataFrame,
    bench: DataFrame,
    k: int = 5,
    key: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Span-level decontamination: REMOVE each contaminated k-gram run
    (merged to maximal [start, end) token spans) instead of flagging or
    dropping whole documents — the surgical variant real pipelines
    prefer for long documents that merely QUOTE a benchmark item.

    Shape: benchmark grams are md5-hashed exactly like the corpus side
    (operators/spandedup._gram_hashes) and **broadcast**; corpus
    positional grams are filtered map-side, so only contaminated
    positions (rare) ever shuffle into the per-doc span merge. The
    removal machinery (within-row fold + coverage filter) is SHARED
    with cross-doc span dedup (spandedup.remove_spans) — the flag
    source differs, nothing else. Every occurrence is removed (no
    first-occurrence winner: contaminated text must go everywhere).

    Tokenization is the single-space split shared with the span-dedup
    family (paradedup.tokens_expr), so offsets and reassembly agree
    across all three sub-document operators.

    Output: (key, n_tokens, n_spans, n_removed, text_clean).
    """
    from core_spark.operators.spandedup import (
        _gram_hashes, remove_spans, tokens_guarded,
    )
    from core_spark.plans.materialize import pin

    toks = pin(
        docs.select(
            F.col(key),
            F.expr(tokens_guarded(text_col, "spark")).alias("_toks"),
        )
    )
    grams = (
        toks.filter(F.size("_toks") >= k)
        .select(
            key,
            F.posexplode(F.expr(_gram_hashes("_toks", k, "spark"))).alias(
                "_pos", "_h"
            ),
        )
    )
    bench_hashes = (
        bench.select(F.expr(tokens_guarded(text_col, "spark")).alias("_toks"))
        .filter(F.size("_toks") >= k)
        .select(
            F.explode(
                F.expr(
                    f"array_distinct({_gram_hashes('_toks', k, 'spark')})"
                )
            ).alias("_h")
        )
        .distinct()
    )
    flagged = grams.join(F.broadcast(bench_hashes), "_h").select(key, "_pos")
    return remove_spans(toks, flagged, k, id_col=key, out_col="text_clean")


def sql_decontaminate_spans(
    table: str,
    bench_where: str,
    k: int = 5,
    key: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of decontaminate_spans (benchmark = rows of ``table``
    matching ``bench_where``, as in sql_contaminated_docs); the span
    tail is the shared independent gaps-and-islands formulation."""
    from core_spark.operators.spandedup import (
        sql_gram_cte, sql_span_tail, tokens_guarded,
    )

    toks = tokens_guarded(text_col, "duckdb")
    return f"""
WITH toks AS (
  SELECT {key}, {toks} AS _toks FROM {table}
), grams AS ({sql_gram_cte(k, key)}
), bhash AS (
  SELECT DISTINCT _h
  FROM grams WHERE {bench_where.replace(key, f"grams.{key}")}
), flagged AS (
  SELECT g.{key}, g._pos FROM grams g JOIN bhash USING (_h)
){sql_span_tail(k, key, "text_clean")}"""
