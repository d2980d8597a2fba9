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
