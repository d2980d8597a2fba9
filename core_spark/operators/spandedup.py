"""Cross-document substring-level dedup (repeated-span removal).

The gap VERDICT r4 named "What's missing #2": paragraph-level dedup
(operators/paradedup.py) misses boilerplate that does not align to
paragraph breaks. Real pre-training pipelines (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better", the
ExactSubstr treatment) remove repeated ~50-token spans ACROSS document
boundaries. The published implementation is a corpus-wide suffix array —
a single-machine algorithm. The Spark-native shape implemented here is
the fixed-k token-gram variant:

1. tokenize (single-space split, shared with paradedup) and emit every
   positional k-token gram as a portable 60-bit md5 hash — one explode,
   ~n_tokens rows per doc (docs with < k tokens emit nothing and pass
   through untouched via the final left join);
2. one hash aggregate per gram: the number of DISTINCT docs containing
   it (map-side partial distinct) and the first occurrence
   ``min(struct(doc_id, pos))`` — the same lexicographic-struct winner
   as paradedup, overflow-free at any doc_id/position;
3. flag every occurrence of a CROSS-DOC gram (>= 2 distinct docs)
   except the winner occurrence — first occurrence wins, all later
   copies (including same-doc repeats of a cross-doc gram) are removal
   candidates. Same-doc-only repeats are NOT flagged (within-doc
   repetition is a quality signal, operators/repetition.py, not dedup);
4. per doc, merge flagged gram starts into maximal token spans
   ``[start, end)`` (0-based, end-exclusive — the repo-wide span
   convention): a within-row fold over the sorted position list
   (overlap or adjacency merges), no window, no extra shuffle beyond
   the per-doc groupBy;
5. emit per doc: n_tokens, n_spans, n_removed (tokens covered by
   spans), and text_dedup (tokens outside all spans, original order).

Three shuffles — gram hash-agg, flag join (uniform md5 keys; a
mega-duplicated gram is one hot probe key, AQE skew-join splits it),
doc reassembly — all on uniform keys; everything per-row is JVM
higher-order functions, zero Python. Run exact/doc-level dedup first at
scale so identical documents don't flood the gram index.

Fidelity note vs the suffix-array original: fixed k detects duplicated
spans of length >= k at gram granularity (a duplicated span of length
L >= k is covered by L-k+1 flagged grams and merges back to exactly
[start, start+L)); spans shorter than k are invisible, which is the
documented knob (Lee et al. use 50 BPE tokens; k is caller-chosen).

No reference counterpart (specvital/core has no corpus subsystem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from core_spark.operators.paradedup import tokens_expr
from core_spark.plans.materialize import pin


def tokens_guarded(text_col: str, dialect: str) -> str:
    """``tokens_expr`` with NULL text coalesced to an EMPTY array, so a
    NULL-text doc flows through span removal as an empty doc on both
    engines (unguarded, Spark's reassembly emits NULL text while the
    SQL tail's COALESCE emits '' — a cross-engine divergence)."""
    t = tokens_expr(text_col, dialect)
    if dialect == "spark":
        return f"COALESCE({t}, CAST(array() AS array<string>))"
    return f"COALESCE({t}, CAST([] AS VARCHAR[]))"


def _gram_hashes(toks_col: str, k: int, dialect: str) -> str:
    """Array of positional k-gram 60-bit md5 hashes (index i = 0-based
    token start). NOT distinct — position matters.

    PRECONDITION (Spark dialect): the caller must pre-filter
    ``size(toks) >= k`` — ``sequence(0, size - k)`` with ``size < k``
    generates a DESCENDING sequence whose negative indices make
    ``slice`` throw at runtime. Both in-repo callers
    (``dedup_substrings``, ``decontaminate``) filter first. The DuckDB
    branch genuinely emits an empty list for short docs (its ``range``
    is empty), so only the Spark side carries the precondition."""
    if dialect == "spark":
        return (
            f"transform(sequence(0, size({toks_col}) - {k}), i -> "
            f"CAST(conv(substr(md5(array_join("
            f"slice({toks_col}, i + 1, {k}), ' ')), 1, 15), 16, 10)"
            f" AS BIGINT))"
        )
    return (
        f"[('0x' || substr(md5(array_to_string("
        f"{toks_col}[i:i + {k} - 1], ' ')), 1, 15))::BIGINT "
        f"for i in range(1, len({toks_col}) - {k} + 2)]"
    )


def remove_spans(
    toks: DataFrame,
    flagged: DataFrame,
    k: int,
    id_col: str = "doc_id",
    out_col: str = "text_dedup",
) -> DataFrame:
    """Shared span-removal tail: merge flagged k-gram start positions
    (``flagged``: (id, _pos) rows) into maximal [start, end) token spans
    with a within-row fold, drop covered tokens from ``toks``
    ((id, _toks) rows), emit (id, n_tokens, n_spans, n_removed,
    ``out_col``). Used by cross-doc span dedup AND span-level
    decontamination — the flag SOURCE differs, the removal machinery is
    identical."""
    spans_fold = (
        "aggregate(sort_array(collect_list(_pos)), "
        "CAST(array() AS array<struct<start: int, end: int>>), "
        "(acc, p) -> CASE WHEN size(acc) > 0 "
        "AND p <= element_at(acc, -1).end THEN "
        f"concat(slice(acc, 1, size(acc) - 1), "
        f"array(struct(element_at(acc, -1).start AS start, "
        f"CAST(p + {k} AS INT) AS end))) "
        f"ELSE concat(acc, array(struct(CAST(p AS INT) AS start, "
        f"CAST(p + {k} AS INT) AS end))) END)"
    )
    doc_spans = flagged.groupBy(id_col).agg(
        F.expr(spans_fold).alias("_spans")
    )
    return (
        toks.join(doc_spans, id_col, "left")
        .withColumn(
            "_spans",
            F.coalesce(
                "_spans",
                F.expr("CAST(array() AS array<struct<start: int, end: int>>)"),
            ),
        )
        .select(
            id_col,
            F.size("_toks").alias("n_tokens"),
            F.size("_spans").alias("n_spans"),
            F.expr(
                "aggregate(_spans, 0, (s, sp) -> s + sp.end - sp.start)"
            ).alias("n_removed"),
            F.array_join(
                F.expr(
                    "filter(_toks, (t, i) -> "
                    "NOT exists(_spans, sp -> i >= sp.start AND i < sp.end))"
                ),
                " ",
            ).alias(out_col),
        )
    )


def dedup_substrings(
    df: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, n_spans, n_removed, text_dedup) after cross-doc
    repeated-span removal (module docstring for plan and semantics)."""
    # both multi-consumer tables are pinned (plans/materialize.py): toks
    # feeds the gram stage AND the final reassembly join; grams feeds the
    # stats aggregate AND the flag-join probe — each branch of a Spark
    # plan re-evaluates its input, so unpinned the tokenize+md5 pass runs
    # up to 4x (CLAUDE.md self-join rule; measured 1.98s -> see PLANS 29)
    toks = pin(
        df.select(
            F.col(id_col),
            F.expr(tokens_guarded(text_col, "spark")).alias("_toks"),
        )
    )
    grams = pin(
        toks.filter(F.size("_toks") >= k)
        .select(
            id_col,
            F.posexplode(F.expr(_gram_hashes("_toks", k, "spark"))).alias(
                "_pos", "_h"
            ),
        )
    )
    stats = grams.groupBy("_h").agg(
        F.countDistinct(id_col).alias("_ndocs"),
        F.min(F.struct(F.col(id_col), F.col("_pos"))).alias("_win"),
    )
    flagged = (
        grams.join(stats, "_h")
        .filter(
            (F.col("_ndocs") >= 2)
            & (F.struct(F.col(id_col), F.col("_pos")) != F.col("_win"))
        )
        .select(id_col, "_pos")
    )
    # within-row interval merge: positions sorted; p <= last.end extends
    # (sorted input => new end is always p + k), p > last.end opens a span
    return remove_spans(toks, flagged, k, id_col=id_col)


def sql_span_tail(k: int, id_col: str, out_col: str) -> str:
    """SQL tail shared by the span-dedup and span-decontamination twins
    (expects CTEs ``toks(id, _toks)`` and ``flagged(id, _pos)``):
    gaps-and-islands window merge + anti-join token reassembly — the
    independent formulation of the Spark fold."""
    return f""", lagged AS (
  SELECT {id_col}, _pos,
         CASE WHEN _pos <= COALESCE(LAG(_pos) OVER w, -{k} - 1) + {k}
              THEN 0 ELSE 1 END AS _brk
  FROM flagged
  WINDOW w AS (PARTITION BY {id_col} ORDER BY _pos)
), islands AS (
  SELECT {id_col}, _pos,
         SUM(_brk) OVER (PARTITION BY {id_col} ORDER BY _pos) AS _isl
  FROM lagged
), spans AS (
  SELECT {id_col}, MIN(_pos) AS start, MAX(_pos) + {k} AS "end"
  FROM islands GROUP BY {id_col}, _isl
), covered AS (
  SELECT {id_col}, unnest(generate_series(start, "end" - 1)) AS _i
  FROM spans
), toktable AS (
  SELECT {id_col}, u - 1 AS _i, _toks[u] AS _tok
  FROM toks, unnest(generate_series(1, len(_toks))) AS s(u)
), kept AS (
  SELECT t.{id_col}, t._i, t._tok
  FROM toktable t ANTI JOIN covered c
    ON t.{id_col} = c.{id_col} AND t._i = c._i
), agg AS (
  SELECT {id_col},
         COALESCE(COUNT(s.start), 0) AS n_spans,
         COALESCE(SUM(s."end" - s.start), 0) AS n_removed
  FROM toks LEFT JOIN spans s USING ({id_col})
  GROUP BY {id_col}
)
SELECT toks.{id_col} AS {id_col},
       CAST(len(_toks) AS INT) AS n_tokens,
       CAST(agg.n_spans AS INT) AS n_spans,
       CAST(agg.n_removed AS INT) AS n_removed,
       COALESCE((SELECT string_agg(_tok, ' ' ORDER BY _i)
                 FROM kept WHERE kept.{id_col} = toks.{id_col}), '')
         AS {out_col}
FROM toks JOIN agg USING ({id_col})
"""


def sql_gram_cte(k: int, id_col: str) -> str:
    """``grams(id, _pos, _h)`` CTE body over an upstream ``toks`` CTE."""
    grams = _gram_hashes("_toks", k, "duckdb")
    return f"""
  SELECT {id_col}, u - 1 AS _pos, _g[u] AS _h
  FROM (SELECT {id_col}, {grams} AS _g FROM toks),
       unnest(generate_series(1, len(_g))) AS s(u)
"""


def sql_dedup_substrings(
    table: str,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle twin — independent formulation: gaps-and-islands
    window merge instead of the fold, anti-join token reassembly instead
    of the index filter. Same semantics, different plan."""
    toks = tokens_guarded(text_col, "duckdb")
    return f"""
WITH toks AS (
  SELECT {id_col}, {toks} AS _toks FROM {table}
), grams AS ({sql_gram_cte(k, id_col)}
), stats AS (
  SELECT _h, COUNT(DISTINCT {id_col}) AS _ndocs,
         MIN(ROW({id_col}, _pos)) AS _win
  FROM grams GROUP BY _h
), flagged AS (
  SELECT g.{id_col}, g._pos
  FROM grams g JOIN stats USING (_h)
  WHERE _ndocs >= 2 AND ROW(g.{id_col}, g._pos) <> _win
){sql_span_tail(k, id_col, "text_dedup")}"""
