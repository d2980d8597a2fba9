"""Skip-gram (center, context) pair extraction for embedding training.

The data-prep step under word2vec-family embedding training (Mikolov
et al. 2013): for every token position, emit the tokens at distance
1..window on each side as (center, context, dist) pairs, aggregated to
counts. The counted-pair table is the standard input to SGNS training
and to distributional-similarity analyses (it is also exactly the
co-occurrence matrix GloVe factorizes, modulo its distance weighting —
``dist`` is emitted so callers can apply any weighting downstream
without re-extracting).

Exactness: pure token arithmetic — BIGINT counts and distances, no
floats anywhere.

Scale shape: pair generation is WITHIN-ROW (one nested
transform/flatten over the token array — forward distances only, so
each undirected co-occurrence is built once) followed by ONE hash-agg
on (center, context, dist) where map-side combine absorbs the Zipf
head; the backward direction is derived from the aggregated forward
table by mirroring (center/context swapped, dist negated) — zero
extra shuffle, half the exploded volume. Sub-2-token docs drop via a
plain filter BEFORE the HOF (the decontaminate CASE-vs-filter
lesson). Lambda volume is ~n·window per doc — far under the PLANS
§109 ~1e7 interpreted-HOF budget at any per-doc length; the stream is
explode-then-agg, never a join. ``min_count`` prunes OUTPUT rows only
(symmetric by construction, so pruning after mirroring keeps the two
directions consistent).

The DuckDB twin is the INDEPENDENT positional plan (the collocations
convention): tokens WITH ORDINALITY, forward pairs from a positional
range SELF-JOIN within doc, the same mirror/prune tail.

No reference counterpart (specvital/core has no corpus-statistics
subsystem); the extraction is the published word2vec formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _validate(window: int, min_count: int) -> tuple[int, int]:
    if int(window) < 1:
        raise ValueError(
            f"skipgram_pairs: window must be >= 1, got {window}")
    if int(min_count) < 1:
        raise ValueError(
            f"skipgram_pairs: min_count must be >= 1, got {min_count}")
    return int(window), int(min_count)


def skipgram_pairs(
    docs: DataFrame,
    window: int = 2,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """(center, context, dist, cnt): directed skip-gram co-occurrence
    counts over whitespace tokens; dist in [-window, window] \\ {0}
    (positive = context AFTER center), cnt >= min_count."""
    window, min_count = _validate(window, min_count)
    fw = (
        docs.selectExpr(
            f"filter(split(coalesce({text_col}, ''), ' '), x -> x <> '')"
            " AS _tk")
        .where("size(_tk) >= 2")
        .selectExpr(
            "explode(flatten(transform(sequence(1, size(_tk) - 1),"
            " i -> transform("
            f"sequence(i + 1, least(i + {window}, size(_tk))),"
            " j -> struct(element_at(_tk, CAST(i AS INT)) AS center,"
            " element_at(_tk, CAST(j AS INT)) AS context,"
            " CAST(j - i AS BIGINT) AS dist))))) AS _p")
        .select("_p.*")
        .groupBy("center", "context", "dist")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return (
        fw.unionAll(
            fw.selectExpr(
                "context AS center", "center AS context",
                "-dist AS dist", "cnt"))
        .where(f"cnt >= {min_count}")
    )


def sql_skipgram_pairs(
    docs_sql: str,
    window: int = 2,
    text_col: str = "text",
    min_count: int = 1,
) -> str:
    """DuckDB twin via the INDEPENDENT positional plan: tokens WITH
    ORDINALITY, forward pairs from a positional range self-join within
    doc, mirror + prune tail."""
    window, min_count = _validate(window, min_count)
    return f"""
        WITH src AS (
          SELECT row_number() OVER () AS _doc,
                 list_filter(string_split(coalesce({text_col}, ''), ' '),
                             x -> x <> '') AS tk
          FROM ({docs_sql}) d
        ),
        toks AS (
          SELECT _doc, u.i AS _pos, tk[u.i] AS w
          FROM src,
               LATERAL unnest(generate_series(1, len(tk))) u(i)
        ),
        fw AS (
          SELECT a.w AS center, b.w AS context,
                 CAST(b._pos - a._pos AS BIGINT) AS dist,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM toks a
          JOIN toks b ON a._doc = b._doc
                     AND b._pos > a._pos
                     AND b._pos <= a._pos + {window}
          GROUP BY a.w, b.w, b._pos - a._pos
        )
        SELECT center, context, dist, cnt FROM (
          SELECT center, context, dist, cnt FROM fw
          UNION ALL
          SELECT context AS center, center AS context,
                 -dist AS dist, cnt
          FROM fw
        ) both_dirs
        WHERE cnt >= {min_count}
    """
