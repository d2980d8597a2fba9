"""Kneser-Ney n-gram statistics: the LM smoothing count tables.

Training-data pipelines don't just filter text — they MEASURE it, and
the canonical language-model statistics behind interpolated Kneser-Ney
smoothing (Kneser & Ney 1995; Chen & Goodman 1998) are all integer
count tables over the corpus n-grams:

    c(w1..wn)               the n-gram count
    c(w1..wn-1)             the history mass (denominator)
    N1+(w1..wn-1 •)         distinct continuations of the history
                            (the backoff weight's numerator)
    N1+(• w2..wn)           distinct predecessors of the suffix
                            (the continuation probability's numerator)

Everything downstream (the discounted probability, the backoff
interpolation) is driver-side arithmetic over these four integers —
so the ENGINE's job is exactly this table, emitted exact.

Scale shape — the one big shuffle is the n-gram aggregation, and every
other statistic derives from the AGGREGATED table, three orders of
magnitude smaller than the raw gram stream:

1. tokens: whitespace split (the geoterms convention), empty tokens
   filtered WITHIN the row; docs shorter than n drop via a plain
   filter BEFORE the HOF (the decontaminate lesson: guard with a
   filter, never a CASE around a higher-order function);
2. grams: one within-row ``transform(sequence(...))`` builds the
   struct array — zero shuffles until the explode;
3. ONE hash-agg to (w1..wn, c) — map-side partial aggregation absorbs
   the stopword-gram skew before the wire;
4. history stats (SUM(c), COUNT(*)) and continuation stats (COUNT(*))
   re-aggregate the PINNED gram table (three consumers — the CLAUDE.md
   multi-consumer rule) and join back on their prefix/suffix keys.

``min_count`` prunes the OUTPUT only, after every statistic is
computed over the full distribution — a thresholded table must not
pretend the rare mass never existed (that is what the discount is
for).

The DuckDB oracle is an INDEPENDENT plan: no re-aggregation, no joins
— all four statistics as window functions (COUNT(*) / COUNT(DISTINCT)
OVER the three partitions) over the RAW gram rows, deduplicated to the
gram grain. Arrays are 1-based on both engines (element_at / DuckDB
list indexing — the portability memory's convention).

No reference counterpart (specvital/core has no LM subsystem); the
statistics are the published Kneser-Ney / Chen-Goodman definitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from core_spark.plans.materialize import pin


def _ws(n: int) -> list[str]:
    return [f"w{i + 1}" for i in range(n)]


def _check(n: int, min_count: int) -> None:
    if not 2 <= int(n) <= 6:
        raise ValueError(f"kn_ngram_stats: n must be in 2..6, got {n}")
    if int(min_count) < 1:
        raise ValueError(
            f"kn_ngram_stats: min_count must be >= 1, got {min_count}")


def kn_ngram_stats(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """(w1..wn, c, hist_c, hist_types, cont_types) — exact BIGINT
    Kneser-Ney count tables over whitespace tokens; rows with
    c < min_count pruned AFTER all statistics are computed."""
    _check(n, min_count)
    n = int(n)
    ws = _ws(n)
    fields = ", ".join(
        f"element_at(_tk, CAST(i + {j} AS INT)) AS {w}"
        for j, w in enumerate(ws)
    )
    grams = (
        docs.selectExpr(
            f"filter(split(coalesce({text_col}, ''), ' '),"
            " x -> x <> '') AS _tk")
        .where(f"size(_tk) >= {n}")
        .selectExpr(
            f"explode(transform(sequence(1, size(_tk) - {n - 1}),"
            f" i -> struct({fields}))) AS _g")
        .select("_g.*")
    )
    agg = pin(
        grams.groupBy(*ws).agg(F.count("*").cast("long").alias("c")))
    hist = agg.groupBy(*ws[:-1]).agg(
        F.sum("c").cast("long").alias("hist_c"),
        F.count("*").cast("long").alias("hist_types"),
    )
    cont = agg.groupBy(*ws[1:]).agg(
        F.count("*").cast("long").alias("cont_types"))
    return (
        agg.join(hist, ws[:-1])
        .join(cont, ws[1:])
        .where(f"c >= {int(min_count)}")
        .select(*ws, "c", "hist_c", "hist_types", "cont_types")
    )


def sql_kn_ngram_stats(
    docs_sql: str,
    n: int = 3,
    text_col: str = "text",
    min_count: int = 1,
) -> str:
    """DuckDB twin via the INDEPENDENT window plan: every statistic a
    window aggregate over RAW gram rows (COUNT DISTINCT windows), then
    DISTINCT to the gram grain — no re-agg, no joins."""
    _check(n, min_count)
    n = int(n)
    ws = _ws(n)
    fields = ", ".join(f"tk[i + {j}] AS {w}" for j, w in enumerate(ws))
    hist_key = ", ".join(ws[:-1])
    cont_key = ", ".join(ws[1:])
    gram_key = ", ".join(ws)
    return f"""
        WITH src AS ({docs_sql}),
        toks AS (
          SELECT list_filter(string_split(coalesce({text_col}, ''), ' '),
                             x -> x <> '') AS tk
          FROM src
        ),
        g AS (
          SELECT {fields}
          FROM toks,
               LATERAL unnest(generate_series(1, len(tk) - {n - 1})) u(i)
          WHERE len(tk) >= {n}
        ),
        w AS (
          SELECT {gram_key},
                 COUNT(*) OVER (PARTITION BY {gram_key}) AS c,
                 COUNT(*) OVER (PARTITION BY {hist_key}) AS hist_c,
                 COUNT(DISTINCT {ws[-1]})
                   OVER (PARTITION BY {hist_key}) AS hist_types,
                 COUNT(DISTINCT {ws[0]})
                   OVER (PARTITION BY {cont_key}) AS cont_types
          FROM g
        )
        SELECT DISTINCT {gram_key},
               CAST(c AS BIGINT) AS c,
               CAST(hist_c AS BIGINT) AS hist_c,
               CAST(hist_types AS BIGINT) AS hist_types,
               CAST(cont_types AS BIGINT) AS cont_types
        FROM w
        WHERE c >= {int(min_count)}
    """
