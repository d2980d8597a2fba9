"""PMI collocation extraction: lift-ranked adjacent bigrams.

The classic corpus-linguistics collocation measure (Church & Hanks
1990): rank adjacent word pairs by pointwise mutual information,
PMI(x,y) = log( c(x,y) * N / (c(x) * c(y)) ). The repo's portability
stance forbids log in compared values (no transcendentals cross an
engine boundary) — and none is needed: log is monotone, so the LIFT
ratio c(x,y)*N / (c(x)*c(y)) carries the full PMI ordering. The
operator emits the three exact BIGINT counts plus N, and lift as IEEE
double products/quotient in a fixed evaluation order (only *,/ —
bit-identical cross-engine; double products also dodge the int64
overflow a BIGINT c_xy*N would hit at web-corpus N).

Scale shape — two hash-aggs over the raw token stream, everything
else joins against tables that are orders of magnitude smaller:

1. tokens: whitespace split (the geoterms convention), empties
   filtered WITHIN the row; sub-``n``-token docs drop via a plain
   filter BEFORE the HOF (the decontaminate CASE-vs-filter lesson);
2. vocab: ONE hash-agg token→c_w (map-side combine absorbs the Zipf
   head before the wire); pinned — three consumers (x-join, y-join,
   the 1-row N re-agg);
3. bigrams: within-row ``transform(sequence(...))`` struct build, one
   explode, ONE hash-agg to (w1, w2, c_xy);
4. c_x / c_y attach via two uniform hash joins against the pinned
   vocab; N via a crossJoin with the broadcast 1-row total.

``min_count`` prunes OUTPUT bigrams only — unigram counts and N are
computed over the full distribution first (a thresholded table must
not pretend the rare mass never existed).

The DuckDB twin is an INDEPENDENT derivation: tokens unnested WITH
ORDINALITY to (doc, pos, w), bigrams from a positional SELF-JOIN on
pos+1 within doc (not a within-row transform), unigram counts as a
COUNT(*) window over raw token rows (not a vocab table).

No reference counterpart (specvital/core has no corpus-statistics
subsystem); the measure is Church & Hanks' published formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from core_spark.plans.materialize import pin

_LIFT = (
    "(CAST(c_xy AS DOUBLE) * CAST(n_tokens AS DOUBLE))"
    " / (CAST(c_x AS DOUBLE) * CAST(c_y AS DOUBLE)) AS lift"
)


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """(w1, w2, c_xy, c_x, c_y, n_tokens, lift): adjacent-bigram
    collocation table over whitespace tokens; bigrams with
    c_xy < min_count pruned AFTER all counts are computed."""
    if int(min_count) < 1:
        raise ValueError(
            f"pmi_collocations: min_count must be >= 1, got {min_count}")
    toks = docs.selectExpr(
        f"filter(split(coalesce({text_col}, ''), ' '), x -> x <> '')"
        " AS _tk")
    vocab = pin(
        toks.selectExpr("explode(_tk) AS w")
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c_w")))
    total = vocab.agg(F.sum("c_w").cast("long").alias("n_tokens"))
    bigrams = (
        toks.where("size(_tk) >= 2")
        .selectExpr(
            "explode(transform(sequence(1, size(_tk) - 1),"
            " i -> struct(element_at(_tk, CAST(i AS INT)) AS w1,"
            " element_at(_tk, CAST(i + 1 AS INT)) AS w2))) AS _g")
        .select("_g.*")
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c_xy"))
        .where(f"c_xy >= {int(min_count)}")
    )
    return (
        bigrams
        .join(vocab.selectExpr("w AS w1", "c_w AS c_x"), "w1")
        .join(vocab.selectExpr("w AS w2", "c_w AS c_y"), "w2")
        .crossJoin(F.broadcast(total))
        .selectExpr("w1", "w2", "c_xy", "c_x", "c_y", "n_tokens", _LIFT)
    )


def sql_pmi_collocations(
    docs_sql: str,
    text_col: str = "text",
    min_count: int = 1,
) -> str:
    """DuckDB twin via the INDEPENDENT positional plan: tokens WITH
    ORDINALITY, bigrams from a pos+1 self-join within doc, unigram
    counts and N as windows over raw token rows — no vocab table, no
    within-row transform."""
    if int(min_count) < 1:
        raise ValueError(
            f"pmi_collocations: min_count must be >= 1, got {min_count}")
    return f"""
        WITH src AS (
          SELECT row_number() OVER () AS _doc,
                 list_filter(string_split(coalesce({text_col}, ''), ' '),
                             x -> x <> '') AS tk
          FROM ({docs_sql}) d
        ),
        toks AS (
          SELECT _doc, u.i AS _pos, tk[u.i] AS w,
                 COUNT(*) OVER (PARTITION BY tk[u.i]) AS c_w,
                 COUNT(*) OVER () AS n_tokens
          FROM src,
               LATERAL unnest(generate_series(1, len(tk))) u(i)
        ),
        big AS (
          SELECT a.w AS w1, b.w AS w2,
                 CAST(COUNT(*) AS BIGINT) AS c_xy,
                 CAST(MIN(a.c_w) AS BIGINT) AS c_x,
                 CAST(MIN(b.c_w) AS BIGINT) AS c_y,
                 CAST(MIN(a.n_tokens) AS BIGINT) AS n_tokens
          FROM toks a
          JOIN toks b ON a._doc = b._doc AND b._pos = a._pos + 1
          GROUP BY a.w, b.w
        )
        SELECT w1, w2, c_xy, c_x, c_y, n_tokens, {_LIFT}
        FROM big
        WHERE c_xy >= {int(min_count)}
    """
