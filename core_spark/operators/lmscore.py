"""Char-trigram LM fluency scoring — the CCNet-style language-model
quality filter, integer-exact.

Real web pipelines (CCNet, RefinedWeb, Gopher) filter documents by a
language-model score: text whose character statistics look like the
reference corpus is kept, gibberish / boilerplate / encoding garbage is
cut. The full treatment is a KenLM perplexity; the Spark-native,
oracle-portable core is the same two-phase shape with an integer rarity
score standing in for -log p:

  fit    — on a DETERMINISTIC hash sample of the corpus (the portable
           60-bit md5 gate shared with operators/sampling.py — a pure
           map-side filter, no shuffle), count char-trigram occurrences
           and keep the top-V as the "model": one explode + one
           hash-agg on uniform trigram keys (map-side combine absorbs
           the Zipf head), one top-V cut.
  score  — for EVERY doc: trigram occurrences → broadcast hash join
           against the V-row model → per-doc re-aggregation. Per
           trigram the rarity is SCALE DIV count (true integer
           division, both engines); out-of-vocabulary trigrams get the
           maximum penalty SCALE (count-1 equivalent). A doc's score is
           the integer mean rarity — LOW = fluent (common trigrams),
           HIGH = gibberish — monotone in the geometric-mean
           probability under Zipf, which is what the log-space
           perplexity measures; the float -log variant is the at-scale
           path when cross-engine bit-identity is not required
           (documented, not compared).

100-TB shape: fit touches only the sampled fraction; the model is a
bounded broadcast (V ≤ a few thousand rows); the scoring pass is one
explode + broadcast join + groupBy(doc_id) whose shuffle carries only
per-doc partial sums (count/sum combine map-side), i.e. ~one row per
doc per map partition regardless of document length. Nothing Python,
nothing quadratic, no corpus-wide window. Normalize/fold text upstream
(functions/textnorm.py) so case/accent variants share trigram mass.

Portability (CLAUDE.md rules): trigram extraction is the same
sequence/filter/transform emission on both engines; all compared values
are BIGINT (DuckDB SUM is HUGEINT — cast); the only division is DIV
(Spark) / ``//`` (DuckDB); the sample gate is the shared md5 recipe.

No reference counterpart (specvital/core has no corpus subsystem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from core_spark.operators.sampling import SCALE, _hash_expr

#: rarity assigned to an out-of-vocabulary trigram (= SCALE DIV 1)
OOV_PENALTY = SCALE


def trigram_expr(text_col: str, dialect: str = "spark") -> str:
    """Char-trigram occurrence list (1-based substring windows); empty
    list for NULL / shorter-than-3 text on BOTH engines (Spark: greatest
    skips the NULL, the filter predicate is NULL → element dropped;
    DuckDB: generate_series over NULL bounds yields an empty list)."""
    if dialect == "spark":
        return (
            f"transform(filter(sequence(1, greatest(length({text_col}), 1)),"
            f" i -> i + 2 <= length({text_col})),"
            f" i -> substring({text_col}, i, 3))"
        )
    return (
        f"list_transform(list_filter("
        f"generate_series(1, greatest(length({text_col}), 1)),"
        f" i -> i + 2 <= length({text_col})),"
        f" i -> substring({text_col}, i, 3))"
    )


def fit_trigram_lm(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fit_rate: float = 0.25,
    vocab_size: int = 2048,
    salt: str = ":lmfit",
) -> DataFrame:
    """The "model": (tri, cnt) for the top-``vocab_size`` trigrams by
    occurrence count over the hash-sampled fit set. Deterministic:
    sample membership is the md5 gate, the cut orders by
    (cnt DESC, tri ASC)."""
    thresh = int(round(fit_rate * SCALE))
    sampled = df.where(f"{_hash_expr(id_col, salt, 'spark')} < {thresh}")
    return (
        sampled.selectExpr(f"explode({trigram_expr(text_col)}) AS tri")
        .groupBy("tri")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tri").asc())
        .limit(vocab_size)
    )


def score_docs(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc fluency: (id, n_tri, n_oov, rarity_sum, score).

    score = rarity_sum DIV max(n_tri, 1) — integer mean rarity, LOW =
    fluent. ``model`` must be bounded (use fit_trigram_lm); it is
    explicitly broadcast. explode_outer keeps trigram-less docs in the
    output with zero counts (the DuckDB twin reassembles them with a
    LEFT JOIN instead — same rows)."""
    tri = df.select(
        id_col,
        F.explode_outer(F.expr(trigram_expr(text_col))).alias("tri"),
    )
    joined = tri.join(F.broadcast(model), "tri", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("tri").alias("n_tri"),
            F.count_if(
                F.col("tri").isNotNull() & F.col("cnt").isNull()
            ).alias("n_oov"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("tri").isNotNull(),
                        F.coalesce(
                            F.expr(f"{SCALE} DIV cnt"), F.lit(OOV_PENALTY)
                        ),
                    )
                ),
                F.lit(0),
            ).alias("rarity_sum"),
        )
        .selectExpr(
            id_col,
            "n_tri",
            "n_oov",
            "rarity_sum",
            "rarity_sum DIV greatest(n_tri, 1) AS score",
        )
    )


def trigram_fluency(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fit_rate: float = 0.25,
    vocab_size: int = 2048,
    salt: str = ":lmfit",
) -> DataFrame:
    """fit → score composed. The corpus is scanned twice (once filtered
    to the fit sample, once to score) — deliberately NOT pinned: the
    multi-consumer pin rule (CLAUDE.md) is for derived tables feeding
    self-joins, and materializing a raw 100-TB scan costs far more than
    re-reading it. The derived model IS consumed exactly once, as the
    broadcast side of the score join."""
    model = fit_trigram_lm(df, text_col, id_col, fit_rate, vocab_size, salt)
    return score_docs(df, model, text_col, id_col)


def sql_trigram_fluency(
    docs_table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    fit_rate: float = 0.25,
    vocab_size: int = 2048,
    salt: str = ":lmfit",
) -> str:
    """DuckDB twin: same sample gate, same trigram emission, same top-V
    cut, LEFT-JOIN reassembly for trigram-less docs, every compared
    column cast to BIGINT (DuckDB SUM is HUGEINT)."""
    thresh = int(round(fit_rate * SCALE))
    tri = trigram_expr(text_col, "duckdb")
    return f"""
WITH model AS (
  SELECT tri, COUNT(*) AS cnt
  FROM (
    SELECT unnest({tri}) AS tri
    FROM {docs_table}
    WHERE {_hash_expr(id_col, salt, 'duckdb')} < {thresh}
  )
  GROUP BY tri
  ORDER BY cnt DESC, tri ASC
  LIMIT {vocab_size}
),
occ AS (
  SELECT {id_col}, unnest({tri}) AS tri
  FROM {docs_table}
),
agg AS (
  SELECT o.{id_col},
         COUNT(*) AS n_tri,
         COUNT(*) FILTER (WHERE m.cnt IS NULL) AS n_oov,
         CAST(COALESCE(SUM(COALESCE({SCALE} // m.cnt, {OOV_PENALTY})), 0)
              AS BIGINT) AS rarity_sum
  FROM occ o LEFT JOIN model m USING (tri)
  GROUP BY o.{id_col}
)
SELECT d.{id_col},
       COALESCE(a.n_tri, 0) AS n_tri,
       COALESCE(a.n_oov, 0) AS n_oov,
       COALESCE(a.rarity_sum, 0) AS rarity_sum,
       COALESCE(a.rarity_sum, 0) // greatest(COALESCE(a.n_tri, 0), 1)
         AS score
FROM {docs_table} d LEFT JOIN agg a USING ({id_col})
"""
