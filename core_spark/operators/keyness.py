"""Odds-ratio keyness: which terms distinguish one corpus slice?

The contrastive-vocabulary primitive (corpus-linguistics "keyness";
Monroe et al. 2008 survey the family): for every term, the odds that
an A-slice document contains it vs the odds a B-slice document does.
tfidf answers "what is distinctive of THIS doc", PMI answers "which
words attract each other"; keyness answers "what does slice A talk
about that slice B doesn't" — the diagnostic for domain skew between
hosts, before/after a crawl policy change, or kept-vs-dropped filter
audits.

Log-free exactness (the PMI lift recipe): the standard log-odds with
Haldane's +1/2 smoothing becomes FULLY RATIONAL after doubling —

    OR = ((2a+1) * (2d+1)) / ((2b+1) * (2c+1))

with a/b = A/B documents containing the term and c/d the slice
remainders: num and den are EXACT BIGINT products, odds_ratio is ONE
trailing IEEE division beside them, and the smoothing keeps every
term defined (b = 0 slam-dunk terms included — no NULL/inf arms).
Ranking by OR is order-equivalent to ranking by log-odds (log is
monotone), so nothing is lost by never taking the log.

Document-frequency grain by design: a term counts once per document
(array_distinct within-row BEFORE the explode — the termstats rule),
so spam repetition cannot inflate its own keyness.

Scale shape: within-row distinct → explode → ONE uniform hash-agg
on term with conditional sums (map-side combine eats the token
stream); slice totals are a 1-row aggregate crossJoined broadcast-
style; ``min_count`` bounds the emitted vocabulary (a+b >= it). No
window, no token-level join.

Overflow envelope: (2a+1)(2d+1) needs slice sizes < 1.5e9 docs;
past that pre-partition the corpus and merge counts first.

The DuckDB twin is the INDEPENDENT plan: per-slice distinct
doc-term counts as TWO subqueries FULL-OUTER-joined on term with
COALESCE — a different aggregation structure from the conditional
sums — over the same string_split tokenizer.

No reference counterpart (specvital/core has no term-statistics
subsystem); the measure is the classical smoothed odds ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# identical final projection text on both engines, over the grain
# (term, a, b, n_a, n_b) with c = n_a - a, d = n_b - b
_FINAL = (
    "term",
    "CAST(a AS BIGINT) AS a_docs",
    "CAST(b AS BIGINT) AS b_docs",
    "CAST(n_a AS BIGINT) AS n_a",
    "CAST(n_b AS BIGINT) AS n_b",
    "CAST((2 * a + 1) * (2 * (n_b - b) + 1) AS BIGINT) AS num",
    "CAST((2 * b + 1) * (2 * (n_a - a) + 1) AS BIGINT) AS den",
    "CAST((2 * a + 1) * (2 * (n_b - b) + 1) AS DOUBLE)"
    " / CAST((2 * b + 1) * (2 * (n_a - a) + 1) AS DOUBLE)"
    " AS odds_ratio",
)


def odds_ratio_keyness(
    docs: DataFrame,
    is_a_col: str = "is_a",
    toks_col: str = "toks",
    min_count: int = 1,
) -> DataFrame:
    """(term, a_docs, b_docs, n_a, n_b, num, den, odds_ratio) for every
    term contained by at least ``min_count`` documents: Haldane-
    smoothed odds a slice-A doc contains the term vs a slice-B doc.
    ``is_a_col`` must be boolean-like (true = slice A); NULL slice
    rows are dropped; empty-token docs still count in the totals."""
    if int(min_count) < 1:
        raise ValueError(
            f"odds_ratio_keyness: min_count must be >= 1,"
            f" got {min_count}")
    base = docs.where(F.col(is_a_col).isNotNull()).selectExpr(
        f"CASE WHEN {is_a_col} THEN 1L ELSE 0L END AS _ia",
        f"{toks_col} AS _toks",
    )
    totals = base.agg(
        F.expr("CAST(SUM(_ia) AS BIGINT)").alias("n_a"),
        F.expr("CAST(SUM(1 - _ia) AS BIGINT)").alias("n_b"),
    )
    per_term = (
        base.select(
            "_ia", F.explode(F.array_distinct(F.col("_toks"))).alias("term"))
        .where("term IS NOT NULL AND term <> ''")
        .groupBy("term")
        .agg(
            F.expr("CAST(SUM(_ia) AS BIGINT)").alias("a"),
            F.expr("CAST(SUM(1 - _ia) AS BIGINT)").alias("b"),
        )
        .where(f"a + b >= {int(min_count)}")
    )
    return (
        per_term.crossJoin(F.broadcast(totals))
        .selectExpr(*_FINAL)
    )


def sql_odds_ratio_keyness(
    docs_sql: str,
    is_a_col: str = "is_a",
    text_col: str = "text",
    key: str = "doc_id",
    min_count: int = 1,
) -> str:
    """DuckDB twin via the INDEPENDENT two-subquery plan: per-slice
    distinct doc-term counts FULL-OUTER-joined on term + COALESCE;
    string_split(trim(text), ' ') tokenizer (the Spark caller must
    tokenize identically); same final projection text. ``docs_sql``
    must yield (key, is_a, text)."""
    return f"""
        WITH base AS (
          SELECT {key} AS k,
                 CASE WHEN {is_a_col} THEN 1 ELSE 0 END AS ia,
                 {text_col} AS txt
          FROM ({docs_sql}) s
          WHERE {is_a_col} IS NOT NULL
        ),
        dt AS (
          SELECT DISTINCT k, ia, t.term
          FROM base, unnest(string_split(trim(txt), ' ')) t(term)
          WHERE t.term IS NOT NULL AND t.term <> ''
        ),
        ca AS (
          SELECT term, CAST(COUNT(*) AS BIGINT) AS a
          FROM dt WHERE ia = 1 GROUP BY term
        ),
        cb AS (
          SELECT term, CAST(COUNT(*) AS BIGINT) AS b
          FROM dt WHERE ia = 0 GROUP BY term
        ),
        merged AS (
          SELECT COALESCE(ca.term, cb.term) AS term,
                 COALESCE(ca.a, 0) AS a, COALESCE(cb.b, 0) AS b
          FROM ca FULL OUTER JOIN cb ON ca.term = cb.term
        ),
        totals AS (
          SELECT CAST(SUM(ia) AS BIGINT) AS n_a,
                 CAST(SUM(1 - ia) AS BIGINT) AS n_b
          FROM base
        )
        SELECT {", ".join(_FINAL)} FROM (
          SELECT m.term, m.a, m.b, t.n_a, t.n_b
          FROM merged m, totals t
          WHERE m.a + m.b >= {int(min_count)}
        ) q
    """
