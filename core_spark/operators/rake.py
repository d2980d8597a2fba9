"""RAKE keyword extraction — corpus key-phrases without a model.

Rapid Automatic Keyword Extraction (Rose et al. 2010): candidate
phrases are the maximal stopword-free word runs; each word scores
deg(w)/freq(w) where freq counts the word's occurrences inside
candidates and deg adds the lengths of every candidate containing
it (words that live in long phrases score higher); a phrase scores
the sum of its words' scores. tfidf_topk ranks single TERMS per
document; this surfaces multi-word PHRASES per corpus — the
"what is this corpus about" readout.

Exactness: deg and freq are exact BIGINT hash-agg sums; the
word-score division is FIXED-POINT (deg·SCALE DIV freq — same
integer on both engines, the lm_fluency rarity recipe), so phrase
scores are exact BIGINT sums of integers and the ranking is
deterministic with a (score DESC, phrase) tie-break. True-rational
RAKE (sum of deg/freq as floats) is the documented alternative when
bit-reproducibility doesn't matter.

Segmentation is tokenize-once + membership (the textstats lesson:
a \\b(stopword|...)\\b alternation scan cost 14s at sf0.1): words
split once, stopwords mapped to a separator by an IN-list CASE
inside one within-row transform, runs rejoined and resplit — all
JVM, no regex alternation, no Python. Candidates longer than
``max_len`` words are discarded (standard RAKE practice; unbounded
runs in low-stopword text produce degenerate mega-phrases).

Scale shape: within-row segmentation (map-side), ONE explode to
phrase occurrences, ONE explode to phrase words; word stats are a
uniform hash-agg; the stats join back to phrase words is a plain
equi-join on the word key (vocabulary-bounded — broadcast when it
fits, the optimizer's call); top-k via one window over the bounded
distinct-phrase table.

No reference counterpart; the algorithm is the published RAKE
formulation with a fixed-point scoring variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from core_spark.plans.materialize import pin

_SCALE = 1_000_000  # fixed-point word-score scale

# function words of the synthetic corpus; callers pass their own
DEFAULT_STOPWORDS = ("a", "the", "of", "and", "to", "in", "is")


def rake_keywords(
    docs: DataFrame,
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
    max_len: int = 4,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` rows (phrase, n_occ, n_words, score_fp): RAKE
    phrases over the corpus, fixed-point scores, deterministic
    (score DESC, phrase) order. Empty/NULL texts contribute
    nothing."""
    if max_len < 1 or k < 1:
        raise ValueError("max_len and k must be >= 1")
    if not stopwords:
        raise ValueError("stopwords must be non-empty")
    stoplist = ", ".join(f"'{s}'" for s in stopwords)
    phrases = (
        docs.where(F.col(text_col).isNotNull())
        .selectExpr(
            "filter(transform("
            f" split(array_join(transform(split(trim({text_col}), ' '),"
            f"   w -> CASE WHEN w IN ({stoplist}) THEN '|' ELSE w END),"
            " ' '), ' *\\\\| *'),"
            " p -> trim(p)),"
            f" p -> p <> '' AND size(split(p, ' ')) <= {max_len})"
            " AS _ps"
        )
        .selectExpr("explode(_ps) AS phrase")
    )
    phrases = phrases.selectExpr(
        "phrase", "split(phrase, ' ') AS _ws",
        "CAST(size(split(phrase, ' ')) AS BIGINT) AS n_words",
    )
    # pinned: word stats AND the score join both consume the exploded
    # phrase words — unpinned, each branch re-runs the segmentation
    pw = pin(phrases.selectExpr("phrase", "n_words",
                                "explode(_ws) AS word"))
    stats = (
        pw.groupBy("word")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("freq"),
            F.expr("CAST(SUM(n_words) AS BIGINT)").alias("deg"),
        )
        .selectExpr(
            "word AS _sw",
            f"deg * {_SCALE} DIV freq AS wscore",
        )
    )
    scored = (
        pw.join(stats, F.col("word") == F.col("_sw"))
        .groupBy("phrase")
        .agg(
            F.expr("CAST(SUM(wscore) AS BIGINT)").alias("_tot"),
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("_n"),
        )
        # every occurrence of a phrase carries the same word multiset:
        # per-occurrence score = total / occurrences, exact
        # integer DIV throughout (never /-then-CAST: Spark truncates
        # where DuckDB rounds — the CLAUDE.md FLOOR-before-cast rule)
        .selectExpr(
            "phrase",
            "_n DIV size(split(phrase, ' ')) AS n_occ",
            "CAST(size(split(phrase, ' ')) AS BIGINT) AS n_words",
            "_tot DIV (_n DIV size(split(phrase, ' '))) AS score_fp",
        )
    )
    w = Window.orderBy(F.desc("score_fp"), "phrase")
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select("phrase", "n_occ", "n_words", "score_fp")
    )


def sql_rake_keywords(
    docs_sql: str,
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
    max_len: int = 4,
    k: int = 20,
    text_col: str = "text",
) -> str:
    """DuckDB twin: same tokenize-once segmentation via list
    functions, same fixed-point scores (// for DIV)."""
    stoplist = ", ".join(f"'{s}'" for s in stopwords)
    return f"""
        WITH rk_ph AS (
            SELECT trim(p) AS phrase
            FROM (
                SELECT unnest(string_split_regex(
                    array_to_string(
                        list_transform(
                            string_split(trim({text_col}), ' '),
                            w -> CASE WHEN w IN ({stoplist})
                                 THEN '|' ELSE w END),
                        ' '),
                    ' *\\| *')) AS p
                FROM ({docs_sql}) d WHERE {text_col} IS NOT NULL
            )
            WHERE trim(p) <> ''
              AND len(string_split(trim(p), ' ')) <= {max_len}
        ),
        rk_pw AS (
            SELECT phrase,
                   CAST(len(string_split(phrase, ' ')) AS BIGINT)
                       AS n_words,
                   unnest(string_split(phrase, ' ')) AS word
            FROM rk_ph
        ),
        rk_st AS (
            SELECT word,
                   CAST(SUM(n_words) AS BIGINT) * {_SCALE}
                       // CAST(COUNT(*) AS BIGINT) AS wscore
            FROM rk_pw GROUP BY word
        ),
        rk_sc AS (
            SELECT phrase,
                   CAST(SUM(wscore) AS BIGINT) AS tot,
                   CAST(COUNT(*) AS BIGINT) AS nw
            FROM rk_pw JOIN rk_st USING (word)
            GROUP BY phrase
        )
        SELECT phrase,
               CAST(nw // len(string_split(phrase, ' ')) AS BIGINT)
                   AS n_occ,
               CAST(len(string_split(phrase, ' ')) AS BIGINT)
                   AS n_words,
               CAST(tot // (nw // len(string_split(phrase, ' ')))
                   AS BIGINT) AS score_fp
        FROM rk_sc
        ORDER BY score_fp DESC, phrase
        LIMIT {k}
    """
