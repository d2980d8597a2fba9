"""DSIR-style importance reweighting (Xie et al. 2023, NeurIPS —
"Data Selection for Language Models via Importance Resampling"),
integer-exact oracled variant.

DSIR scores every raw document by how much its hashed-n-gram feature
profile looks like a TARGET corpus (e.g. Wikipedia-quality pages)
relative to the RAW crawl distribution, then resamples by that weight.
The published treatment: unigram+bigram features hashed into B buckets,
two bag-of-words models p (target) and q (raw), per-doc log-weight
``Σ_f count_f · (log p_f − log q_f)``, Gumbel-noise resampling.

The Spark-native, oracle-portable core keeps the exact two-model shape
with integer arithmetic in place of the float log-ratio (the lmscore.py
precedent — rarity SCALE DIV count standing in for −log p):

  per bucket  s_f    = (SCALE · (t_f + 1)) DIV (r_f + 1)
                       (add-1 smoothed target/raw likelihood ratio in
                       fixed point: SCALE = neutral, >SCALE target-like)
  per doc     weight = (Σ over the doc's bucket OCCURRENCES of s_f)
                       DIV max(n_feat, 1)   — the mean ratio, length-
                       comparable; docs with no features get weight 0.

The float ``Σ c_f (log(t_f+1)−log(r_f+1))`` variant is the documented
at-scale path when cross-engine bit-identity is not required; the
integer mean-ratio is monotone in each bucket's likelihood ratio and
portable by construction (every division is Spark DIV == DuckDB `//`).
Published DSIR resamples with Gumbel noise proportional to the weight;
the deterministic analog here is threshold / top-share selection on the
weight column (``sampling.py`` quota machinery composes for top-N).

100-TB shape (mirrors lmscore): both models are bounded aggregates —
the score table is ≤ n_buckets rows however big the corpus — built from
one explode + uniform-key hash-agg each (target docs; an md5-gated raw
sample). Scoring is one explode + BROADCAST join against the score
table + per-doc re-agg whose shuffle carries only partial sums. Zero
Python anywhere; the raw scan is read twice (fit + score) — the
documented lmscore trade.

No reference counterpart (specvital/core has no corpus subsystem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from core_spark.operators.sampling import SCALE, _hash_expr


def bigram_bucket_steps(
    text_col: str, n_buckets: int, dialect: str = "spark"
) -> list[tuple[str, str]]:
    """Stepwise (col, sql_expr) producing ``_feats``: the ordered list of
    hashed word-bigram bucket ids of ``text_col`` (md5 % n_buckets,
    portable 60-bit recipe). Empty list for NULL / single-token text on
    both engines. Tokenization is the suite-wide whitespace split."""
    if dialect == "spark":
        toks = f"split(trim({text_col}), ' ')"
        bg = (
            "concat(element_at(_toks, i), ' ', element_at(_toks, i + 1))"
        )
        bucket = (
            f"CAST(conv(substr(md5(concat('ds_', {bg})), 1, 15), 16, 10)"
            f" AS BIGINT) % {n_buckets}"
        )
        return [
            ("_toks", toks),
            (
                "_feats",
                "transform(filter(sequence(1, greatest(size(_toks), 1)),"
                f" i -> i + 1 <= size(_toks)), i -> {bucket})",
            ),
        ]
    toks = f"string_split(trim({text_col}), ' ')"
    bg = "concat(list_extract(_toks, i), ' ', list_extract(_toks, i + 1))"
    bucket = (
        f"('0x' || substr(md5(concat('ds_', {bg})), 1, 15))::BIGINT"
        f" % {n_buckets}"
    )
    return [
        ("_toks", toks),
        (
            "_feats",
            "list_transform(list_filter("
            "generate_series(1, greatest(len(_toks), 1)),"
            f" i -> i + 1 <= len(_toks)), i -> {bucket})",
        ),
    ]


def _with_feats(df: DataFrame, text_col: str, n_buckets: int) -> DataFrame:
    for name, expr in bigram_bucket_steps(text_col, n_buckets, "spark"):
        df = df.withColumn(name, F.expr(expr))
    return df


def bucket_scores(
    df: DataFrame,
    target_pred: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    raw_rate: float = 0.5,
    salt: str = ":dsirraw",
) -> DataFrame:
    """(bucket, s): the add-1-smoothed fixed-point target/raw likelihood
    ratio per feature bucket. ``target_pred`` is a SQL boolean over the
    input columns selecting the TARGET corpus; the raw model uses the
    md5-gated deterministic sample (rate ``raw_rate``) of ALL docs.
    Bounded output: one row per bucket seen in either model."""
    feats = _with_feats(df, text_col, n_buckets)
    thresh = int(round(raw_rate * SCALE))
    tgt = (
        feats.where(target_pred)
        .select(F.explode("_feats").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("t"))
    )
    raw = (
        feats.where(f"{_hash_expr(id_col, salt, 'spark')} < {thresh}")
        .select(F.explode("_feats").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("r"))
    )
    return (
        tgt.join(raw, "bucket", "full_outer")
        .selectExpr(
            "bucket",
            f"({SCALE} * (coalesce(t, 0) + 1))"
            " DIV (coalesce(r, 0) + 1) AS s",
        )
    )


def importance_weights(
    df: DataFrame,
    target_pred: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    raw_rate: float = 0.5,
    salt: str = ":dsirraw",
) -> DataFrame:
    """(id, n_feat, weight): per-doc mean fixed-point likelihood ratio.

    weight > SCALE ⇔ the doc's features are on average more target-like
    than raw-like. Buckets absent from BOTH models score the neutral
    SCALE. Feature-less docs (≤ 1 token) get weight 0 (documented)."""
    scores = bucket_scores(
        df, target_pred, text_col, id_col, n_buckets, raw_rate, salt
    )
    occ = _with_feats(df, text_col, n_buckets).select(
        id_col, F.explode_outer("_feats").alias("bucket")
    )
    joined = occ.join(F.broadcast(scores), "bucket", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("bucket").alias("n_feat"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("bucket").isNotNull(),
                        F.coalesce(F.col("s"), F.lit(SCALE)),
                    )
                ),
                F.lit(0),
            ).alias("_wsum"),
        )
        .selectExpr(
            id_col,
            "n_feat",
            "_wsum DIV greatest(n_feat, 1) AS weight",
        )
    )


def sql_importance_weights(
    docs_table: str,
    target_pred: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    raw_rate: float = 0.5,
    salt: str = ":dsirraw",
) -> str:
    """DuckDB twin: same feature emission, same two bounded models, same
    fixed-point ratio and per-doc mean; LEFT-JOIN reassembly keeps
    feature-less docs with zeros (the lmscore twin convention). Every
    compared column is BIGINT (DuckDB SUM is HUGEINT — cast)."""
    thresh = int(round(raw_rate * SCALE))
    steps = bigram_bucket_steps(text_col, n_buckets, "duckdb")
    inner = f"SELECT * FROM {docs_table}"
    for name, expr in steps:
        inner = f"SELECT *, {expr} AS {name} FROM ({inner})"
    return f"""
WITH feats AS ({inner}),
tgt AS (
  SELECT bucket, COUNT(*) AS t
  FROM (SELECT unnest(_feats) AS bucket FROM feats WHERE {target_pred})
  GROUP BY bucket
),
raw AS (
  SELECT bucket, COUNT(*) AS r
  FROM (SELECT unnest(_feats) AS bucket FROM feats
        WHERE {_hash_expr(id_col, salt, 'duckdb')} < {thresh})
  GROUP BY bucket
),
scores AS (
  SELECT bucket,
         ({SCALE} * (COALESCE(t, 0) + 1)) // (COALESCE(r, 0) + 1) AS s
  FROM tgt FULL OUTER JOIN raw USING (bucket)
),
occ AS (
  SELECT {id_col}, unnest(_feats) AS bucket FROM feats
),
agg AS (
  SELECT o.{id_col},
         COUNT(*) AS n_feat,
         CAST(COALESCE(SUM(COALESCE(s.s, {SCALE})), 0) AS BIGINT) AS wsum
  FROM occ o LEFT JOIN scores s USING (bucket)
  GROUP BY o.{id_col}
)
SELECT d.{id_col},
       COALESCE(a.n_feat, 0) AS n_feat,
       COALESCE(a.wsum, 0) // greatest(COALESCE(a.n_feat, 0), 1) AS weight
FROM {docs_table} d LEFT JOIN agg a USING ({id_col})
"""
