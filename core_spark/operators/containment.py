"""Asymmetric containment join: find docs mostly CONTAINED in another.

Jaccard dedup misses the quote/inclusion shape: a paragraph lifted into a
10x-longer page has tiny Jaccard but containment ~1.0. This operator
emits DIRECTED pairs (id_a, id_b) with

    containment(A in B) = |S_A ∩ S_B| / |S_A|  >=  threshold

over word-k-gram sets (the same 60-bit hashed shingles the Jaccard
family uses — ``dedup.spark_hashed_shingles``). Training-data uses:
quote detection, syndication/wrapper-page discovery, and the
contained-side removal policy (drop A, keep the superset B).

Plan — the AllPairs prefix adaptation for overlap joins (the filters
prune, never answer; exact verify decides):

  1. one postings table with per-doc positions in GLOBAL rarity order
     (df asc, hash asc) — built once, pinned (it feeds both join sides);
  2. the PROBE side (A) keeps only its prefix: |A| - ceil(t*|A|) + 1
     rarest shingles — a true pair's required overlap ceil(t*|A|) cannot
     hide entirely in A's suffix, so some prefix shingle must collide.
     The INDEXED side (B) cannot be prefix-pruned (any of its shingles
     may be the collision) and posts its full set — but the join touches
     only B's postings for A-PREFIX shingles, which are globally rare by
     construction, so matched posting lists stay short;
  3. size filter |B| >= t*|A| (B must at least hold the overlap; there
     is NO upper size bound — that asymmetry is the whole point);
  4. positional filter at the collision (p in A's order, q in B's):
     remaining possible overlap 1 + min(|A|-p, |B|-q) must reach t*|A|
     (shared shingles appear in the same relative order on both sides);
  5. exact verify on the full hashed sets (JVM array_intersect);
     containment emitted as int/int double division — identical IEEE
     result in Spark and DuckDB (the dedup.py oracle precedent).

Docs with fewer than k tokens degrade to a single whole-text shingle
(the dedup-family convention — sets are never empty, so containment is
always defined; the size>0 guard is belt-and-braces). Pairs are DIRECTED:
A-in-B and B-in-A are separate rows and only the qualifying direction
is emitted. Run exact_dedup first at scale: byte-identical docs are
mutual 1.0-containment pairs and belong to the cheaper operator.

At 100 TB the shuffle is hash(shingle) over the postings tables —
uniform md5-derived keys; the B-side's frequent-shingle posting lists
never meet the join (A prefixes are rare-first), and the candidate
volume is bounded by sum over A-prefix shingles of |posting list|, the
published AllPairs bound. No reference counterpart; the algorithm
follows Bayardo et al. 2007 (AllPairs) and Xiao et al. 2008 (PPJoin)
adapted to the overlap/containment predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from core_spark.operators.dedup import spark_hashed_shingles
from core_spark.plans.materialize import pin


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Directed pairs (id_a, id_b, inter, sz_a, containment) with
    containment(A in B) >= threshold. See module docstring."""
    sets = pin(
        df.select(
            F.col(id_col),
            F.expr(spark_hashed_shingles(text_col, k)).alias("_shs"),
        ).filter(F.size("_shs") > 0)
    )

    sh = sets.select(
        F.col(id_col), F.size("_shs").alias("sz"), F.explode("_shs").alias("h")
    )
    dfreq = sh.groupBy("h").agg(F.count("*").alias("df_"))
    w = Window.partitionBy(id_col).orderBy(F.col("df_").asc(), F.col("h").asc())
    post = pin(
        sh.join(dfreq, "h")
        .withColumn("p", F.row_number().over(w))
        .select(id_col, "sz", "h", "p")
    )
    probe = post.filter(
        F.col("p")
        <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + F.lit(1)
    )

    a, b = probe.alias("a"), post.alias("b")
    need = F.lit(threshold) * F.col("a.sz")  # required overlap (as double)
    cand = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
            & (F.col("b.sz") >= need)
            & (
                F.lit(1)
                + F.least(
                    F.col("a.sz") - F.col("a.p"), F.col("b.sz") - F.col("b.p")
                )
                >= need
            ),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )

    sa = sets.select(
        F.col(id_col).alias("id_a"), F.col("_shs").alias("_sa")
    )
    sb = sets.select(
        F.col(id_col).alias("id_b"), F.col("_shs").alias("_sb")
    )
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("_sa", "_sb")).cast("long").alias("inter"),
            F.size("_sa").cast("long").alias("sz_a"),
        )
        .filter(F.col("inter") >= F.lit(threshold) * F.col("sz_a"))
        .withColumn("containment", F.col("inter") / F.col("sz_a"))
    )


def sql_containment_pairs(
    docs_table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
) -> str:
    """DuckDB oracle — deliberately the INDEPENDENT brute-force plan
    (all directed pairs, no prefix/size/positional pruning), over the
    same md5-hashed shingle sets; proves the filters prune candidates
    only, never answers."""
    from core_spark.operators.dedup import duck_hashed_shingles

    return f"""
        WITH sets AS (
          SELECT {id_col} AS id, {duck_hashed_shingles(text_col, k)} AS shs
          FROM {docs_table}
        ), ne AS (
          SELECT id, list_distinct(shs) AS shs FROM sets WHERE len(shs) > 0
        )
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(len(list_intersect(a.shs, b.shs)) AS BIGINT) AS inter,
               CAST(len(a.shs) AS BIGINT) AS sz_a,
               len(list_intersect(a.shs, b.shs)) / len(a.shs) AS containment
        FROM ne a JOIN ne b ON a.id <> b.id
        WHERE len(list_intersect(a.shs, b.shs)) >= {threshold} * len(a.shs)
    """
