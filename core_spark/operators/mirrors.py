"""Mirror-host detection: which host PAIRS share near-duplicate docs.

Doc-level near-dup machinery answers "is this page a copy"; the
curation decision at crawl scale is one level up: host B is a MIRROR
or scraper of host A when MANY of its pages are near-copies of A's —
the RefinedWeb/CCNet-style site-level signal that lets a pipeline
drop a whole host instead of fighting its pages one by one. This
operator rolls verified cross-host near-dup pairs into a host-pair
evidence matrix with a mirror flag.

Plan shape — LSH proposes, exact integer math disposes, hosts roll
up: ``minhash_lsh_pairs`` generates candidates (banded equi-join on
uniform band keys, the audited dedup plan); the verify stage
recomputes word-k-gram Jaccard ONLY for candidates over the shared
60-bit hashed-shingle sets, with the threshold as the pure BIGINT
cross-multiplication ``|∩|·den >= num·|∪|`` (dedup.py's verify uses
an IEEE ratio column; here nothing floating exists because only the
verdict is needed); the host rollup joins the tiny doc→host
projection TWICE (pinned once, CLAUDE.md multi-consumer rule),
normalizes the pair with least/greatest so (A,B) and (B,A) evidence
lands in one row, drops same-host pairs (within-host duplication is
paradedup/url_latest territory), and one uniform hash-agg counts the
evidence. ``min_pairs`` flags mirrors.

The DuckDB twin nests the INDEPENDENT emitters end to end (the
minhash twin's signature arithmetic + list-intersect verify + the
rollup) so the CHAIN is gated, not just the pieces — the
crawl_pipeline convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from core_spark.operators.dedup import (
    duck_hashed_shingles,
    minhash_lsh_pairs,
    spark_hashed_shingles,
    sql_minhash_lsh_pairs,
)
from core_spark.plans.materialize import pin


def mirror_hosts(
    docs: DataFrame,
    min_pairs: int = 3,
    k: int = 3,
    n_perm: int = 12,
    bands: int = 4,
    t_num: int = 4,
    t_den: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    host_col: str = "host",
) -> DataFrame:
    """(host_a, host_b, n_dup_pairs, mirror) with host_a < host_b;
    ``mirror`` = 1 when at least ``min_pairs`` verified cross-host
    near-dup pairs (Jaccard >= t_num/t_den) connect the two hosts."""
    m = int(min_pairs)
    if m < 1:
        raise ValueError(f"min_pairs must be >= 1, got {min_pairs}")
    if not (0 < t_num <= t_den):
        raise ValueError(f"threshold must be in (0, 1]: {t_num}/{t_den}")
    cand = minhash_lsh_pairs(docs, text_col=text_col, id_col=id_col,
                             k=k, n_perm=n_perm, bands=bands)
    sh = pin(docs.select(
        F.col(id_col),
        F.expr(spark_hashed_shingles(text_col, k)).alias("_sh"),
    ))
    verified = (
        cand.join(sh.selectExpr(f"{id_col} AS id_a", "_sh AS _sha"), "id_a")
        .join(sh.selectExpr(f"{id_col} AS id_b", "_sh AS _shb"), "id_b")
        .where(
            f"size(array_intersect(_sha, _shb)) * {int(t_den)}"
            f" >= {int(t_num)} * size(array_union(_sha, _shb))"
            " AND size(array_union(_sha, _shb)) > 0"
        )
        .select("id_a", "id_b")
    )
    hosts = pin(docs.selectExpr(f"{id_col} AS _hid", f"{host_col} AS _h"))
    return (
        verified
        .join(hosts.selectExpr("_hid AS id_a", "_h AS _ha"), "id_a")
        .join(hosts.selectExpr("_hid AS id_b", "_h AS _hb"), "id_b")
        .where("_ha != _hb")
        .selectExpr("least(_ha, _hb) AS host_a",
                    "greatest(_ha, _hb) AS host_b")
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dup_pairs"))
        .selectExpr(
            "host_a", "host_b", "n_dup_pairs",
            f"CAST(n_dup_pairs >= {m} AS INT) AS mirror",
        )
    )


def sql_mirror_hosts(
    docs_table: str,
    min_pairs: int = 3,
    k: int = 3,
    n_perm: int = 12,
    bands: int = 4,
    t_num: int = 4,
    t_den: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    host_col: str = "host",
) -> str:
    """DuckDB twin: the minhash twin's candidates + list-intersect
    verify + rollup, nested in one WITH — the chain is gated."""
    m = int(min_pairs)
    cand = sql_minhash_lsh_pairs(docs_table, text_col=text_col,
                                 id_col=id_col, k=k, n_perm=n_perm,
                                 bands=bands)
    return f"""
        WITH cand AS ({cand}),
        shs AS (
          SELECT {id_col} AS _hid,
                 {duck_hashed_shingles(text_col, k)} AS _sh,
                 {host_col} AS _h
          FROM {docs_table}
        ),
        verified AS (
          SELECT c.id_a, c.id_b
          FROM cand c
          JOIN shs a ON a._hid = c.id_a
          JOIN shs b ON b._hid = c.id_b
          WHERE len(list_intersect(a._sh, b._sh)) * {int(t_den)}
                  >= {int(t_num)} * (len(a._sh) + len(b._sh)
                     - len(list_intersect(a._sh, b._sh)))
            AND (len(a._sh) + len(b._sh)
                 - len(list_intersect(a._sh, b._sh))) > 0
        ),
        crossed AS (
          SELECT LEAST(ha._h, hb._h) AS host_a,
                 GREATEST(ha._h, hb._h) AS host_b
          FROM verified v
          JOIN shs ha ON ha._hid = v.id_a
          JOIN shs hb ON hb._hid = v.id_b
          WHERE ha._h != hb._h
        )
        SELECT host_a, host_b,
               CAST(COUNT(*) AS BIGINT) AS n_dup_pairs,
               CAST(COUNT(*) >= {m} AS INT) AS mirror
        FROM crossed
        GROUP BY host_a, host_b
    """
