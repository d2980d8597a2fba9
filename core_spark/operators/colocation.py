"""Colocation participation index: which categories co-occur in space?

The spatial-data-mining primitive (Shekhar & Huang 2001): for every
unordered category pair {A, B}, the participation ratio
pr(A) = |distinct A-instances with a B-neighbor| / |A| and the
participation index PI = min(pr(A), pr(B)) — "gas stations colocate
with highways", or in a web-events setting "which event types fire
at the same places" (click+purchase, scan+exploit). PI is the
support measure that makes colocation mining anti-monotone, so a
downstream Apriori-style miner can prune on it; this operator is the
pair (k = 2) stage every such miner starts from.

Exactness stance: every factor is an EXACT BIGINT count — neighbor
pairs from the AUDITED epsilon-grid kernel (rangejoin.
range_join_pairs: ×9 replication, ONE uniform equi shuffle,
structural single emission), participants via a DISTINCT on the
uniform (cat_lo, cat_hi, member) key, totals via one hash-agg.
pr_a/pr_b/pi are trailing IEEE divisions + one LEAST beside their
exact factors; pi compares two correctly-rounded doubles, which is
deterministic cross-engine. Category pairs with no qualifying
neighbor pair are ABSENT (no-evidence convention); same-category
pairs are excluded by the classic formulation. NULL key/cat/coord
rows are dropped.

Scale shape: the labeled-point table is pinned once (self-join
consumer rule) and joined twice to attach both endpoint labels; the
participant explode is 2 rows per neighbor pair feeding ONE distinct
and ONE hash-agg, all on uniform composite keys; category totals are
a tiny table broadcast onto the result. No window, no collect.

The DuckDB twin is the INDEPENDENT honest O(n²) neighbor plan (no
grid) with the same participation algebra.

No reference counterpart (specvital/core has no spatial subsystem);
the measure is the published Shekhar-Huang formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from core_spark.operators.rangejoin import range_join_pairs
from core_spark.plans.materialize import pin

# identical final projection text on both engines
_FINAL = (
    "cat_a",
    "cat_b",
    "CAST(n_pairs AS BIGINT) AS n_pairs",
    "CAST(part_a AS BIGINT) AS part_a",
    "CAST(part_b AS BIGINT) AS part_b",
    "CAST(n_a AS BIGINT) AS n_a",
    "CAST(n_b AS BIGINT) AS n_b",
    "CAST(part_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pr_a",
    "CAST(part_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pr_b",
    "LEAST(CAST(part_a AS DOUBLE) / CAST(n_a AS DOUBLE),"
    " CAST(part_b AS DOUBLE) / CAST(n_b AS DOUBLE)) AS pi",
)


def colocation_pi(
    points: DataFrame,
    radius: float,
    key: str = "doc_id",
    cat_col: str = "cat",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """(cat_a, cat_b, n_pairs, part_a, part_b, n_a, n_b, pr_a, pr_b,
    pi) for every unordered category pair with at least one
    cross-category neighbor pair within ``radius`` (planar dist² <
    radius²); cat_a < cat_b lexically; pairless category pairs
    absent."""
    if float(radius) <= 0:
        raise ValueError(
            f"colocation_pi: radius must be > 0, got {radius}")
    pts = pin(
        points.where(
            F.col(key).isNotNull()
            & F.col(cat_col).isNotNull()
            & F.col(lat_col).isNotNull()
            & F.col(lon_col).isNotNull())
        .selectExpr(
            f"{key} AS _k", f"{cat_col} AS _c",
            f"{lat_col} AS lat", f"{lon_col} AS lon")
    )
    totals = pts.groupBy(F.col("_c").alias("cat")).agg(
        F.count("*").cast("long").alias("total"))
    pairs = range_join_pairs(pts, radius, key="_k")
    # pinned: three consumers (n_pairs + both union branches) would
    # otherwise re-run the pair kernel and both label joins 3x
    # (CLAUDE.md multi-consumer rule; measured 47s -> ~1/3 at sf0.1)
    labeled = pin(
        pairs
        .join(pts.selectExpr("_k AS a", "_c AS la"), "a")
        .join(pts.selectExpr("_k AS b", "_c AS lb"), "b")
        .where("la <> lb")
        .selectExpr(
            "LEAST(la, lb) AS cat_a", "GREATEST(la, lb) AS cat_b",
            "a", "b", "la", "lb")
    )
    n_pairs = labeled.groupBy("cat_a", "cat_b").agg(
        F.count("*").cast("long").alias("n_pairs"))
    members = (
        labeled.selectExpr(
            "cat_a", "cat_b", "a AS member", "la AS mcat")
        .union(labeled.selectExpr(
            "cat_a", "cat_b", "b AS member", "lb AS mcat"))
        .distinct()
    )
    parts = members.groupBy("cat_a", "cat_b").agg(
        F.expr(
            "CAST(SUM(CASE WHEN mcat = cat_a THEN 1 ELSE 0 END)"
            " AS BIGINT)").alias("part_a"),
        F.expr(
            "CAST(SUM(CASE WHEN mcat = cat_b THEN 1 ELSE 0 END)"
            " AS BIGINT)").alias("part_b"),
    )
    return (
        n_pairs.join(parts, ["cat_a", "cat_b"])
        .join(F.broadcast(totals.selectExpr(
            "cat AS cat_a", "total AS n_a")), "cat_a")
        .join(F.broadcast(totals.selectExpr(
            "cat AS cat_b", "total AS n_b")), "cat_b")
        .selectExpr(*_FINAL)
    )


def sql_colocation_pi(
    points_sql: str,
    radius: float,
    key: str = "doc_id",
    cat_col: str = "cat",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> str:
    """DuckDB twin: honest O(n²) neighbor pairs (no grid) + the same
    participation algebra; same final projection text. ``points_sql``
    must yield (key, cat, lat, lon)."""
    r = float(radius)
    d2 = (
        f"(p.{lat_col} - q.{lat_col}) * (p.{lat_col} - q.{lat_col})"
        f" + (p.{lon_col} - q.{lon_col}) * (p.{lon_col} - q.{lon_col})"
    )
    return f"""
        WITH pts AS (
          SELECT {key} AS k, {cat_col} AS c,
                 {lat_col} AS {lat_col}, {lon_col} AS {lon_col}
          FROM ({points_sql}) s
          WHERE {key} IS NOT NULL AND {cat_col} IS NOT NULL
            AND {lat_col} IS NOT NULL AND {lon_col} IS NOT NULL
        ),
        labeled AS (
          SELECT LEAST(p.c, q.c) AS cat_a, GREATEST(p.c, q.c) AS cat_b,
                 p.k AS a, q.k AS b, p.c AS la, q.c AS lb
          FROM pts p, pts q
          WHERE p.k < q.k AND p.c <> q.c AND {d2} < {r * r!r}
        ),
        np AS (
          SELECT cat_a, cat_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
          FROM labeled GROUP BY 1, 2
        ),
        members AS (
          SELECT DISTINCT cat_a, cat_b, member, mcat FROM (
            SELECT cat_a, cat_b, a AS member, la AS mcat FROM labeled
            UNION ALL
            SELECT cat_a, cat_b, b AS member, lb AS mcat FROM labeled
          ) u
        ),
        parts AS (
          SELECT cat_a, cat_b,
                 CAST(SUM(CASE WHEN mcat = cat_a THEN 1 ELSE 0 END)
                   AS BIGINT) AS part_a,
                 CAST(SUM(CASE WHEN mcat = cat_b THEN 1 ELSE 0 END)
                   AS BIGINT) AS part_b
          FROM members GROUP BY 1, 2
        ),
        totals AS (
          SELECT c AS cat, CAST(COUNT(*) AS BIGINT) AS total
          FROM pts GROUP BY c
        )
        SELECT {", ".join(_FINAL)} FROM (
          SELECT np.cat_a, np.cat_b, np.n_pairs,
                 parts.part_a, parts.part_b,
                 ta.total AS n_a, tb.total AS n_b
          FROM np
          JOIN parts USING (cat_a, cat_b)
          JOIN totals ta ON ta.cat = np.cat_a
          JOIN totals tb ON tb.cat = np.cat_b
        ) t
    """
