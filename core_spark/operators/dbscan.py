"""DBSCAN density clustering, distributed and deterministic.

The classic spatial clustering algorithm (Ester et al. 1996), composed
from this engine's own scale primitives — no new join shapes:

1. neighbor pairs within ``eps`` come from the epsilon-grid range join
   (``rangejoin.range_join_pairs``: ×9 replication, ONE equi shuffle,
   never a cartesian; strict ``dist² < eps²``, planar over
   equirectangular lon/lat — both conventions inherited and documented
   there);
2. a point is CORE when its eps-neighborhood (including itself) holds
   at least ``min_pts`` points — one degree count over the pair table;
3. clusters are the connected components of the core-core subgraph —
   ``dedup.connected_components`` (Kiveris large/small-star, O(log n)
   rounds); the cluster id is the MINIMUM core id in the component,
   so ids are stable across runs and partitionings;
4. non-core points with at least one core eps-neighbor are BORDER
   points. Textbook DBSCAN assigns a border point to whichever core
   reached it first — scan-order-dependent and therefore
   irreproducible; this implementation uses the standard parallel-DBSCAN
   determinization (e.g. MR-DBSCAN): a border point joins the MINIMUM
   cluster id among its core neighbors. Everything else is NOISE.

Output: (key, role ∈ core|border|noise, cluster) with cluster NULL for
noise. A core point with no core neighbor is a singleton cluster of
itself (min_pts counts border neighbors too, so this is reachable).

100-TB shape: the pair table is the range join's output (uniform grid
keys; AQE splits dense-city mega-buckets); the degree count and border
argmin are hash-aggs on uniform point ids; CC is the audited log-round
loop. The pair table feeds three consumers (degree, core-core edges,
border assignment) and is pinned once — the CLAUDE.md multi-consumer
rule. No Python anywhere.

Oracle note: every stage is SQL-expressible — the DuckDB twin uses the
honest O(n²) brute-force pair plan plus a recursive-CTE min-label
closure, a genuinely INDEPENDENT algorithm (label propagation, not
star contraction), feasible at fixture scale.

No reference counterpart (specvital/core has no spatial subsystem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from core_spark.operators.dedup import connected_components
from core_spark.operators.rangejoin import range_join_pairs
from core_spark.plans.materialize import pin


def dbscan(
    df: DataFrame,
    eps: float,
    min_pts: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
    key: str = "doc_id",
) -> DataFrame:
    """(key, role, cluster): deterministic DBSCAN over planar lon/lat."""
    if min_pts < 1:
        raise ValueError(f"dbscan: min_pts must be >= 1, got {min_pts}")
    pts = pin(df.select(key))
    pairs = pin(
        range_join_pairs(df, eps, lat_col=lat_col, lon_col=lon_col, key=key)
        .select("a", "b")
    )
    sym = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    # degree: eps-neighbors EXCLUDING self; core when degree+1 >= min_pts
    deg = sym.groupBy("a").agg(F.count("*").alias("_deg"))
    core = pin(
        pts.join(deg, pts[key] == deg.a, "left")
        .where(F.coalesce(F.col("_deg"), F.lit(0)) + 1 >= min_pts)
        .select(F.col(key).alias("_cid"))
    )
    # core-core subgraph -> components (cluster = min core id reachable)
    cc_edges = (
        pairs.join(core.withColumnRenamed("_cid", "a"), "a", "left_semi")
        .join(core.withColumnRenamed("_cid", "b"), "b", "left_semi")
    )
    comp = connected_components(cc_edges, id_a="a", id_b="b")
    core_lab = pin(
        core.join(comp, core._cid == comp.node, "left")
        .select(
            F.col("_cid"),
            F.coalesce(F.col("component"), F.col("_cid")).alias("cluster"),
        )
    )
    # border: non-core with a core neighbor -> min core-cluster id
    border = (
        sym.join(core.withColumnRenamed("_cid", "a"), "a", "left_anti")
        .join(
            core_lab.withColumnRenamed("_cid", "b"), "b"
        )
        .groupBy("a")
        .agg(F.min("cluster").alias("_bcluster"))
    )
    return (
        pts.join(
            core_lab, pts[key] == core_lab._cid, "left"
        )
        .join(border, pts[key] == border.a, "left")
        .select(
            F.col(key),
            F.when(F.col("_cid").isNotNull(), F.lit("core"))
            .when(F.col("_bcluster").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce(F.col("cluster"), F.col("_bcluster")).alias("cluster"),
        )
    )


def sql_dbscan(
    points_sql: str,
    eps: float,
    min_pts: int,
    key: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> str:
    """DuckDB twin: brute-force O(n²) pairs + recursive min-label closure
    — an independent plan (label propagation, not star contraction)."""
    if min_pts < 1:
        raise ValueError(f"dbscan: min_pts must be >= 1, got {min_pts}")
    r2 = float(eps) * float(eps)
    d2 = (
        f"(p.{lat_col} - q.{lat_col}) * (p.{lat_col} - q.{lat_col})"
        f" + (p.{lon_col} - q.{lon_col}) * (p.{lon_col} - q.{lon_col})"
    )
    return f"""
        WITH RECURSIVE pts AS ({points_sql}),
        sym AS (
          SELECT p.{key} AS a, q.{key} AS b
          FROM pts p, pts q
          WHERE p.{key} <> q.{key} AND {d2} < {r2!r}
        ),
        core AS (
          SELECT p.{key} AS id FROM pts p
          LEFT JOIN (SELECT a, COUNT(*) AS deg FROM sym GROUP BY a) d
            ON d.a = p.{key}
          WHERE COALESCE(d.deg, 0) + 1 >= {min_pts}
        ),
        cc_sym AS (
          SELECT s.a, s.b FROM sym s
          JOIN core ca ON ca.id = s.a
          JOIN core cb ON cb.id = s.b
        ),
        lab AS (
          SELECT id AS node, id AS comp FROM core
          UNION
          SELECT e.b, l.comp FROM lab l JOIN cc_sym e ON e.a = l.node
        ),
        comp AS (
          SELECT node, MIN(comp) AS cluster FROM lab GROUP BY node
        ),
        border AS (
          SELECT s.a AS id, MIN(c.cluster) AS cluster
          FROM sym s
          JOIN comp c ON c.node = s.b
          WHERE s.a NOT IN (SELECT id FROM core)
          GROUP BY s.a
        )
        SELECT p.{key} AS {key},
               CASE WHEN cm.node IS NOT NULL THEN 'core'
                    WHEN b.id IS NOT NULL THEN 'border'
                    ELSE 'noise' END AS role,
               COALESCE(cm.cluster, b.cluster) AS cluster
        FROM pts p
        LEFT JOIN comp cm ON cm.node = p.{key}
        LEFT JOIN border b ON b.id = p.{key}
    """
