"""Directed link-graph hygiene: reciprocity + degree CCDF.

Two one-pass diagnostics of a directed host/link graph:

**Reciprocity** (Newman 2002; Garlaschelli 2004): the share of
directed edges whose reverse also exists — r near the random-graph
baseline means links are citations, r high means handshakes (link
exchanges, mirror rings — the same spam shape mirrors.py finds by
content, detected structurally).

**Degree CCDF at powers of two**: #nodes with out-degree >= 2^j for
j = 0..max_pow — the heavy-tail diagnostic read straight off exact
counts. The classic check is a log-log CCDF slope; the LOG-FREE
version keeps the engine's no-transcendentals discipline: powers of
two ARE the log-x axis (doubling buckets), the counts stay exact
BIGINTs, and a power law shows as near-constant ratio between
consecutive rows — a downstream eyeball or cross-multiplication,
never a float fit inside the engine.

Exactness: dedup to the DISTINCT edge set first (multi-edges are
crawl artifacts, the statistics are about structure); self-loops
counted separately and excluded from both statistics (a self-link
is trivially "reciprocated" and inflates r). Every count is an
exact BIGINT; each share is ONE trailing IEEE division, NULL on an
empty graph via integer CASE.

Scale shape: ONE distinct on the uniform (src, dst) key; reciprocity
via ONE left-semi self-join on the swapped key (never a full join —
only membership is needed); degrees via ONE hash-agg; the CCDF
thresholds are a JVM-side spark.range cross of the tie-collapsed
degree-count grain (gini's trick — the threshold table is
max_pow+1 rows, the degree grain <= max-degree rows, never the node
table).

The DuckDB twin is the INDEPENDENT plan: reciprocity via EXISTS
(correlated semi-join in predicate form), CCDF via a direct
degree >= threshold join on generate_series.

No reference counterpart (specvital/core has no graph subsystem);
the statistics are the published formulations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from core_spark.plans.materialize import pin

# identical final projection texts on both engines
_R_FINAL = (
    "CAST(n_edges AS BIGINT) AS n_edges",
    "CAST(n_recip AS BIGINT) AS n_recip",
    "CAST(n_self AS BIGINT) AS n_self",
    "CASE WHEN n_edges <> 0 THEN"
    " CAST(n_recip AS DOUBLE) / CAST(n_edges AS DOUBLE)"
    " END AS reciprocity",
)
_C_FINAL = (
    "CAST(threshold AS BIGINT) AS threshold",
    "CAST(n_nodes AS BIGINT) AS n_nodes",
    "CAST(n_ge AS BIGINT) AS n_ge",
    "CASE WHEN n_nodes <> 0 THEN"
    " CAST(n_ge AS DOUBLE) / CAST(n_nodes AS DOUBLE)"
    " END AS ccdf",
)


def _edges(links: DataFrame, src: str, dst: str) -> DataFrame:
    return pin(
        links.selectExpr(f"{src} AS src", f"{dst} AS dst")
        .where("src IS NOT NULL AND dst IS NOT NULL")
        .distinct()
    )


def reciprocity(
    links: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """One row (n_edges, n_recip, n_self, reciprocity) over the
    DISTINCT directed edge set; self-loops counted apart and
    excluded from the ratio."""
    e = _edges(links, src, dst)
    plain = e.where("src <> dst")
    swapped = plain.selectExpr("dst AS src", "src AS dst")
    recip = plain.join(swapped, ["src", "dst"], "left_semi")
    counts = (
        plain.agg(F.count("*").cast("long").alias("n_edges"))
        .crossJoin(F.broadcast(
            recip.agg(F.count("*").cast("long").alias("n_recip"))))
        .crossJoin(F.broadcast(
            e.where("src = dst").agg(
                F.count("*").cast("long").alias("n_self"))))
    )
    return counts.selectExpr(*_R_FINAL)


def degree_ccdf(
    links: DataFrame,
    max_pow: int = 20,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(threshold, n_nodes, n_ge, ccdf) for threshold = 2^0..2^max_pow:
    nodes (by out-degree over the distinct non-self edge set) at or
    above each doubling threshold — the log-free heavy-tail
    diagnostic."""
    max_pow = int(max_pow)
    if max_pow < 0 or max_pow > 62:
        raise ValueError(
            f"degree_ccdf: max_pow must be in [0, 62], got {max_pow}")
    e = _edges(links, src, dst).where("src <> dst")
    deg = e.groupBy("src").agg(F.count("*").cast("long").alias("d"))
    # tie-collapsed degree-count grain (gini's trick): tiny
    byd = deg.groupBy("d").agg(F.count("*").cast("long").alias("m"))
    thresholds = links.sparkSession.range(max_pow + 1).selectExpr(
        "SHIFTLEFT(CAST(1 AS BIGINT), CAST(id AS INT)) AS threshold")
    joined = (
        thresholds.crossJoin(byd)
        .selectExpr(
            "threshold",
            "m",
            "CASE WHEN d >= threshold THEN m ELSE 0L END AS ge",
        )
        .groupBy("threshold")
        .agg(
            F.expr("CAST(SUM(m) AS BIGINT)").alias("n_nodes"),
            F.expr("CAST(SUM(ge) AS BIGINT)").alias("n_ge"),
        )
    )
    # an empty graph yields no byd rows: densify from the threshold
    # table so every threshold reports a row
    dense = thresholds.join(joined, "threshold", "left").selectExpr(
        "threshold",
        "COALESCE(n_nodes, 0L) AS n_nodes",
        "COALESCE(n_ge, 0L) AS n_ge",
    )
    return dense.selectExpr(*_C_FINAL)


def sql_reciprocity(
    links_sql: str, src: str = "src", dst: str = "dst"
) -> str:
    """DuckDB twin: EXISTS-predicate semi-join (no explicit join);
    same final projection text."""
    return f"""
        WITH e AS (
          SELECT DISTINCT {src} AS src, {dst} AS dst
          FROM ({links_sql}) s
          WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
        ),
        plain AS (SELECT * FROM e WHERE src <> dst),
        agg AS (
          SELECT
            (SELECT CAST(COUNT(*) AS BIGINT) FROM plain) AS n_edges,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM plain p
             WHERE EXISTS (SELECT 1 FROM plain q
                           WHERE q.src = p.dst AND q.dst = p.src))
              AS n_recip,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM e WHERE src = dst)
              AS n_self
        )
        SELECT {", ".join(_R_FINAL)} FROM agg
    """


def sql_degree_ccdf(
    links_sql: str,
    max_pow: int = 20,
    src: str = "src",
    dst: str = "dst",
) -> str:
    """DuckDB twin: direct degree >= threshold join on
    generate_series (no tie-collapsed grain); same final projection
    text."""
    max_pow = int(max_pow)
    return f"""
        WITH e AS (
          SELECT DISTINCT {src} AS src, {dst} AS dst
          FROM ({links_sql}) s
          WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
            AND {src} <> {dst}
        ),
        deg AS (
          SELECT src, CAST(COUNT(*) AS BIGINT) AS d
          FROM e GROUP BY src
        ),
        th AS (
          SELECT CAST(1 AS BIGINT) << x AS threshold
          FROM generate_series(0, {max_pow}) t(x)
        ),
        agg AS (
          SELECT th.threshold,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
                 CAST(COALESCE(SUM(CASE WHEN deg.d >= th.threshold
                                        THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_ge
          FROM th LEFT JOIN deg ON TRUE
          GROUP BY th.threshold
        )
        SELECT {", ".join(_C_FINAL)} FROM agg
    """
