"""Confusion matrix with per-cell precision/recall contributions.

The classifier-evaluation primitive: over (truth, prediction) pairs,
the contingency matrix plus the marginals that turn it into metrics
— diagonal cells carry each class's recall (n / truth_total) and
precision (n / pred_total); off-diagonal cells name exactly which
confusion costs what. In this engine it is how the heuristic
classifiers audit themselves against labels (langid vs the lang
column, framework_detect vs planted frameworks, quality gates vs
curation outcomes) — evaluation as a first-class, oracle-gated
query rather than a notebook afterthought.

All-integer counts: cell and marginal totals are exact BIGINT from
one hash-agg + two broadcast marginal joins; the two contribution
columns are single trailing IEEE divisions beside their exact
factors (marginals are nonzero by construction — a cell exists only
with n >= 1). Empty cells are ABSENT (sparse matrix semantics);
NULL truth or prediction rows are dropped (no-evidence — callers
wanting a NULL class label it upstream).

Scale shape: ONE uniform hash-agg on (truth, pred) eats the row
stream; the marginal tables are class-cardinality-sized and
broadcast. No window, no collect.

The DuckDB twin is the INDEPENDENT window plan: marginals as SUM()
OVER partitions of the cell table instead of join-backs.

No reference counterpart (specvital/core has no evaluation
subsystem); the construct is the standard contingency matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# identical final projection text on both engines
_FINAL = (
    "truth",
    "pred",
    "CAST(n AS BIGINT) AS n",
    "CAST(truth_total AS BIGINT) AS truth_total",
    "CAST(pred_total AS BIGINT) AS pred_total",
    "CASE WHEN truth = pred THEN 1 ELSE 0 END AS is_diag",
    "CAST(n AS DOUBLE) / CAST(truth_total AS DOUBLE) AS recall_part",
    "CAST(n AS DOUBLE) / CAST(pred_total AS DOUBLE) AS precision_part",
)


def confusion_matrix(
    pairs: DataFrame, truth_col: str = "truth", pred_col: str = "pred"
) -> DataFrame:
    """(truth, pred, n, truth_total, pred_total, is_diag, recall_part,
    precision_part) for every populated cell of the contingency
    matrix; diagonal rows carry the class recall/precision."""
    cells = (
        pairs.where(
            F.col(truth_col).isNotNull() & F.col(pred_col).isNotNull())
        .groupBy(
            F.col(truth_col).alias("truth"), F.col(pred_col).alias("pred"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    tt = cells.groupBy("truth").agg(
        F.sum("n").cast("long").alias("truth_total"))
    pt = cells.groupBy("pred").agg(
        F.sum("n").cast("long").alias("pred_total"))
    return (
        cells.join(F.broadcast(tt), "truth")
        .join(F.broadcast(pt), "pred")
        .selectExpr(*_FINAL)
    )


def sql_confusion_matrix(
    pairs_sql: str, truth_col: str = "truth", pred_col: str = "pred"
) -> str:
    """DuckDB twin via the INDEPENDENT window plan: marginals as
    SUM() OVER partitions of the cell table (no join-backs); same
    final projection text. ``pairs_sql`` must yield (truth, pred)."""
    return f"""
        WITH cells AS (
          SELECT {truth_col} AS truth, {pred_col} AS pred,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM ({pairs_sql}) s
          WHERE {truth_col} IS NOT NULL AND {pred_col} IS NOT NULL
          GROUP BY 1, 2
        ),
        marg AS (
          SELECT truth, pred, n,
                 CAST(SUM(n) OVER (PARTITION BY truth) AS BIGINT)
                   AS truth_total,
                 CAST(SUM(n) OVER (PARTITION BY pred) AS BIGINT)
                   AS pred_total
          FROM cells
        )
        SELECT {", ".join(_FINAL)} FROM marg
    """
