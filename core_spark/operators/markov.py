"""First-order Markov transition matrix over per-entity event sequences.

The session-analytics primitive funnel/cohort/streak queries stand on:
for every ordered pair of states (src → dst), how often does an
entity's NEXT event follow the current one, and with what conditional
probability? The output is the navigation model — next-page
prediction, dropout analysis, anomalous-flow detection all read this
table.

Semantics: events are ordered per entity by (order_col, tiebreak_col)
— the tiebreak makes equal-timestamp pairs deterministic, the same
discipline as stay_points/funnel. Each consecutive pair contributes
one (src, dst) transition; the last event of an entity contributes
nothing. prob = n / src_total is the row-normalized conditional
P(dst | src).

Exactness: counts are BIGINTs from hash-aggs; prob is ONE trailing
IEEE division beside its exact factors (num = n, den = src_total) —
nothing floating is ever summed.

Scale shape: ONE Exchange on the entity key (the LEAD window), then a
hash-agg on the (src, dst) key — the transition table is bounded by
S² for S distinct states, so the row-normalizing totals attach via a
BROADCAST equi-join, never a second shuffle of event-scale data.

The DuckDB twin runs the same LEAD plan but normalizes through a
correlated-free window SUM instead of the join — a different tail on
purpose.

No reference counterpart (specvital/core has no event subsystem);
the statistic is the classical empirical first-order Markov chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from core_spark.plans.materialize import pin


def transition_matrix(
    events: DataFrame,
    entity_col: str = "user_id",
    order_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Rows (src, dst, n, src_total, prob): empirical first-order
    transition counts and conditional probabilities. NULL states or
    entities are dropped on ingest (a NULL src/dst names no state);
    single-event entities contribute no row."""
    w = Window.partitionBy(entity_col).orderBy(order_col, tiebreak_col)
    pairs = (
        events.where(
            F.col(entity_col).isNotNull() & F.col(state_col).isNotNull()
        )
        .select(
            F.col(state_col).alias("src"),
            F.lead(state_col).over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
    )
    # pinned: the totals agg AND the final join both consume the
    # transition table — unpinned, each branch re-runs the LEAD window
    counts = pin(pairs.groupBy("src", "dst").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n")
    ))
    totals = counts.groupBy(F.col("src").alias("_ts")).agg(
        F.expr("CAST(SUM(n) AS BIGINT)").alias("src_total")
    )
    return (
        counts.join(F.broadcast(totals), F.col("src") == F.col("_ts"))
        .selectExpr(
            "src", "dst", "n", "src_total",
            "CAST(n AS DOUBLE) / CAST(src_total AS DOUBLE) AS prob",
        )
    )


def sql_transition_matrix(
    events_sql: str,
    entity_col: str = "user_id",
    order_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> str:
    """DuckDB twin: same LEAD pair extraction, row totals via a window
    SUM over the transition table instead of the broadcast join."""
    return f"""
        WITH pairs AS (
            SELECT {state_col} AS src,
                   LEAD({state_col}) OVER (
                       PARTITION BY {entity_col}
                       ORDER BY {order_col}, {tiebreak_col}) AS dst
            FROM ({events_sql}) e
            WHERE {entity_col} IS NOT NULL AND {state_col} IS NOT NULL
        ),
        counts AS (
            SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
            FROM pairs WHERE dst IS NOT NULL GROUP BY src, dst
        )
        SELECT src, dst, n,
               CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT)
                   AS src_total,
               CAST(n AS DOUBLE)
                   / CAST(SUM(n) OVER (PARTITION BY src) AS DOUBLE)
                   AS prob
        FROM counts
    """
