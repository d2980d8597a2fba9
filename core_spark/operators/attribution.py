"""Conversion attribution — last-touch and first-touch channel credit.

The funnel operator answers "how far do users get"; attribution
answers the budget question: WHICH channel gets credit for each
conversion? Last-touch credits the most recent non-conversion event
before the purchase; first-touch credits the user's earliest one.
Both are window lookups, and both need the IGNORE NULLS form — the
only place in the registry that exercises it, so the cross-engine
agreement of IGNORE NULLS window semantics is itself part of what
the oracle gates.

Semantics: events are ordered per user by (t, id); for every
conversion event, last_touch = LAST_VALUE(channel IGNORE NULLS)
over the STRICTLY-PRECEDING frame (UNBOUNDED..1 PRECEDING — the
conversion itself must not self-credit) and first_touch likewise
with FIRST_VALUE. Conversions with no prior touch credit the
'(none)' bucket — dropping them would overstate every channel's
share. Output is the per-channel credit table for both models side
by side (a FULL OUTER of the two rollups: a channel can earn
last-touch credit yet never be anyone's first touch).

Exactness: counts only — BIGINTs end to end.

Scale shape: ONE entity-keyed window pass (both lookups share the
frame), one filter to conversions, two small hash-aggs FULL-OUTER
merged on the bounded channel key.

No reference counterpart; the shape is standard marketing/journey
attribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from core_spark.plans.materialize import pin

_NONE = "(none)"


def attribution(
    events: DataFrame,
    conv_type: str = "purchase",
    user_col: str = "user_id",
    t_col: str = "t",
    id_col: str = "id",
    type_col: str = "event_type",
) -> DataFrame:
    """Rows (channel, last_touch, first_touch): conversions credited
    per channel under both models; '(none)' collects conversions
    with no prior touch. NULL users/types dropped on ingest."""
    v = events.where(
        F.col(user_col).isNotNull() & F.col(type_col).isNotNull()
        & F.col(t_col).isNotNull()
    ).selectExpr(
        f"{user_col} AS u", f"CAST({t_col} AS BIGINT) AS t",
        f"{id_col} AS id", f"{type_col} AS et",
        f"CASE WHEN {type_col} <> '{conv_type}'"
        f" THEN {type_col} END AS ch",
    )
    w = (
        Window.partitionBy("u").orderBy("t", "id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # pinned: BOTH rollups consume this table — without the pin each
    # branch re-evaluates the event-scale window (CLAUDE.md rule)
    conv = pin(
        v.select(
            "et",
            F.last("ch", ignorenulls=True).over(w).alias("lt"),
            F.first("ch", ignorenulls=True).over(w).alias("ft"),
        )
        .where(f"et = '{conv_type}'")
        .selectExpr(
            f"COALESCE(lt, '{_NONE}') AS lt",
            f"COALESCE(ft, '{_NONE}') AS ft",
        )
    )
    last = conv.groupBy(F.col("lt").alias("_lc")).agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("last_touch"))
    first = conv.groupBy(F.col("ft").alias("_fc")).agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("first_touch"))
    return (
        last.join(first, F.col("_lc") == F.col("_fc"), "full_outer")
        .selectExpr(
            "COALESCE(_lc, _fc) AS channel",
            "CAST(COALESCE(last_touch, 0) AS BIGINT) AS last_touch",
            "CAST(COALESCE(first_touch, 0) AS BIGINT) AS first_touch",
        )
    )


def sql_attribution(
    events_sql: str,
    conv_type: str = "purchase",
    user_col: str = "user_id",
    t_col: str = "t",
    id_col: str = "id",
    type_col: str = "event_type",
) -> str:
    """DuckDB twin: LAST_VALUE/FIRST_VALUE (x IGNORE NULLS) over the
    identical strictly-preceding frame text."""
    return f"""
        WITH at_v AS (
            SELECT {user_col} AS u, CAST({t_col} AS BIGINT) AS t,
                   {id_col} AS id, {type_col} AS et,
                   CASE WHEN {type_col} <> '{conv_type}'
                        THEN {type_col} END AS ch
            FROM ({events_sql}) s
            WHERE {user_col} IS NOT NULL AND {type_col} IS NOT NULL
              AND {t_col} IS NOT NULL
        ),
        at_c AS (
            SELECT COALESCE(LAST_VALUE(ch IGNORE NULLS) OVER (
                       PARTITION BY u ORDER BY t, id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), '{_NONE}') AS lt,
                   COALESCE(FIRST_VALUE(ch IGNORE NULLS) OVER (
                       PARTITION BY u ORDER BY t, id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), '{_NONE}') AS ft,
                   et
            FROM at_v
        ),
        at_l AS (
            SELECT lt AS c, CAST(COUNT(*) AS BIGINT) AS last_touch
            FROM at_c WHERE et = '{conv_type}' GROUP BY lt
        ),
        at_f AS (
            SELECT ft AS c, CAST(COUNT(*) AS BIGINT) AS first_touch
            FROM at_c WHERE et = '{conv_type}' GROUP BY ft
        )
        SELECT COALESCE(at_l.c, at_f.c) AS channel,
               CAST(COALESCE(last_touch, 0) AS BIGINT) AS last_touch,
               CAST(COALESCE(first_touch, 0) AS BIGINT) AS first_touch
        FROM at_l FULL OUTER JOIN at_f ON at_l.c = at_f.c
    """
