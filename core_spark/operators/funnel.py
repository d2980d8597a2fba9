"""Strict-order funnel: how many users complete step 1 -> 2 -> ... ?

The product-analytics staple: given an ordered list of step labels,
a user reaches depth k when there exist events e_1 < e_2 < ... < e_k
(strictly increasing timestamps) with the required labels in order —
view before click before purchase, robots-fetch before page-fetch
before asset-fetch. The greedy earliest-match rule (take the first
qualifying event for each step) is OPTIMAL for this reachability
question: matching a step later than necessary can only shrink the
remaining suffix, so greedy depth = maximal depth (the standard
exchange argument), and the whole funnel is decided in ONE ordered
pass per user.

All-integer: timestamps are BIGINT ticks, the pass is label
comparison + depth counter; per-step user counts are exact BIGINTs
and the conversion ratio is ONE trailing IEEE division beside them.
Simultaneous events (equal ticks) do NOT chain (strict <): two
events on the same tick can satisfy at most one step, the
deterministic reading of "then".

Scale shape: ONE hash-agg per user collects the (t, label) events
RELEVANT to the funnel (filtered to the step labels map-side — the
raw stream never reaches the sort), sort_array + ONE within-row
linear fold (lambda volume = events-per-user, far under the PLANS
§109 budget — this is the linear case HOFs are right for, unlike
the O(m²) kendall core), then ONE tiny hash-agg over depths and a
running-sum window over the ≤ n_steps rows. Ties of (t, label) sort
deterministically by the struct order.

The DuckDB twin is the INDEPENDENT plan: chained per-step CTEs —
t_k = min event of step k strictly after t_{k-1} via a correlated
aggregate join — no arrays, no fold.

No reference counterpart (specvital/core has no event-analytics
subsystem); the semantics are the standard strict-sequence funnel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# identical final projection text on both engines, over the grain
# (step, label, n_reached, n_entered) — n_entered = depth-1 count
# (step 1 converts from the user universe that emitted any step-1..)
_FINAL = (
    "CAST(step AS BIGINT) AS step",
    "label",
    "CAST(n_reached AS BIGINT) AS n_reached",
    "CASE WHEN prev <> 0 THEN"
    " CAST(n_reached AS DOUBLE) / CAST(prev AS DOUBLE)"
    " END AS conversion",
)


def funnel(
    events: DataFrame,
    steps: tuple[str, ...],
    key_col: str = "key",
    t_col: str = "t",
    label_col: str = "label",
) -> DataFrame:
    """One row per funnel step (step, label, n_reached, conversion):
    users whose event history contains the step labels in strict
    timestamp order; conversion = reached(k)/reached(k-1), NULL at
    step 1. Steps must be distinct labels."""
    steps = tuple(steps)
    if len(steps) < 2 or len(set(steps)) != len(steps):
        raise ValueError(
            f"funnel: need >= 2 distinct step labels, got {steps!r}")
    lab_arr = ", ".join(f"'{s}'" for s in steps)
    # greedy fold: acc = struct(depth, last_t); advance when the event
    # matches the NEXT step label strictly after last_t
    fold = (
        "aggregate(sort_array(collect_list(struct(_t AS t, _l AS l))),"
        " struct(0L AS depth, -9223372036854775808L AS last),"
        f" (a, e) -> CASE WHEN a.depth < {len(steps)}"
        f" AND e.l = element_at(array({lab_arr}),"
        " CAST(a.depth + 1 AS INT))"
        " AND e.t > a.last"
        " THEN struct(a.depth + 1 AS depth, e.t AS last)"
        " ELSE a END,"
        " a -> a.depth)"
    )
    depths = (
        events.selectExpr(
            f"{key_col} AS key",
            f"CAST({t_col} AS BIGINT) AS _t",
            f"{label_col} AS _l",
        )
        .where("key IS NOT NULL AND _t IS NOT NULL AND _l IS NOT NULL")
        .where(f"_l IN ({lab_arr})")
        .groupBy("key")
        .agg(F.expr(f"{fold} AS depth"))
        .where("depth >= 1")
    )
    per_depth = depths.groupBy("depth").agg(
        F.count("*").cast("long").alias("c"))
    from pyspark.sql import Window

    # cumulative from the deepest side: reached(k) = sum of c at
    # depth >= k — over the <= n_steps-row table only
    steps_df = events.sparkSession.range(1, len(steps) + 1).selectExpr(
        "id AS step",
        f"element_at(array({lab_arr}), CAST(id AS INT)) AS label")
    w = Window.orderBy(F.col("step").desc()).rowsBetween(
        Window.unboundedPreceding, 0)
    reached = (
        steps_df.join(
            per_depth.selectExpr("depth AS step", "c"), "step", "left")
        .select(
            "step", "label",
            F.sum(F.coalesce(F.col("c"), F.lit(0))).over(w)
            .alias("n_reached"))
        .select(
            "step", "label", "n_reached",
            F.lag("n_reached").over(Window.orderBy("step"))
            .alias("_prev"))
        .selectExpr("step", "label", "n_reached",
                    "COALESCE(_prev, 0L) AS prev")
    )
    return reached.selectExpr(*_FINAL)


def sql_funnel(
    events_sql: str,
    steps: tuple[str, ...],
    key_col: str = "key",
    t_col: str = "t",
    label_col: str = "label",
) -> str:
    """DuckDB twin via the INDEPENDENT chained-CTE plan: t_k = the
    min step-k event strictly after t_{k-1}, one CTE per step — no
    arrays, no fold; same final projection text. ``events_sql`` must
    yield (key, t, label)."""
    steps = tuple(steps)
    ctes = [f"""        s1 AS (
          SELECT key, MIN(t) AS t1 FROM ev
          WHERE label = '{steps[0]}' GROUP BY key
        )"""]
    for i, lab in enumerate(steps[1:], start=2):
        ctes.append(f"""        s{i} AS (
          SELECT s{i - 1}.key, MIN(ev.t) AS t{i}
          FROM s{i - 1} JOIN ev ON ev.key = s{i - 1}.key
           AND ev.label = '{lab}' AND ev.t > s{i - 1}.t{i - 1}
          GROUP BY s{i - 1}.key
        )""")
    counts = "\n          UNION ALL\n".join(
        f"          SELECT {i} AS step, '{lab}' AS label,"
        f" (SELECT CAST(COUNT(*) AS BIGINT) FROM s{i}) AS n_reached"
        for i, lab in enumerate(steps, start=1)
    )
    return f"""
        WITH ev AS (
          SELECT {key_col} AS key, CAST({t_col} AS BIGINT) AS t,
                 {label_col} AS label
          FROM ({events_sql}) s
          WHERE {key_col} IS NOT NULL AND {t_col} IS NOT NULL
            AND {label_col} IS NOT NULL
        ),
{",".join(ctes)},
        tbl AS (
{counts}
        ),
        chained AS (
          SELECT step, label, n_reached,
                 COALESCE(lag(n_reached) OVER (ORDER BY step), 0)
                   AS prev
          FROM tbl
        )
        SELECT {", ".join(_FINAL)} FROM chained
    """
