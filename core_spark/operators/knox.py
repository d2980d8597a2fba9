"""Knox space-time interaction test: do close-in-space pairs also
cluster in time?

The classic epidemiological surveillance statistic (Knox 1964;
Mantel 1967 generalizes): over events with (x, y, t),

    X  = # pairs close in space AND time   (d² <= eps², |dt| <= tau)
    Ns = # pairs close in space            (any time)
    Nt = # pairs close in time             (any place)
    ratio = X * n0 / (Ns * Nt),  n0 = n(n-1)/2

Under no interaction the space and time margins are independent and
E[X] ~ Ns*Nt/n0, so ratio >> 1 = genuine spatio-temporal interaction
(an outbreak, a flashmob, a coordinated crawl burst) rather than "a
dense place" plus "a busy hour" separately — the question Ripley
(space only) and the burst family (time only) each miss.

Composition, not re-derivation: all three counts come from the
AUDITED stjoin.contact_pairs kernel (27-key composite-grid blocking,
structural single emission, exact BIGINT conjunction) — the marginal
counts reuse it with one axis made degenerate (tau_inf / eps_inf
bounds the CALLER asserts cover the data; the honest oracle's
UNBOUNDED marginal predicates gate that sufficiency cross-engine, so
an undersized bound fails the oracle, never silently undercounts).
Every count is an EXACT BIGINT; the ratio is a fixed-order IEEE
mul/div tail beside its exact factors, NULL via integer comparisons
(never a BIGINT product that could overflow) when either margin is
empty.

Scale shape: three passes of the contact kernel (ONE uniform equi
shuffle each) + four 1-row aggregates crossJoined broadcast-style.
The degenerate-axis marginals inherit the documented hot-cell skew
(with tau_inf the time axis no longer slices dense cells): at real
scale compute marginals per bounded window and sum — the statistic
is additive over disjoint windows of pairs.

Overflow contract (stjoin's): coordinates/ticks BIGINT with
eps_inf² and tau_inf within int64 — enforced here (|eps| <= 3e9).

The DuckDB twin is the INDEPENDENT honest O(n²) plan: ONE self cross
join computing all three counts as conditional sums with the
unbounded marginal predicates.

No reference counterpart (specvital/core has no spatiotemporal
subsystem); the statistic is the published Knox formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from core_spark.operators.stjoin import contact_pairs

# identical final projection text on both engines
_FINAL = (
    "CAST(n AS BIGINT) AS n_points",
    "CAST(n * (n - 1) DIV 2 AS BIGINT) AS n0",
    "CAST(n_st AS BIGINT) AS n_st",
    "CAST(n_s AS BIGINT) AS n_s",
    "CAST(n_t AS BIGINT) AS n_t",
    "CASE WHEN n_s <> 0 AND n_t <> 0 THEN"
    " (CAST(n_st AS DOUBLE) * CAST(n * (n - 1) DIV 2 AS DOUBLE))"
    " / (CAST(n_s AS DOUBLE) * CAST(n_t AS DOUBLE))"
    " END AS knox_ratio",
)

_MAX_EPS = 3_000_000_000  # eps² must fit int64 in the kernel predicate


def knox_test(
    events: DataFrame,
    eps: int,
    tau: int,
    eps_inf: int,
    tau_inf: int,
    key: str = "event_id",
    x: str = "x",
    y: str = "y",
    t: str = "t",
) -> DataFrame:
    """One row (n_points, n0, n_st, n_s, n_t, knox_ratio): Knox
    space-time interaction over BIGINT (x, y, t). ``eps_inf`` /
    ``tau_inf`` must dominate the data's spatial/temporal span (the
    oracle gates this); NULL ratio when either margin is empty."""
    eps, tau = int(eps), int(tau)
    eps_inf, tau_inf = int(eps_inf), int(tau_inf)
    if not (0 < eps < eps_inf and 0 < tau < tau_inf):
        raise ValueError(
            "knox_test: need 0 < eps < eps_inf and 0 < tau < tau_inf,"
            f" got eps={eps}, eps_inf={eps_inf}, tau={tau},"
            f" tau_inf={tau_inf}")
    if eps_inf > _MAX_EPS:
        raise ValueError(
            f"knox_test: eps_inf {eps_inf} overflows the int64 eps²"
            f" envelope (max {_MAX_EPS})")
    clean = events.selectExpr(
        f"{key} AS _k", f"CAST({x} AS BIGINT) AS _x",
        f"CAST({y} AS BIGINT) AS _y", f"CAST({t} AS BIGINT) AS _t",
    ).where("_k IS NOT NULL AND _x IS NOT NULL AND _y IS NOT NULL"
            " AND _t IS NOT NULL")
    n_df = clean.agg(F.count("*").cast("long").alias("n"))

    def _count(e: int, w: int, alias: str) -> DataFrame:
        return contact_pairs(
            events, e, w, key=key, x=x, y=y, t=t
        ).agg(F.count("*").cast("long").alias(alias))

    return (
        n_df
        .crossJoin(F.broadcast(_count(eps, tau, "n_st")))
        .crossJoin(F.broadcast(_count(eps, tau_inf, "n_s")))
        .crossJoin(F.broadcast(_count(eps_inf, tau, "n_t")))
        .selectExpr(*_FINAL)
    )


def sql_knox_test(
    events_sql: str,
    eps: int,
    tau: int,
    key: str = "event_id",
    x: str = "x",
    y: str = "y",
    t: str = "t",
) -> str:
    """DuckDB twin: ONE honest O(n²) self cross join with conditional
    sums and UNBOUNDED marginal predicates (no eps_inf/tau_inf — this
    gates the caller's bound sufficiency); same final projection
    text. ``events_sql`` must yield (key, x, y, t)."""
    e, w = int(eps), int(tau)
    return f"""
        WITH ev AS (
          SELECT {key} AS k, CAST({x} AS BIGINT) AS ex,
                 CAST({y} AS BIGINT) AS ey, CAST({t} AS BIGINT) AS et
          FROM ({events_sql}) s
          WHERE {key} IS NOT NULL AND {x} IS NOT NULL
            AND {y} IS NOT NULL AND {t} IS NOT NULL
        ),
        sums AS (
          SELECT
            CAST(COALESCE(SUM(CASE WHEN sp = 1 AND tp = 1 THEN 1 END), 0)
              AS BIGINT) AS n_st,
            CAST(COALESCE(SUM(CASE WHEN sp = 1 THEN 1 END), 0)
              AS BIGINT) AS n_s,
            CAST(COALESCE(SUM(CASE WHEN tp = 1 THEN 1 END), 0)
              AS BIGINT) AS n_t
          FROM (
            SELECT CASE WHEN (p.ex - q.ex) * (p.ex - q.ex)
                           + (p.ey - q.ey) * (p.ey - q.ey) <= {e * e}
                        THEN 1 ELSE 0 END AS sp,
                   CASE WHEN abs(p.et - q.et) <= {w}
                        THEN 1 ELSE 0 END AS tp
            FROM ev p, ev q
            WHERE p.k < q.k
          ) pr
        ),
        counts AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ev
        )
        SELECT {", ".join(_FINAL).replace(" DIV ", " // ")}
        FROM counts, sums
    """
