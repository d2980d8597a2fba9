"""Ripley's K: point-pattern clustering vs. complete spatial randomness.

The second-order point-pattern workhorse (Ripley 1976; Dixon 2002):

    K(r) = (A / (n(n-1))) * SUM over ordered pairs of 1[d_ij <= r]

Under complete spatial randomness K(r) ~ pi*r^2; K above the parabola =
clustering at that range, below = inhibition/dispersion. In a
web-corpus setting it answers "do geoparsed document origins CLUSTER
beyond what density alone explains" — the diagnostic BEFORE reaching
for dbscan's parameters (variogram asks the same question about a
VALUE; Ripley asks it about the POSITIONS themselves).

Scale shape: a pair problem, composed on the audited epsilon-grid
kernel (rangejoin.range_join_pairs: x9 map-side replication, ONE
uniform equi shuffle, exact integer ``dist_sq_micro``) with radius =
lag*n_bins, then ONE hash-agg to per-bin counts (bin = one
exactly-rounded IEEE sqrt over an exact integer — bit-agreed
cross-engine, the variogram precedent), densified against a JVM-side
``spark.range(n_bins)`` (never createDataFrame on a query path —
CLAUDE.md trap) and cumulated by a window over the N_BINS-row bin
table (tiny by construction: single-task is correct, not a skew
hazard). All counts are EXACT BIGINT; khat is the single trailing
IEEE division beside its exact factors (cum_pairs, n_points, area) so
any consumer can cross-multiply instead. n < 2 reports NULL khat via
an integer CASE; NULL key/lat/lon rows are dropped from BOTH the pair
kernel and the n count (no-evidence convention, same filter text both
engines).

No boundary correction (the classic naive estimator): Ripley's
isotropic/translational edge corrections need per-pair boundary
weights, which are a per-geometry modeling choice, not engine work —
callers comparing against CSR should simulate CSR through the SAME
estimator so the edge bias cancels.

Overflow envelope: cum_pairs <= n(n-1)/2 and the khat factors stay
within BIGINT for n < 3e9 points; the epsilon-grid keeps the pair
volume itself linear in n at fixed density.

The DuckDB twin is the INDEPENDENT honest O(n^2) cross-join plan +
generate_series densification — the blocking kernel's completeness is
exactly what the cross-engine gate verifies.

No reference counterpart (specvital/core has no spatial-statistics
subsystem); the estimator is the published Ripley formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from core_spark.operators.rangejoin import range_join_pairs

# identical final projection text on both engines; r is the bin's
# INCLUSIVE quantized upper edge (bin j holds pairs with
# floor(dist*1000) in [j*lag*1000, (j+1)*lag*1000))
_FINAL = (
    "bin",
    "CAST((bin + 1) AS DOUBLE) * {lag} AS r",
    "CAST(n_pairs AS BIGINT) AS n_pairs",
    "CAST(cum_pairs AS BIGINT) AS cum_pairs",
    "CAST(n_points AS BIGINT) AS n_points",
    "CASE WHEN n_points >= 2 THEN"
    " ({area} * 2.0 * CAST(cum_pairs AS DOUBLE))"
    " / (CAST(n_points AS DOUBLE) * CAST(n_points - 1 AS DOUBLE))"
    " END AS khat",
)


def _bin_expr(lag: float) -> str:
    # dist_sq_micro = FLOOR(dist^2 * 1e6): SQRT recovers dist*1000 (to
    # quantization), dividing by lag*1000 yields the lag-bin index —
    # the variogram's bit-agreed binning text, shared by design.
    return (
        "CAST(FLOOR(SQRT(CAST(dist_sq_micro AS DOUBLE))"
        f" / {float(lag) * 1000.0!r}) AS BIGINT)"
    )


def _final(lag: float, area: float) -> list[str]:
    return [
        s.format(lag=repr(float(lag)), area=repr(float(area)))
        for s in _FINAL
    ]


def ripley_k(
    df: DataFrame,
    lag: float,
    n_bins: int,
    area: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    key: str = "doc_id",
) -> DataFrame:
    """(bin, r, n_pairs, cum_pairs, n_points, khat) for bins
    0..n_bins-1 (always densified — empty annuli emit n_pairs = 0):
    K-hat at r = the bin's upper edge, over planar coordinates within
    a window of area ``area``."""
    lag = float(lag)
    n_bins = int(n_bins)
    area = float(area)
    if lag <= 0 or n_bins < 1 or area <= 0:
        raise ValueError(
            f"ripley_k: lag/area must be > 0 and n_bins >= 1,"
            f" got {lag}, {n_bins}, {area}")
    pts = df.where(
        F.col(key).isNotNull()
        & F.col(lat_col).isNotNull()
        & F.col(lon_col).isNotNull()
    ).select(key, lat_col, lon_col)
    pairs = range_join_pairs(
        pts, lag * n_bins, lat_col=lat_col, lon_col=lon_col, key=key)
    per_bin = (
        pairs.selectExpr(f"{_bin_expr(lag)} AS bin")
        # quantized micro-distance can land exactly on the top edge;
        # keep the bin domain closed under the kernel's dist < r rule
        .where(f"bin < {n_bins}")
        .groupBy("bin")
        .agg(F.count("*").cast("long").alias("c"))
    )
    bins = df.sparkSession.range(n_bins).selectExpr("id AS bin")
    n_tot = pts.agg(F.count("*").cast("long").alias("n_points"))
    return (
        bins.join(per_bin, "bin", "left")
        .selectExpr("bin", "COALESCE(c, 0L) AS n_pairs")
        .selectExpr(
            "bin", "n_pairs",
            "SUM(n_pairs) OVER (ORDER BY bin) AS cum_pairs")
        .crossJoin(F.broadcast(n_tot))
        .selectExpr(*_final(lag, area))
    )


def sql_ripley_k(
    points_sql: str,
    lag: float,
    n_bins: int,
    area: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    key: str = "doc_id",
) -> str:
    """DuckDB twin: honest O(n^2) cross-join pairs (independent of the
    epsilon-grid) + generate_series densification + the same
    binning/cumsum/projection text. ``points_sql`` must yield
    (key, lat, lon)."""
    lag = float(lag)
    n_bins = int(n_bins)
    area = float(area)
    r = lag * n_bins
    d2 = (
        f"(p.{lat_col} - q.{lat_col}) * (p.{lat_col} - q.{lat_col})"
        f" + (p.{lon_col} - q.{lon_col}) * (p.{lon_col} - q.{lon_col})"
    )
    proj = ", ".join(_final(lag, area))
    return f"""
        WITH pts AS (
          SELECT * FROM ({points_sql}) s
          WHERE s.{key} IS NOT NULL AND s.{lat_col} IS NOT NULL
            AND s.{lon_col} IS NOT NULL
        ),
        pairs AS (
          SELECT CAST(FLOOR(({d2}) * 1000000) AS BIGINT) AS dist_sq_micro
          FROM pts p, pts q
          WHERE p.{key} < q.{key} AND {d2} < {r * r!r}
        ),
        per_bin AS (
          SELECT {_bin_expr(lag)} AS bin, CAST(COUNT(*) AS BIGINT) AS c
          FROM pairs
          WHERE {_bin_expr(lag)} < {n_bins}
          GROUP BY 1
        ),
        dense AS (
          SELECT g.bin, COALESCE(per_bin.c, 0) AS n_pairs
          FROM (SELECT CAST(x AS BIGINT) AS bin
                FROM generate_series(0, {n_bins - 1}) t(x)) g
          LEFT JOIN per_bin ON per_bin.bin = g.bin
        ),
        cum AS (
          SELECT bin, n_pairs,
                 SUM(n_pairs) OVER (ORDER BY bin) AS cum_pairs,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM pts) AS n_points
          FROM dense
        )
        SELECT {proj} FROM cum
    """
