"""Empirical semivariogram: spatial autocorrelation by distance bin.

The geostatistics workhorse (Matheron 1963; Cressie, "Statistics for
Spatial Data"): for a point set with a measured value z, the empirical
semivariogram estimates

    gamma(h) = (1 / 2·N(h)) · SUM over pairs at distance ~h of (z_i - z_j)^2

— the half mean squared value difference per distance bin. Rising
gamma(h) = spatial autocorrelation (near points agree, far points
don't); the sill/range read off the curve drive kriging, sensor QA, and
(in a web-corpus setting) "does document quality/language cluster
geographically" diagnostics over geoparsed origins.

Scale shape: the input is a PAIR problem and the naive plan is the
O(n²) cartesian. This module does NOT re-derive blocking — it composes
the audited epsilon-grid kernel (rangejoin.range_join_pairs: ×9
map-side replication, ONE uniform equi shuffle, structural
single-emission, dist² already emitted as the exact integer
``dist_sq_micro = FLOOR(dist²·1e6)``) with radius = lag·n_bins, then:

1. two uniform hash joins attach z_a and z_b (BIGINT values — the
   hull/segjoin exact-integer contract: value diffs squared must fit
   int64);
2. bin = FLOOR(SQRT(dist_sq_micro) / (lag·1000)) — one exactly-rounded
   IEEE sqrt over an exact integer, identical expression text on both
   engines (sqrt is fully specified by IEEE 754, unlike the trig the
   portability rules forbid), so the bin is bit-agreed cross-engine;
3. one hash-agg per bin: n_pairs and the EXACT BIGINT sum of squared
   diffs; gamma = sum / (2·n) is the single IEEE division at the end,
   riding next to its exact numerator/denominator so any consumer can
   cross-multiply instead.

Empty bins are absent from the output (no pair evidence ≠ gamma 0);
callers densify against spark.range(n_bins) if they need the full axis.

The DuckDB oracle is the honest O(n²) cross join + the same
binning/agg text — the blocking kernel is what the
cross-engine gate verifies, the scoring algebra is shared by design.

No reference counterpart (specvital/core has no spatial subsystem);
the estimator is the published Matheron formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from core_spark.operators.rangejoin import range_join_pairs
from core_spark.plans.materialize import pin

_GAMMA = (
    "CAST(sum_sqdiff AS DOUBLE)"
    " / (2.0 * CAST(n_pairs AS DOUBLE)) AS gamma"
)


def _bin_expr(lag: float) -> str:
    # dist_sq_micro = FLOOR(dist²·1e6), so SQRT gives dist·1000 (to
    # quantization); dividing by lag·1000 yields the lag-bin index.
    return (
        "CAST(FLOOR(SQRT(CAST(dist_sq_micro AS DOUBLE))"
        f" / {float(lag) * 1000.0!r}) AS BIGINT)"
    )


def variogram(
    df: DataFrame,
    lag: float,
    n_bins: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
    value_col: str = "value",
    key: str = "doc_id",
) -> DataFrame:
    """(bin, n_pairs, sum_sqdiff, gamma) over all point pairs with
    planar dist < lag·n_bins, binned by FLOOR(dist/lag). ``value_col``
    must be integral (cast to BIGINT; exact squared-diff sums)."""
    lag = float(lag)
    n_bins = int(n_bins)
    if lag <= 0 or n_bins < 1:
        raise ValueError(
            f"variogram: lag must be > 0 and n_bins >= 1,"
            f" got {lag}, {n_bins}")
    pairs = range_join_pairs(
        df, lag * n_bins, lat_col=lat_col, lon_col=lon_col, key=key)
    vals = pin(df.selectExpr(
        f"{key} AS _vk", f"CAST({value_col} AS BIGINT) AS _vz"
    ).where("_vk IS NOT NULL AND _vz IS NOT NULL"))
    za = vals.selectExpr("_vk AS a", "_vz AS _za")
    zb = vals.selectExpr("_vk AS b", "_vz AS _zb")
    return (
        pairs.join(za, "a").join(zb, "b")
        .selectExpr(f"{_bin_expr(lag)} AS bin",
                    "(_za - _zb) * (_za - _zb) AS _sq")
        # quantized micro-distance can land exactly on the top edge;
        # the pair kernel already guarantees dist² < r², keep the bin
        # domain closed under the same rule
        .where(f"bin < {n_bins}")
        .groupBy("bin")
        .agg(F.count("*").cast("long").alias("n_pairs"),
             F.sum("_sq").cast("long").alias("sum_sqdiff"))
        .selectExpr("bin", "n_pairs", "sum_sqdiff", _GAMMA)
    )


def sql_variogram(
    points_sql: str,
    lag: float,
    n_bins: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
    value_col: str = "value",
    key: str = "doc_id",
) -> str:
    """DuckDB twin: brute-force O(n²) pairs (independent of the
    epsilon-grid) + the same binning/agg text. ``points_sql`` must
    yield (key, lat, lon, value)."""
    lag = float(lag)
    n_bins = int(n_bins)
    r = lag * n_bins
    d2 = (
        f"(p.{lat_col} - q.{lat_col}) * (p.{lat_col} - q.{lat_col})"
        f" + (p.{lon_col} - q.{lon_col}) * (p.{lon_col} - q.{lon_col})"
    )
    return f"""
        WITH pts AS ({points_sql}),
        pairs AS (
          SELECT p.{key} AS a, q.{key} AS b,
                 CAST(FLOOR(({d2}) * 1000000) AS BIGINT) AS dist_sq_micro
          FROM pts p, pts q
          WHERE p.{key} < q.{key} AND {d2} < {r * r!r}
        ),
        vals AS (
          SELECT {key} AS _vk, CAST({value_col} AS BIGINT) AS _vz
          FROM pts
          WHERE {key} IS NOT NULL AND {value_col} IS NOT NULL
        ),
        binned AS (
          SELECT {_bin_expr(lag)} AS bin,
                 (za._vz - zb._vz) * (za._vz - zb._vz) AS _sq
          FROM pairs
          JOIN vals za ON za._vk = pairs.a
          JOIN vals zb ON zb._vk = pairs.b
        )
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(_sq) AS BIGINT) AS sum_sqdiff,
               {_GAMMA}
        FROM binned
        WHERE bin < {n_bins}
        GROUP BY bin
    """
