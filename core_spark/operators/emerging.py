"""Emerging hot spots: Mann-Kendall trend per space-time-cube cell.

hotspots_gi answers "where is density extreme NOW"; the operational
question for a crawl/monitoring pipeline is "where is density
RISING" — new content farms, growing regions, decaying hosts. The GIS
canon calls this emerging-hot-spot analysis over the space-time cube:
bucket events into (cell, time-slice) counts and score each cell's
series with the Mann-Kendall trend statistic

    S = sum_{i<j} sign(n_j - n_i)

(Mann 1945, Kendall's tau numerator). S is chosen over a fitted slope
for exactly the properties this repo optimizes for: it is RANK-based
(robust to spikes), needs no mean or variance, and is PURE INTEGER —
every term is a three-way CASE on two BIGINT counts, so the whole
statistic is exact, partition-order-free, and bit-identical across
engines with no quantization step at all (the first operator in the
family where exactness costs literally nothing).

Plan shape (two hash-aggs, zero joins, zero Python):

1. cube: points -> (cx, cy, bucket) counts — one hash-agg on uniform
   keys (FLOOR-before-cast grid, integer time bucketing);
2. series: GROUP BY cell with SUM(CASE WHEN bucket = k ...) pivot
   columns n0..n{T-1} — the zero-fill for empty slices falls out of
   the pivot (missing bucket sums to 0), avoiding any map/array
   portability machinery;
3. S and the classification are a single codegen'd projection over
   the T·(T-1)/2 pairwise sign terms (emitted from one Python loop,
   identical text both engines).

``trend`` classifies by S against a caller threshold: 'rising' /
'falling' / 'flat'. This is the raw MK statistic with a fixed cut —
deliberately NOT the full MK z-test (its tie-corrected variance buys
little at fixed small T and would drag a variance estimate into the
compared values); at T = 8 the extremes are ±28.

The DuckDB oracle is an INDEPENDENT plan — no pivot: the bucket pairs
are enumerated by a positional self-join over the cube and SIGN-summed
per cell (zero-filled via a generated bucket spine), so the pivot
trick itself is what the gate verifies.

No reference counterpart (specvital/core has no spatiotemporal
subsystem); the statistic is the published Mann-Kendall formulation,
the framing is the standard GIS emerging-hot-spot analysis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _sign(a: str, b: str) -> str:
    return (f"CASE WHEN {b} > {a} THEN 1 WHEN {b} < {a} THEN -1"
            f" ELSE 0 END")


def emerging_hotspots(
    points: DataFrame,
    cell: float,
    n_buckets: int,
    threshold: int,
    lat: str = "lat",
    lon: str = "lon",
    bucket: str = "bucket",
) -> DataFrame:
    """Per-cell Mann-Kendall trend over (lat, lon, bucket) events.

    ``bucket`` is a precomputed integer time slice in [0, n_buckets)
    (callers derive it from their timestamp granularity); rows with
    NULL/NaN coords or out-of-range buckets drop. Output: cx, cy,
    n_total, mk_s, trend.
    """
    g = float(cell)
    t = int(n_buckets)
    h = int(threshold)
    if g <= 0 or t < 2 or h < 0:
        raise ValueError(
            f"emerging_hotspots: need cell > 0, n_buckets >= 2,"
            f" threshold >= 0; got {cell}, {n_buckets}, {threshold}")
    cube = (
        points.where(
            f"{lat} IS NOT NULL AND {lon} IS NOT NULL"
            f" AND NOT isnan({lat}) AND NOT isnan({lon})"
            f" AND {bucket} IS NOT NULL AND {bucket} >= 0"
            f" AND {bucket} < {t}"
        )
        .selectExpr(
            f"CAST(FLOOR({lon} / {g!r}) AS BIGINT) AS cx",
            f"CAST(FLOOR({lat} / {g!r}) AS BIGINT) AS cy",
            f"CAST({bucket} AS BIGINT) AS b",
        )
        .groupBy("cx", "cy", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pivots = [
        F.sum(F.expr(f"CASE WHEN b = {k} THEN n ELSE 0L END")).alias(f"_n{k}")
        for k in range(t)
    ]
    series = cube.groupBy("cx", "cy").agg(
        F.sum("n").alias("n_total"), *pivots
    )
    s_expr = " + ".join(
        _sign(f"_n{i}", f"_n{j}") for i in range(t) for j in range(i + 1, t)
    )
    return series.selectExpr(
        "cx", "cy", "n_total",
        f"CAST({s_expr} AS BIGINT) AS mk_s",
    ).selectExpr(
        "cx", "cy", "n_total", "mk_s",
        f"CASE WHEN mk_s >= {h} THEN 'rising'"
        f" WHEN mk_s <= {-h} THEN 'falling'"
        f" ELSE 'flat' END AS trend",
    )


def sql_emerging_hotspots(
    src: str,
    cell: float,
    n_buckets: int,
    threshold: int,
    lat: str = "lat",
    lon: str = "lon",
    bucket: str = "bucket",
) -> str:
    """DuckDB twin: NO pivot — zero-filled bucket spine cross join +
    positional pair self-join, SIGN summed per cell. Independent plan."""
    g = float(cell)
    t = int(n_buckets)
    h = int(threshold)
    return f"""
WITH cube AS (
  SELECT CAST(FLOOR({lon} / {g!r}) AS BIGINT) AS cx,
         CAST(FLOOR({lat} / {g!r}) AS BIGINT) AS cy,
         CAST({bucket} AS BIGINT) AS b,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ({src})
  WHERE {lat} IS NOT NULL AND {lon} IS NOT NULL
    AND NOT isnan({lat}) AND NOT isnan({lon})
    AND {bucket} IS NOT NULL AND {bucket} >= 0 AND {bucket} < {t}
  GROUP BY 1, 2, 3
),
spine AS (SELECT UNNEST(range({t})) AS b),
cells AS (SELECT DISTINCT cx, cy FROM cube),
series AS (
  SELECT c.cx, c.cy, s.b, COALESCE(q.n, 0) AS n
  FROM cells c CROSS JOIN spine s
  LEFT JOIN cube q ON q.cx = c.cx AND q.cy = c.cy AND q.b = s.b
),
scored AS (
  SELECT a.cx, a.cy,
         CAST(SUM(CASE WHEN j.n > a.n THEN 1
                       WHEN j.n < a.n THEN -1 ELSE 0 END) AS BIGINT) AS mk_s
  FROM series a JOIN series j
    ON j.cx = a.cx AND j.cy = a.cy AND j.b > a.b
  GROUP BY a.cx, a.cy
),
totals AS (
  SELECT cx, cy, CAST(SUM(n) AS BIGINT) AS n_total FROM cube GROUP BY 1, 2
)
SELECT t.cx, t.cy, t.n_total, s.mk_s,
       CASE WHEN s.mk_s >= {h} THEN 'rising'
            WHEN s.mk_s <= {-h} THEN 'falling'
            ELSE 'flat' END AS trend
FROM totals t JOIN scored s ON s.cx = t.cx AND s.cy = t.cy
"""
