"""Emerging topics per region: Mann-Kendall trend per (cell, term).

``emerging_hotspots`` answers "where is DENSITY rising";
``geo_terms`` answers "what is distinctive WHERE". This operator is
their composition in the time dimension: for every (grid cell, term)
pair with enough support, the Mann-Kendall trend of the term's
per-time-slice document counts — which topics are RISING in which
region, the monitoring signal for crawl scheduling and trend
detection (a term going 0→many in one region is breaking local news;
one decaying everywhere is boilerplate dying out).

The statistic and its exactness argument are emerging.py's: S is a
sum of three-way sign comparisons on BIGINT counts — rank-based,
pure integer, zero quantization (see operators/emerging.py). This
module generalizes the space-time-cube key from (cell) to
(cell, term); the in-window hotspot operator is deliberately left
untouched.

Plan shape: one within-row ``array_distinct`` (a term counts once per
doc per slice — document frequency, not raw tf, so one spammy page
can't fake a trend) → explode to (cell, term, bucket) hits → ONE
uniform hash-agg to the cube → the T-column pivot GROUP BY
(cell, term) with the T(T−1)/2 sign terms in one codegen'd
projection. Zero joins, zero Python. ``min_total`` cuts the
vocabulary tail INSIDE the pivot aggregate (HAVING on the exact
total), which is what bounds the output: at web scale the cube is
(cells × vocabulary × T) before the cut, uniform keys throughout.

The DuckDB twin is the independent no-pivot plan (zero-filled bucket
spine + positional pair self-join), keyed by (cell, term).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from core_spark.operators.emerging import _sign


def emerging_terms(
    docs: DataFrame,
    cell: float,
    n_buckets: int,
    threshold: int,
    min_total: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    lat: str = "lat",
    lon: str = "lon",
    bucket: str = "bucket",
) -> DataFrame:
    """Per-(cell, term) Mann-Kendall trend. Output: cx, cy, term,
    n_total, mk_s, trend ('rising'/'falling'/'flat' by ±threshold);
    pairs with n_total < min_total are cut."""
    g = float(cell)
    t = int(n_buckets)
    h = int(threshold)
    m = int(min_total)
    if g <= 0 or t < 2 or h < 0 or m < 1:
        raise ValueError(
            f"emerging_terms: need cell > 0, n_buckets >= 2,"
            f" threshold >= 0, min_total >= 1; got"
            f" {cell}, {n_buckets}, {threshold}, {min_total}")
    cube = (
        docs.where(
            f"{lat} IS NOT NULL AND {lon} IS NOT NULL"
            f" AND NOT isnan({lat}) AND NOT isnan({lon})"
            f" AND {bucket} IS NOT NULL AND {bucket} >= 0"
            f" AND {bucket} < {t}"
        )
        .selectExpr(
            f"CAST(FLOOR({lon} / {g!r}) AS BIGINT) AS cx",
            f"CAST(FLOOR({lat} / {g!r}) AS BIGINT) AS cy",
            f"CAST({bucket} AS BIGINT) AS b",
            f"explode(array_distinct(split(coalesce({text_col}, ''), ' ')))"
            " AS term",
        )
        .where("term != ''")
        .groupBy("cx", "cy", "term", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pivots = [
        F.sum(F.expr(f"CASE WHEN b = {k} THEN n ELSE 0L END")).alias(f"_n{k}")
        for k in range(t)
    ]
    series = (
        cube.groupBy("cx", "cy", "term")
        .agg(F.sum("n").alias("n_total"), *pivots)
        .where(F.col("n_total") >= m)
    )
    s_expr = " + ".join(
        _sign(f"_n{i}", f"_n{j}") for i in range(t) for j in range(i + 1, t)
    )
    return series.selectExpr(
        "cx", "cy", "term", "CAST(n_total AS BIGINT) AS n_total",
        f"CAST({s_expr} AS BIGINT) AS mk_s",
    ).selectExpr(
        "cx", "cy", "term", "n_total", "mk_s",
        f"CASE WHEN mk_s >= {h} THEN 'rising'"
        f" WHEN mk_s <= {-h} THEN 'falling'"
        f" ELSE 'flat' END AS trend",
    )


def sql_emerging_terms(
    src: str,
    cell: float,
    n_buckets: int,
    threshold: int,
    min_total: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    lat: str = "lat",
    lon: str = "lon",
    bucket: str = "bucket",
) -> str:
    """DuckDB twin: no pivot — zero-filled bucket spine + positional
    pair self-join per (cell, term). Independent plan."""
    g = float(cell)
    t = int(n_buckets)
    h = int(threshold)
    m = int(min_total)
    return f"""
WITH cube AS (
  SELECT cx, cy, term, b, CAST(COUNT(*) AS BIGINT) AS n
  FROM (
    SELECT CAST(FLOOR({lon} / {g!r}) AS BIGINT) AS cx,
           CAST(FLOOR({lat} / {g!r}) AS BIGINT) AS cy,
           CAST({bucket} AS BIGINT) AS b,
           unnest(list_distinct(string_split(
             COALESCE({text_col}, ''), ' '))) AS term
    FROM ({src})
    WHERE {lat} IS NOT NULL AND {lon} IS NOT NULL
      AND NOT isnan({lat}) AND NOT isnan({lon})
      AND {bucket} IS NOT NULL AND {bucket} >= 0 AND {bucket} < {t}
  ) hits
  WHERE term != ''
  GROUP BY 1, 2, 3, 4
),
keys AS (
  SELECT cx, cy, term, CAST(SUM(n) AS BIGINT) AS n_total
  FROM cube GROUP BY 1, 2, 3
  HAVING CAST(SUM(n) AS BIGINT) >= {m}
),
spine AS (SELECT UNNEST(range({t})) AS b),
series AS (
  SELECT k.cx, k.cy, k.term, s.b, COALESCE(q.n, 0) AS n
  FROM keys k CROSS JOIN spine s
  LEFT JOIN cube q ON q.cx = k.cx AND q.cy = k.cy
    AND q.term = k.term AND q.b = s.b
),
scored AS (
  SELECT a.cx, a.cy, a.term,
         CAST(SUM(CASE WHEN j.n > a.n THEN 1
                       WHEN j.n < a.n THEN -1 ELSE 0 END) AS BIGINT) AS mk_s
  FROM series a JOIN series j
    ON j.cx = a.cx AND j.cy = a.cy AND j.term = a.term AND j.b > a.b
  GROUP BY 1, 2, 3
)
SELECT k.cx, k.cy, k.term, k.n_total, s.mk_s,
       CASE WHEN s.mk_s >= {h} THEN 'rising'
            WHEN s.mk_s <= {-h} THEN 'falling'
            ELSE 'flat' END AS trend
FROM keys k JOIN scored s
  ON s.cx = k.cx AND s.cy = k.cy AND s.term = k.term
"""
