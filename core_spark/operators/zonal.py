"""G7/G8 — zonal aggregation with explicit mega-cell skew handling.

Per-tile document count + language distribution (the north-star rollup,
BASELINE.json:6). Plain ``groupBy(cell)`` already gets map-side partial
aggregation from Spark's hash aggregate; the part that genuinely skews at
10^12 rows is building per-cell *collections* (the language map): a single
urban mega-cell can funnel 10^8 rows into one reducer task.

Strategy (SURVEY.md G8):
  1. first aggregate by (cell, lang) — two-phase by construction, partials
     combine map-side, so no single task ever sees a mega-cell's raw rows;
  2. then assemble the tiny (cell, lang, count) triples into a map per cell.
For the count-distinct-free metrics this is exact, shuffle-minimal, and
needs no sampling. An explicit salt stage (``salted_counts``) is provided
for aggregations that cannot be decomposed that way, with the salt derived
deterministically from the row key (never an RNG — resume-safe).

Zonal vectorize (raster -> vector): cell ids back to hex boundary polygons
via hexgrid.cell_to_boundary in an Arrow batch stage.

Reference analog: framework histogram + confidence distribution
(tests/integration/snapshot.go:44-47; pkg/parser/scanner.go:116-118).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from core_spark.functions import hexgrid as hx


def zonal_rollup(df, cell_col: str = "h3_r7", lang_col: str = "lang"):
    """Per-cell doc_count + lang_counts map. Exact, two-phase, skew-safe."""
    from pyspark.sql import functions as F

    per_lang = df.groupBy(cell_col, lang_col).agg(F.count("*").alias("n"))
    return (
        per_lang.groupBy(cell_col)
        .agg(
            F.sum("n").alias("doc_count"),
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct(lang_col, "n")))
            ).alias("lang_counts"),
        )
    )


def salted_counts(df, cell_col: str, salt_mod: int = 32, salt_src: str = "url"):
    """Two-phase count with an explicit deterministic salt.

    Phase 1 groups by (cell, salt) where salt = pmod(xxhash64(salt_src), m) —
    derived from row identity, so re-runs and resumes see identical salts.
    Phase 2 sums the ≤ m partials per cell. Use when a non-decomposable agg
    would otherwise concentrate a mega-cell on one task.
    """
    from pyspark.sql import functions as F

    partial = (
        df.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(salt_mod)))
        .groupBy(cell_col, "_salt")
        .agg(F.count("*").alias("n"))
    )
    return partial.groupBy(cell_col).agg(F.sum("n").alias("doc_count"))


def rasterize(spark, zonal_df, res: int, pixel_deg: float = 2.0,
              cell_col: str = "cell", value_col: str = "doc_count"):
    """Raster half of G7: per-cell aggregates -> a regular equirectangular
    pixel grid.

    Every pixel center is assigned its hex cell with the same JVM-side
    sql_cell arithmetic used for documents, then joined against the zonal
    aggregate — so raster pixels and document assignments can NEVER disagree
    (one shared cell function). Pixels whose cell has no documents carry 0.

    Pure Column arithmetic + one broadcast-able join: at production raster
    sizes (p=0.01 deg -> 648M pixels) the join key (cell id) is uniform and
    the zonal side is the small one.
    """
    from pyspark.sql import functions as F

    nx = int(round(360.0 / pixel_deg))
    ny = int(round(180.0 / pixel_deg))
    pixels = (
        spark.range(0, nx * ny)
        .selectExpr(
            f"CAST(id % {nx} AS BIGINT) AS ix",
            f"CAST(FLOOR(id / {nx}) AS BIGINT) AS iy",
        )
        .selectExpr(
            "ix",
            "iy",
            f"-180.0 + (ix + 0.5) * {pixel_deg!r} AS plon",
            f"-90.0 + (iy + 0.5) * {pixel_deg!r} AS plat",
        )
    )
    from core_spark.functions import hexgrid as hx

    pixels = hx.apply_steps(pixels, hx.cell_steps("plat", "plon", res, "pcell"))
    return (
        pixels.join(
            zonal_df.select(F.col(cell_col).alias("pcell"), F.col(value_col)),
            "pcell",
            "left",
        )
        .selectExpr("ix", "iy", f"COALESCE({value_col}, 0) AS {value_col}")
    )


BOUNDARY_SCHEMA = "cell bigint, boundary_wkt string"


def cells_to_boundaries(df, cell_col: str):
    """Vectorize: cell ids -> hex boundary polygons as WKT (Arrow stage)."""
    def run(batches):
        for pdf in batches:
            cells = pdf[cell_col].to_numpy(dtype=np.int64)
            wkts = []
            for c in cells:
                verts = hx.cell_to_boundary(int(c))
                ring = ", ".join(f"{lon:.9f} {lat:.9f}" for lat, lon in verts)
                first = verts[0]
                wkts.append(f"POLYGON (({ring}, {first[1]:.9f} {first[0]:.9f}))")
            yield pd.DataFrame({"cell": cells, "boundary_wkt": wkts})

    return df.select(df[cell_col].alias(cell_col)).distinct().mapInPandas(run, BOUNDARY_SCHEMA)
