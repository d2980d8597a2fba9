"""Per-cell distinctive terms: what is talked about WHERE.

The direct fusion of the engine's two axes — geospatial tiling and
webtext term statistics. Documents carry a position (geoparsed or
metadata); each grid cell's vocabulary is contrasted against the
corpus: terms that many of the CELL's documents contain but few
documents overall do. The regional-topic / local-news / place-name
surface — ``termstats.distinctive_terms`` with the grouping key moved
from the document to the map.

Ranking is integer-exact on purpose, the termstats.py stance: a float
``tf·ln(N/df)`` hangs correctness on libm; ``(cell_df DESC, df ASC,
term ASC)`` is monotone in local support for fixed rarity and in
rarity for fixed support — the ordering a lift score induces along
each axis — and every compared value is a BIGINT count.

Plan shape: one within-row ``array_distinct`` (tokens dedup before
anything shuffles) → explode to distinct (doc, cell, term) hits —
the hit table feeds BOTH aggregates (per-cell support and global df),
so it is eagerly pinned (CLAUDE.md rule) — then two uniform hash-aggs
and ONE term-keyed equi join (both sides are already term-level
aggregates: vocabulary-sized, uniform keys, map-side combined). The
per-cell top-k is a window row_number over (cell) — Spark rewrites
rank<=k into WindowGroupLimit, so only k rows per cell survive the
window shuffle. ``min_cell_df`` cuts singleton noise before the
window. A mega-cell (city) bounds its window partition by ITS
vocabulary, not the corpus.

The DuckDB twin deliberately derives the global df with a WINDOW over
the hit table instead of the join — a different plan gating the same
definition.

No reference counterpart; the statistic follows the public
regional-term literature (spatial tf-idf / "localness" scores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from core_spark.plans.materialize import pin


def geo_terms(
    df: DataFrame,
    cell_size: float,
    k: int,
    min_cell_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """(cell_i, cell_j, term, cell_df, df, rank): per-cell top-k terms
    by (cell_df DESC, df ASC, term ASC), rank 1-based; terms supported
    by fewer than ``min_cell_df`` docs in the cell are cut."""
    g = float(cell_size)
    if not g > 0:
        raise ValueError(f"cell_size must be > 0, got {cell_size}")
    if int(k) < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if int(min_cell_df) < 1:
        raise ValueError(f"min_cell_df must be >= 1, got {min_cell_df}")

    hits = pin(
        df.selectExpr(
            f"{id_col} AS _id",
            f"CAST(FLOOR(CAST({lat_col} AS DOUBLE) / {g!r}) AS BIGINT)"
            " AS cell_i",
            f"CAST(FLOOR(CAST({lon_col} AS DOUBLE) / {g!r}) AS BIGINT)"
            " AS cell_j",
            f"array_distinct(split(coalesce({text_col}, ''), ' '))"
            " AS _terms",
        )
        .where("cell_i IS NOT NULL AND cell_j IS NOT NULL")
        .selectExpr("_id", "cell_i", "cell_j", "explode(_terms) AS term")
        .where("term != ''")
    )
    cell_tf = (
        hits.groupBy("cell_i", "cell_j", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("cell_df"))
        .where(F.col("cell_df") >= int(min_cell_df))
    )
    gdf = hits.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"))
    w = Window.partitionBy("cell_i", "cell_j").orderBy(
        F.col("cell_df").desc(), F.col("df").asc(), F.col("term").asc())
    return (
        cell_tf.join(gdf, "term")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= int(k))
        .select("cell_i", "cell_j", "term", "cell_df", "df", "rank")
    )


def sql_geo_terms(
    docs_sql: str,
    cell_size: float,
    k: int,
    min_cell_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> str:
    """DuckDB oracle twin: global df via a WINDOW over the hit table
    (no term join) — a different plan for the same definition."""
    g = float(cell_size)
    return f"""
        WITH hits AS (
          SELECT DISTINCT {id_col} AS _id,
                 CAST(FLOOR(CAST({lat_col} AS DOUBLE) / {g!r}) AS BIGINT)
                   AS cell_i,
                 CAST(FLOOR(CAST({lon_col} AS DOUBLE) / {g!r}) AS BIGINT)
                   AS cell_j,
                 unnest(list_distinct(string_split(
                   COALESCE({text_col}, ''), ' '))) AS term
          FROM ({docs_sql}) src
          WHERE {lat_col} IS NOT NULL AND {lon_col} IS NOT NULL
        ),
        with_df AS (
          -- df on the RAW hit rows (one row per doc×term): the window
          -- must run BEFORE the cell grouping or it counts groups
          SELECT *, CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df
          FROM hits WHERE term != ''
        ),
        counted AS (
          SELECT cell_i, cell_j, term,
                 CAST(COUNT(*) AS BIGINT) AS cell_df,
                 MIN(df) AS df
          FROM with_df
          GROUP BY cell_i, cell_j, term
        )
        SELECT cell_i, cell_j, term, cell_df, df,
               CAST(rank AS BIGINT) AS rank
        FROM (
          SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY cell_i, cell_j
                   ORDER BY cell_df DESC, df ASC, term ASC) AS rank
          FROM counted WHERE cell_df >= {int(min_cell_df)}
        ) ranked
        WHERE rank <= {int(k)}
    """
