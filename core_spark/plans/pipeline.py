"""The flagship pipeline: docs -> extract -> geoparse -> tile -> PIP -> zonal.

One function, ``run_pipeline``, wires every graft stage (SURVEY.md G1-G9)
through the checkpoint manifest so a killed run resumes at the first
incomplete stage with zero recomputation. Stage fingerprints chain — each
stage's fingerprint folds in its upstream's — so invalidating any input
re-runs exactly the suffix that depends on it.

Stage order follows the reference lifecycle (SURVEY.md §3.1: discover ->
detect -> parse -> extract -> aggregate) mapped to Spark:

    ingest   table scan (or synthetic generator at bench scale)
    extract  G1 mapInPandas html->text              [UDF stage 1]
    mentions G2 geoparse -> one row per coordinate   [UDF stage 2]
    tiles    G3 hx cells r5-r9 as pure Column arithmetic (no UDF)
    pip      G5 broadcast STRtree ray-cast join      [UDF stage 3]
    zonal    G7/G8 per-cell rollups, two-phase agg   (no UDF)

Cheap Column predicates (size caps, lang filters) run BEFORE UDF stages —
Catalyst can't push a filter through mapInPandas, so stage order is the
pushdown (SURVEY.md §4 'cheap predicate first').
"""

from __future__ import annotations

from core_spark.plans.manifest import StageManifest, content_fingerprint


def run_pipeline(
    spark,
    workdir: str,
    n_docs: int = 10_000,
    partitions: int = 32,
    resolutions: tuple[int, ...] = (5, 6, 7, 8, 9),
    zonal_res: int = 7,
    n_polygons: int = 96,
    docs_df=None,
):
    """Run (or resume) the full pipeline; returns {stage: DataFrame}.

    ``docs_df`` overrides the synthetic generator with a real table scan
    (must carry url, html; e.g. an Iceberg web-pages table).
    """
    from pyspark.sql import functions as F

    from core_spark.data.polygons import admin_polygons
    from core_spark.data.synth import webpages_spark
    from core_spark.functions.extract import with_extracted_text
    from core_spark.functions.geoparse import with_mentions
    from core_spark.operators.pip import pip_join
    from core_spark.operators.tiles import assign_tiles
    from core_spark.operators.zonal import zonal_rollup

    man = StageManifest(workdir)
    out = {}

    # -- ingest -------------------------------------------------------------
    fp_ingest = content_fingerprint("ingest", n_docs, partitions)
    if docs_df is None:
        out["ingest"] = man.run_stage(
            spark, "ingest", fp_ingest,
            lambda: webpages_spark(spark, n_docs, partitions).select(
                "doc_id", "url", "warc_ts", "html", "lang"
            ),
        )
    else:
        out["ingest"] = docs_df
        fp_ingest = content_fingerprint("ingest-external", str(docs_df.schema))

    # -- extract (G1) -------------------------------------------------------
    fp_extract = content_fingerprint("extract", fp_ingest)
    out["extract"] = man.run_stage(
        spark, "extract", fp_extract,
        lambda: with_extracted_text(out["ingest"]).select(
            "doc_id", "url", "warc_ts", "lang", "text", "extract_error"
        ),
    )

    # -- mentions (G2) ------------------------------------------------------
    fp_mentions = content_fingerprint("mentions", fp_extract)
    out["mentions"] = man.run_stage(
        spark, "mentions", fp_mentions,
        lambda: with_mentions(
            out["extract"].filter(F.col("extract_error").isNull()),
            key_cols=("doc_id", "url", "lang"),
        ),
    )

    # -- tiles (G3) ---------------------------------------------------------
    fp_tiles = content_fingerprint("tiles", fp_mentions, resolutions)
    out["tiles"] = man.run_stage(
        spark, "tiles", fp_tiles,
        lambda: assign_tiles(out["mentions"], resolutions=resolutions),
    )

    # -- pip (G5) -----------------------------------------------------------
    polys = admin_polygons(n_polygons)
    fp_pip = content_fingerprint("pip", fp_tiles, n_polygons)
    out["pip"] = man.run_stage(
        spark, "pip", fp_pip, lambda: pip_join(out["tiles"], polys)
    )

    # -- zonal (G7/G8) ------------------------------------------------------
    fp_zonal = content_fingerprint("zonal", fp_pip, zonal_res)
    out["zonal"] = man.run_stage(
        spark, "zonal", fp_zonal,
        lambda: zonal_rollup(out["pip"], cell_col=f"h3_r{zonal_res}"),
    )

    out["_manifest"] = man
    return out
