"""Structured Streaming: incremental ingestion of web pages -> live zonal
rollups.

The reference is batch-only; its incremental seam is ``ScanFiles`` — rescan
just the changed files with injected scope (pkg/parser/scanner.go:224-270,
SURVEY.md §3.2). The Spark-native equivalent is a file-source stream over
the docs table directory: new parquet files are discovered incrementally,
flow through the SAME batch stages (G1 extract -> G2 geoparse -> G3 tiles),
and update per-cell rollups — one pipeline definition, two execution modes.

Two output modes:
  * ``foreachBatch`` (default): reuses the exact batch stages per
    micro-batch and MERGEs counts into a parquet ledger — at scale this is
    the Iceberg MERGE INTO pattern, and it keeps the batch/stream code paths
    literally the same functions (no divergence to golden-test twice).
    Every ledger twin delegates to ONE combinator (``stream_accumulate``)
    so the exactly-once discipline lives in exactly one place.
  * pure streaming agg: watermark on ``warc_ts`` + groupBy(cell) with
    update mode, for dashboards that tolerate late-data cutoff.

Late data: ``warc_ts`` watermark (crawl timestamps arrive hours late at
most); the zonal ledger is keyed by cell only, so late rows simply fold into
the next micro-batch's merge — counts stay exact without watermark loss.
"""

from __future__ import annotations

import os

from core_spark.functions.extract import with_extracted_text
from core_spark.functions.geoparse import with_mentions
from core_spark.operators.tiles import assign_tiles


# ---------------------------------------------------------------------------
# the one exactly-once ledger combinator + its readers
# ---------------------------------------------------------------------------

def stream_accumulate(
    spark,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    schema: str,
    batch_reducer=None,
    max_files_per_trigger: int = 16,
):
    """Generic exactly-once ledger: the pattern behind the zonal /
    curation / latest-snapshot twins, exposed as a combinator (and used
    by all of them — the discipline lives here once).

    Per micro-batch, optionally shrink the batch with ``batch_reducer``
    and write an overwrite-by-batch_id segment. ``batch_reducer`` must be
    a CONTRACTION for the resolver you intend to fold with: applying it
    batch-locally must not drop any row the global resolution over the
    full input would keep (max-by reductions, deterministic-hash-order
    top/cap cuts, and per-key aggregates all qualify; arbitrary filters
    that depend on global state do not). ``resolve_ledger`` then applies
    the SAME deterministic operator over the accumulated segments — at
    scale this is the MERGE INTO / compaction job, and no per-key state
    store ever grows unboundedly.
    """

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process_batch(batch_df, batch_id: int):
        out = batch_reducer(batch_df) if batch_reducer else batch_df
        out.write.mode("overwrite").parquet(f"{output_dir}/batch_id={batch_id}")

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _ledger_df(spark, output_dir: str):
    """Read the accumulated batch segments, or None when the stream
    produced ZERO batches (a legitimate steady state: availableNow over
    an empty input dir completes without running a micro-batch, so the
    ledger dir is never created)."""
    if not os.path.isdir(output_dir) or not any(
        name.startswith("batch_id=") for name in os.listdir(output_dir)
    ):
        return None
    return spark.read.option("basePath", output_dir).parquet(output_dir)


def resolve_ledger(spark, output_dir: str, resolver):
    """Fold the accumulated ledger with the same deterministic operator.

    Raises a clear error on a zero-batch ledger (the generic combinator
    cannot know the output schema to emit an empty result; the typed
    readers below can, and do)."""
    df = _ledger_df(spark, output_dir)
    if df is None:
        raise ValueError(
            f"ledger at {output_dir} has no batch segments yet "
            "(the stream produced zero batches)")
    return resolver(df.drop("batch_id"))


# ---------------------------------------------------------------------------
# zonal twin
# ---------------------------------------------------------------------------

def stream_zonal(
    spark,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    schema: str = "doc_id bigint, url string, warc_ts timestamp, html binary, lang string",
    zonal_res: int = 7,
    max_files_per_trigger: int = 16,
):
    """File-source stream -> extract -> mentions -> tiles -> per-cell counts.

    Returns the StreamingQuery. Exactly-once per micro-batch: the ledger
    write is idempotent on (batch_id) via overwrite-by-batch parquet dirs;
    the checkpoint dir makes file discovery resumable (G9 for streams —
    Spark's own WAL replaces our manifest here).
    """
    from pyspark.sql import functions as F

    def reduce_batch(batch_df):
        extracted = with_extracted_text(batch_df).filter(
            F.col("extract_error").isNull()
        )
        mentions = with_mentions(extracted, key_cols=("doc_id", "url", "lang"))
        tiled = assign_tiles(mentions, resolutions=(zonal_res,))
        return tiled.groupBy(f"h3_r{zonal_res}", "lang").agg(
            F.count("*").alias("n")
        )

    return stream_accumulate(
        spark, input_dir, checkpoint_dir, output_dir, schema,
        batch_reducer=reduce_batch,
        max_files_per_trigger=max_files_per_trigger,
    )


def read_zonal_ledger(spark, output_dir: str, zonal_res: int = 7):
    """Fold the per-batch ledger segments into current per-cell totals.
    A zero-batch ledger folds to an EMPTY rollup (typed), not an error."""
    from pyspark.sql import functions as F

    df = _ledger_df(spark, output_dir)
    if df is None:
        return spark.createDataFrame(
            [], f"h3_r{zonal_res} bigint, lang string, n bigint")
    return (
        df.groupBy(f"h3_r{zonal_res}", "lang")
        .agg(F.sum("n").alias("n"))
    )


def stream_zonal_agg(
    spark,
    input_dir: str,
    schema: str = "doc_id bigint, url string, warc_ts timestamp, html binary, lang string",
    zonal_res: int = 7,
    watermark: str = "2 hours",
):
    """Pure streaming aggregation variant: watermarked event-time windows.

    Demonstrates the native stateful path (update mode, state store); the
    foreachBatch ledger is preferred for exact counts at scale.
    """
    from pyspark.sql import functions as F

    stream = spark.readStream.schema(schema).parquet(input_dir)
    extracted = with_extracted_text(stream).filter(F.col("extract_error").isNull())
    mentions = with_mentions(extracted, key_cols=("doc_id", "url", "lang", "warc_ts"))
    tiled = assign_tiles(mentions, resolutions=(zonal_res,))
    return (
        tiled.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", "1 hour").alias("w"),
            F.col(f"h3_r{zonal_res}"),
        )
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# curation twin
# ---------------------------------------------------------------------------

def stream_curation(
    spark,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    schema: str = "doc_id bigint, text string",
    max_files_per_trigger: int = 16,
    lang: str | None = "en",
):
    """Streaming twin of the batch curation pass (q_corpus_curation): the
    per-document work — quality gate, language gate, fingerprint — runs in
    each micro-batch with the SAME Column emissions as batch; the ledger
    accumulates gated (doc_id, fingerprint) rows and the global min-id /
    dup-count resolution stays a ledger aggregation (global grouping is
    not a streaming concern — at scale this is the MERGE INTO or
    compaction job over the ledger table).

    Exactly-once per micro-batch via the shared ``stream_accumulate``
    combinator.
    """
    from pyspark.sql import functions as F

    from core_spark.functions.hexgrid import apply_steps
    from core_spark.functions.textstats import (
        lang_id_steps,
        spark_fingerprint,
        spark_quality_cols,
    )

    cols = spark_quality_cols("text")

    def reduce_batch(batch_df):
        gated = batch_df.selectExpr(
            "doc_id", "text",
            f"{cols['n_tokens']} AS n_tokens",
            f"{cols['alpha_ratio']} AS alpha_ratio",
            f"{cols['digit_ratio']} AS digit_ratio",
        ).filter(
            "n_tokens >= 5 AND alpha_ratio >= 0.5 AND digit_ratio <= 0.3"
        )
        if lang is not None:
            # Column equality, not string interpolation — a quote in `lang`
            # must compare falsely, never break the generated SQL. Stepwise
            # lang-id emission (codegen-safe; same rule as batch curation).
            gated = (
                apply_steps(gated, lang_id_steps("text"))
                .filter(F.col("lang_pred") == F.lit(lang))
                .drop("lang_pred")
            )
        return gated.selectExpr(
            "doc_id", f"{spark_fingerprint('text')} AS fp"
        )

    return stream_accumulate(
        spark, input_dir, checkpoint_dir, output_dir, schema,
        batch_reducer=reduce_batch,
        max_files_per_trigger=max_files_per_trigger,
    )


def curation_from_ledger(spark, output_dir: str):
    """Resolve the streamed ledger into representatives: min doc_id + dup
    count per fingerprint — identical output to the batch exact_dedup tail.
    A zero-batch ledger resolves to an EMPTY result (typed)."""
    from pyspark.sql import functions as F

    df = _ledger_df(spark, output_dir)
    if df is None:
        return spark.createDataFrame([], "doc_id bigint, dup_count bigint")
    return (
        df.groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("dup_count"))
        .select("doc_id", "dup_count")
    )


# ---------------------------------------------------------------------------
# latest-crawl twin
# ---------------------------------------------------------------------------

def stream_latest_snapshot(
    spark,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    schema: str = "doc_id bigint, url string, ts bigint",
    url_col: str = "url",
    ts_col: str = "ts",
    key: str = "doc_id",
    max_files_per_trigger: int = 16,
):
    """Streaming twin of ``weburl.latest_snapshot`` (latest-crawl-per-URL).

    The max-by-(ts, key) reduction is ASSOCIATIVE, so each micro-batch is
    reduced batch-locally with the SAME operator, the per-batch winners go
    to the ledger, and the global winner is the same operator over the
    ledger (``latest_from_ledger``) — no unbounded state store keyed by
    every URL ever crawled, which is what a native streaming
    dropDuplicates/flatMapGroupsWithState would accumulate. At scale the
    ledger fold is the MERGE INTO / compaction job. Exactly-once per
    micro-batch via the shared ``stream_accumulate`` combinator.

    PRECONDITION: ``(url, key)`` must be row-unique in the input.
    ``latest_snapshot``'s semi-join keeps EVERY row of the winning
    (url, key) pair; when the same pair appears at several timestamps
    split across micro-batches, the per-batch reduction has already
    dropped the non-max-ts copies, so stream and batch outputs diverge
    on exactly those duplicate rows. Crawl snapshots keyed by
    (url, fetch-id) satisfy the precondition by construction; dedupe
    first if yours don't.
    """
    from core_spark.operators.weburl import latest_snapshot

    return stream_accumulate(
        spark, input_dir, checkpoint_dir, output_dir, schema,
        batch_reducer=lambda b: latest_snapshot(b, url_col, ts_col, key),
        max_files_per_trigger=max_files_per_trigger,
    )


def latest_from_ledger(
    spark,
    output_dir: str,
    url_col: str = "url",
    ts_col: str = "ts",
    key: str = "doc_id",
):
    """Resolve the streamed ledger: the same associative reduction once
    more — identical rows to batch ``latest_snapshot`` over the full
    input (pytest-gated stream==batch; (url, key)-unique input, see
    ``stream_latest_snapshot``). Raises clearly on a zero-batch ledger
    (column types are caller-defined, so no typed empty exists here)."""
    from core_spark.operators.weburl import latest_snapshot

    df = _ledger_df(spark, output_dir)
    if df is None:
        raise ValueError(
            f"ledger at {output_dir} has no batch segments yet "
            "(the stream produced zero batches)")
    return latest_snapshot(
        df.drop("batch_id"), url_col, ts_col, key
    )
