"""§2.10: Structured Streaming incremental pipeline == batch pipeline.

The stream variant must produce exactly the batch rollup on the same input
(one pipeline definition, two execution modes — the reference's Scan vs
ScanFiles seam, pkg/parser/scanner.go:224-270).
"""

from __future__ import annotations

import pytest

from core_spark.data import synth


@pytest.mark.spark
class TestStreamingZonal:
    def test_stream_matches_batch(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from core_spark.functions.extract import with_extracted_text
        from core_spark.functions.geoparse import with_mentions
        from core_spark.operators.tiles import assign_tiles
        from core_spark.streaming.incremental import read_zonal_ledger, stream_zonal

        input_dir = str(tmp_path / "in")
        # three separate files -> three incremental discoveries
        for part in range(3):
            pdf = synth.webpages_pandas(100, start=part * 100)[
                ["doc_id", "url", "warc_ts", "html", "lang"]
            ]
            spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(input_dir)

        q = stream_zonal(
            spark,
            input_dir,
            checkpoint_dir=str(tmp_path / "ckpt"),
            output_dir=str(tmp_path / "ledger"),
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)

        got = (
            read_zonal_ledger(spark, str(tmp_path / "ledger"))
            .orderBy("h3_r7", "lang")
            .collect()
        )

        batch = spark.read.parquet(input_dir)
        extracted = with_extracted_text(batch).filter(F.col("extract_error").isNull())
        mentions = with_mentions(extracted, key_cols=("doc_id", "url", "lang"))
        tiled = assign_tiles(mentions, resolutions=(7,))
        want = (
            tiled.groupBy("h3_r7", "lang")
            .agg(F.count("*").alias("n"))
            .orderBy("h3_r7", "lang")
            .collect()
        )
        assert len(got) > 0
        assert got == want

    def test_stream_resume_is_incremental(self, spark, tmp_path):
        """New files after a completed run are picked up without reprocessing
        old ones (checkpointed file index — the stream analog of G9)."""
        import glob

        from core_spark.streaming.incremental import read_zonal_ledger, stream_zonal

        input_dir = str(tmp_path / "in")
        pdf = synth.webpages_pandas(100)[["doc_id", "url", "warc_ts", "html", "lang"]]
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(input_dir)

        kwargs = dict(
            checkpoint_dir=str(tmp_path / "ckpt"), output_dir=str(tmp_path / "ledger")
        )
        stream_zonal(spark, input_dir, **kwargs).awaitTermination(120)
        n_first = read_zonal_ledger(spark, str(tmp_path / "ledger")).agg({"n": "sum"}).collect()[0][0]
        batches_first = len(glob.glob(str(tmp_path / "ledger" / "batch_id=*")))

        pdf2 = synth.webpages_pandas(50, start=1000)[["doc_id", "url", "warc_ts", "html", "lang"]]
        spark.createDataFrame(pdf2).coalesce(1).write.mode("append").parquet(input_dir)
        stream_zonal(spark, input_dir, **kwargs).awaitTermination(120)

        n_second = read_zonal_ledger(spark, str(tmp_path / "ledger")).agg({"n": "sum"}).collect()[0][0]
        batches_second = len(glob.glob(str(tmp_path / "ledger" / "batch_id=*")))
        assert n_second > n_first           # new rows arrived
        assert batches_second > batches_first  # as a NEW batch segment only


@pytest.mark.spark
class TestStreamCuration:
    def test_stream_curation_matches_batch(self, spark, tmp_path):
        """The streaming curation ledger resolves to EXACTLY the batch
        curation output (same gates, same fingerprints, same
        representatives) — one pipeline definition, two execution modes."""
        from core_spark.streaming.incremental import (
            curation_from_ledger,
            stream_curation,
        )

        input_dir = str(tmp_path / "in")
        for part in range(3):
            pdf = synth.webpages_pandas(100, start=part * 100)[["doc_id", "text"]]
            spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(input_dir)

        # lang=None: the synthetic corpus text carries coordinates, not
        # natural language, so the en-marker gate would empty it — the
        # quality gates + fingerprint path is what this test pins
        q = stream_curation(
            spark,
            input_dir,
            checkpoint_dir=str(tmp_path / "ckpt"),
            output_dir=str(tmp_path / "ledger"),
            max_files_per_trigger=1,
            lang=None,
        )
        q.awaitTermination(120)

        got = sorted(
            (r.doc_id, r.dup_count)
            for r in curation_from_ledger(spark, str(tmp_path / "ledger")).collect()
        )

        # batch twin: same gates + exact_dedup over the full input
        from core_spark.functions.textstats import spark_quality_cols
        from core_spark.operators import dedup as dd

        cols = spark_quality_cols("text")
        batch = spark.read.parquet(input_dir).selectExpr(
            "doc_id", "text",
            f"{cols['n_tokens']} AS n_tokens",
            f"{cols['alpha_ratio']} AS alpha_ratio",
            f"{cols['digit_ratio']} AS digit_ratio",
        ).filter(
            "n_tokens >= 5 AND alpha_ratio >= 0.5 AND digit_ratio <= 0.3"
        )
        want = sorted(
            (r.doc_id, r.dup_count) for r in dd.exact_dedup(batch).collect()
        )
        assert len(got) > 0
        assert got == want

    def test_stream_latest_snapshot_matches_batch(self, spark, tmp_path):
        """The streamed latest-crawl ledger resolves to EXACTLY the batch
        latest_snapshot rows — the reduction is associative, so batch-local
        winners + one ledger fold equal the global winner, even when a
        URL's recrawls are split across micro-batches."""
        from core_spark.operators.weburl import latest_snapshot
        from core_spark.streaming.incremental import (
            latest_from_ledger,
            stream_latest_snapshot,
        )

        input_dir = str(tmp_path / "in")
        # 3 files -> 3 micro-batches; url = doc_id // 4 spreads each URL's
        # recrawls ACROSS files (doc_ids interleaved mod 3)
        rows = [
            (d, f"u{d // 4}", 1000 + (d * 37) % 50) for d in range(120)
        ]
        for part in range(3):
            chunk = [r for r in rows if r[0] % 3 == part]
            spark.createDataFrame(
                chunk, "doc_id long, url string, ts long"
            ).coalesce(1).write.mode("append").parquet(input_dir)

        q = stream_latest_snapshot(
            spark,
            input_dir,
            checkpoint_dir=str(tmp_path / "ckpt"),
            output_dir=str(tmp_path / "ledger"),
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)

        got = sorted(
            map(tuple, latest_from_ledger(spark, str(tmp_path / "ledger"))
                .select("doc_id", "url", "ts").collect())
        )
        want = sorted(
            map(tuple, latest_snapshot(
                spark.read.parquet(input_dir), "url", "ts", "doc_id"
            ).select("doc_id", "url", "ts").collect())
        )
        assert len(got) == 30  # 120 docs / 4 recrawls per url
        assert got == want

    def test_stream_host_cap_matches_batch(self, spark, tmp_path):
        """Per-host caps via the generic ledger: capping each micro-batch
        locally is a contraction (the global hash-order winners are each
        batch-locally among the smallest), so resolving the ledger with
        the SAME operator equals the batch answer over the full input —
        even when a host's docs are spread across micro-batches."""
        from core_spark.operators.weburl import cap_per_host
        from core_spark.streaming.incremental import (
            resolve_ledger,
            stream_accumulate,
        )

        input_dir = str(tmp_path / "in")
        rows = [(d, f"h{d % 5}") for d in range(90)]  # 18 docs/host
        for part in range(3):
            chunk = [r for r in rows if r[0] % 3 == part]
            spark.createDataFrame(
                chunk, "doc_id long, host string"
            ).coalesce(1).write.mode("append").parquet(input_dir)

        q = stream_accumulate(
            spark,
            input_dir,
            checkpoint_dir=str(tmp_path / "ckpt"),
            output_dir=str(tmp_path / "ledger"),
            schema="doc_id long, host string",
            batch_reducer=lambda df: cap_per_host(df, cap=7),
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)

        got = sorted(
            (r["host"], r["doc_id"])
            for r in resolve_ledger(
                spark, str(tmp_path / "ledger"),
                lambda df: cap_per_host(df, cap=7),
            ).collect()
        )
        want = sorted(
            (r["host"], r["doc_id"])
            for r in cap_per_host(
                spark.read.parquet(input_dir), cap=7
            ).collect()
        )
        assert len(got) == 35  # 5 hosts x cap 7
        assert got == want


class TestStreamSubdocDedup:
    def test_stream_paragraph_and_span_dedup_match_batch(self, spark, tmp_path):
        """Sub-document dedup twins via the generic ledger: paragraphs /
        spans must dedup against the WHOLE accumulated corpus, so the
        batch_reducer is identity (a batch-local dedup is NOT a
        contraction — it would reassemble per-doc text before global
        winners are known and change tokenization); the resolver applies
        the full operator over the ledger. Cross-batch duplicates are
        the interesting case: the boilerplate lands in micro-batches 0,
        1 and 2, and only its globally-first occurrence survives."""
        from core_spark.operators.paradedup import (
            dedup_paragraphs, paragraphs_expr, tokens_expr,
        )
        from core_spark.operators.spandedup import dedup_substrings
        from core_spark.streaming.incremental import (
            resolve_ledger,
            stream_accumulate,
        )

        boiler = "all rights reserved contact us for details now"
        rows = [
            (d, (f"u{d} v{d} {boiler} w{d}" if d % 3 == 0
                 else f"unique text number {d} with words {d}"))
            for d in range(30)
        ]
        input_dir = str(tmp_path / "in")
        for part in range(3):  # batch p carries docs d % 3 == p shapes
            chunk = [r for r in rows if r[0] % 3 == part]
            spark.createDataFrame(
                chunk, "doc_id long, text string"
            ).coalesce(1).write.mode("append").parquet(input_dir)

        q = stream_accumulate(
            spark,
            input_dir,
            checkpoint_dir=str(tmp_path / "ckpt"),
            output_dir=str(tmp_path / "ledger"),
            schema="doc_id long, text string",
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)

        def paras(df):
            return df.selectExpr(
                "doc_id", f"{tokens_expr('text', 'spark')} AS _toks"
            ).selectExpr(
                "doc_id", f"{paragraphs_expr('_toks', 4, 'spark')} AS paras"
            )

        for name, op in (
            ("paragraph", lambda df: dedup_paragraphs(paras(df))),
            ("span", lambda df: dedup_substrings(df, 4)),
        ):
            got = sorted(
                map(tuple,
                    resolve_ledger(spark, str(tmp_path / "ledger"), op)
                    .collect())
            )
            want = sorted(
                map(tuple, op(spark.read.parquet(input_dir)).collect())
            )
            assert got == want, name
        # cross-batch: docs 0,3,...,27 share the boilerplate; with the
        # stream's arrival order the winner is doc 0 and the other nine
        # boilerplate carriers each lose exactly one span
        span = {
            r["doc_id"]: r["n_removed"]
            for r in resolve_ledger(
                spark, str(tmp_path / "ledger"),
                lambda df: dedup_substrings(df, 4),
            ).collect()
        }
        assert span[0] == 0
        losers = [d for d in range(3, 30, 3)]
        assert all(span[d] >= 8 for d in losers)  # the 8-token boilerplate


@pytest.mark.spark
class TestStreamZonalAgg:
    def test_watermarked_window_agg_matches_batch(self, spark, tmp_path):
        """The PURE streaming path (withWatermark + event-time windows +
        state store, no foreachBatch) produces exactly the batch
        windowed rollup on the same input — the native stateful-agg
        twin of the ledger variant above."""
        from pyspark.sql import functions as F

        from core_spark.functions.extract import with_extracted_text
        from core_spark.functions.geoparse import with_mentions
        from core_spark.operators.tiles import assign_tiles
        from core_spark.streaming.incremental import stream_zonal_agg

        input_dir = str(tmp_path / "in")
        for part in range(2):
            pdf = synth.webpages_pandas(80, start=part * 80)[
                ["doc_id", "url", "warc_ts", "html", "lang"]
            ]
            spark.createDataFrame(pdf).coalesce(1).write.mode(
                "append"
            ).parquet(input_dir)

        agg = stream_zonal_agg(spark, input_dir)
        q = (
            agg.writeStream.format("memory")
            .queryName("zagg")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            (r["w"]["start"], r["h3_r7"], r["n"])
            for r in spark.sql("SELECT * FROM zagg").collect()
        )

        batch = spark.read.parquet(input_dir)
        extracted = with_extracted_text(batch).filter(
            F.col("extract_error").isNull()
        )
        mentions = with_mentions(
            extracted, key_cols=("doc_id", "url", "lang", "warc_ts")
        )
        tiled = assign_tiles(mentions, resolutions=(7,))
        want = sorted(
            (r["w"]["start"], r["h3_r7"], r["n"])
            for r in tiled.groupBy(
                F.window("warc_ts", "1 hour").alias("w"), "h3_r7"
            ).agg(F.count("*").alias("n")).collect()
        )
        assert len(got) > 0
        assert got == want


class TestStreamCleaningRules:
    def test_stream_c4_gopher_flags_match_batch(self, spark, tmp_path):
        """The round-5 cleaning layer (C4 rules + Gopher gates) is pure
        row-local work, so it streams through the generic ledger
        combinator unchanged: per-micro-batch application is trivially a
        contraction (identity resolver), and the resolved ledger must
        equal the one-shot batch application row for row."""
        from core_spark.operators.c4clean import c4_clean
        from core_spark.operators.gopherrules import gopher_gate
        from core_spark.streaming.incremental import (
            resolve_ledger,
            stream_accumulate,
        )

        pages = [
            (i, t)
            for i, t in enumerate(
                [
                    "Good sentence number %d sits right here.\n"
                    "Another full sentence lands right here!\n"
                    "A third one with the and that here?\n"
                    "Fourth keeps the page alive today.\n"
                    "Fifth closes it out for good." % i
                    for i in range(30)
                ]
                + ["lorem ipsum dolor sit amet page.", "", "short one."]
            )
        ]
        input_dir = str(tmp_path / "in")
        for part in range(3):
            chunk = pages[part * 11 : (part + 1) * 11]
            spark.createDataFrame(
                chunk, "doc_id long, text string"
            ).coalesce(1).write.mode("append").parquet(input_dir)

        def stage(df):
            return gopher_gate(c4_clean(df), "c4_clean").select(
                "doc_id", "c4_kept", "gopher_kept", "c4_clean"
            )

        q = stream_accumulate(
            spark,
            input_dir,
            checkpoint_dir=str(tmp_path / "ckpt"),
            output_dir=str(tmp_path / "ledger"),
            schema="doc_id long, text string",
            batch_reducer=stage,
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)

        got = sorted(
            tuple(r)
            for r in resolve_ledger(
                spark, str(tmp_path / "ledger"), lambda df: df
            ).collect()
        )
        want = sorted(
            tuple(r)
            for r in stage(spark.read.parquet(input_dir)).collect()
        )
        assert len(got) == len(pages)
        assert got == want


class TestStreamHLL:
    def test_stream_hll_sketch_matches_batch(self, spark, tmp_path):
        """HLL via the generic ledger: the batch_reducer emits register
        PARTIALS (per-(group,bucket) MAX + count — a genuine contraction:
        re-applying the same hash-agg over unioned partials IS the merge),
        so each micro-batch ships at most m rows per group instead of its
        raw keys; the resolver folds partials and rolls up the sketch.
        Stream output == one-shot batch sketch, column for column."""
        from core_spark.operators.cardsketch import (
            hll_partials, hll_sketch, hll_sketch_from_partials,
            merge_hll_partials,
        )
        from core_spark.streaming.incremental import (
            resolve_ledger, stream_accumulate,
        )

        input_dir = str(tmp_path / "in")
        rows = [(d, f"g{d % 2}", f"key{d % 371}") for d in range(900)]
        for part in range(3):
            chunk = [r for r in rows if r[0] % 3 == part]
            spark.createDataFrame(
                chunk, "doc_id long, lang string, k string"
            ).coalesce(1).write.mode("append").parquet(input_dir)

        q = stream_accumulate(
            spark,
            input_dir,
            checkpoint_dir=str(tmp_path / "ckpt"),
            output_dir=str(tmp_path / "ledger"),
            schema="doc_id long, lang string, k string",
            batch_reducer=lambda df: hll_partials(df, "lang", "k"),
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)

        got = sorted(
            tuple(r) for r in resolve_ledger(
                spark, str(tmp_path / "ledger"),
                lambda df: hll_sketch_from_partials(
                    merge_hll_partials(df, "lang"), "lang"),
            ).collect()
        )
        want = sorted(
            tuple(r) for r in hll_sketch(
                spark.read.parquet(input_dir), "lang", "k"
            ).collect()
        )
        assert got == want and len(got) == 2

    def test_stream_cms_sketch_matches_batch(self, spark, tmp_path):
        """Count-Min via the generic ledger: the batch_reducer emits the
        per-batch counter grid (≤ d·w rows per micro-batch — a genuine
        contraction: merge_cms IS the same groupBy-SUM re-applied), the
        resolver folds cells by addition. Stream state == one-shot batch
        sketch, cell for cell — the CMS mergeability contract end-to-end
        through the streaming path."""
        from core_spark.operators.cmsketch import cms_counters, merge_cms
        from core_spark.streaming.incremental import (
            resolve_ledger, stream_accumulate,
        )

        input_dir = str(tmp_path / "in")
        rows = [(d, f"h{d % 37}") for d in range(600)]
        for part in range(3):
            chunk = [r for r in rows if r[0] % 3 == part]
            spark.createDataFrame(
                chunk, "doc_id long, host string"
            ).coalesce(1).write.mode("append").parquet(input_dir)

        q = stream_accumulate(
            spark,
            input_dir,
            checkpoint_dir=str(tmp_path / "ckpt"),
            output_dir=str(tmp_path / "ledger"),
            schema="doc_id long, host string",
            batch_reducer=lambda df: cms_counters(df, "host", d=3, w=64),
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)

        got = sorted(
            tuple(r) for r in resolve_ledger(
                spark, str(tmp_path / "ledger"),
                lambda df: merge_cms(df.select("r", "c", "cnt")),
            ).collect()
        )
        want = sorted(
            tuple(r) for r in cms_counters(
                spark.read.parquet(input_dir), "host", d=3, w=64
            ).collect()
        )
        assert got == want and len(got) > 0

    def test_zero_batch_ledger_is_a_steady_state(self, spark, tmp_path):
        """A stream over an EMPTY input dir completes without running a
        micro-batch, so the ledger dir never exists. Typed readers fold
        that to an empty result; the generic resolver (whose output
        schema is caller-defined) raises a clear error instead of an
        opaque AnalysisException."""
        import os

        import pytest as _pytest

        from core_spark.streaming.incremental import (
            curation_from_ledger, latest_from_ledger, read_zonal_ledger,
            resolve_ledger, stream_curation,
        )

        input_dir = str(tmp_path / "in")
        os.makedirs(input_dir, exist_ok=True)  # zero parquet files
        ledger = str(tmp_path / "ledger")
        q = stream_curation(
            spark, input_dir,
            checkpoint_dir=str(tmp_path / "ckpt"),
            output_dir=ledger,
        )
        q.awaitTermination(120)

        zonal = read_zonal_ledger(spark, ledger)
        assert zonal.count() == 0
        assert [f.name for f in zonal.schema.fields] == ["h3_r7", "lang", "n"]
        cur = curation_from_ledger(spark, ledger)
        assert cur.count() == 0
        assert [f.name for f in cur.schema.fields] == ["doc_id", "dup_count"]
        with _pytest.raises(ValueError, match="zero batches"):
            latest_from_ledger(spark, ledger)
        with _pytest.raises(ValueError, match="zero batches"):
            resolve_ledger(spark, ledger, lambda df: df)


@pytest.mark.spark
class TestStreamingPercolation:
    def test_stream_routing_matches_batch(self, spark, tmp_path):
        """route_queries is a pure map+explode (stateless), so the
        streaming twin is foreachBatch-free: readStream -> the SAME
        operator -> append sink, no watermark, no state. Stream output
        over 3 incremental files == one-shot batch routing, and the
        registry veto must fire identically across file boundaries."""
        from core_spark.operators.percolate import route_queries

        queries = [
            ("q_spark", ["spark", "window"], []),
            ("q_sort", ["sort", "merge"], ["slow"]),
        ]
        rows = [
            (1, "spark window sort merge"),
            (2, "spark sort slow merge"),
            (3, "window spark"),
            (4, "sort merge"),
            (5, "sort"),
            (6, None),
        ]
        input_dir = str(tmp_path / "in")
        for i, (d, t) in enumerate(rows):
            spark.createDataFrame([(d, t)], "doc_id long, text string") \
                .coalesce(1).write.mode("append").parquet(input_dir)

        out_dir = str(tmp_path / "routed")
        stream = spark.readStream.schema("doc_id long, text string") \
            .option("maxFilesPerTrigger", 1).parquet(input_dir)
        q = (
            route_queries(stream, queries)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        got = {
            (r["doc_id"], r["query_name"])
            for r in spark.read.parquet(out_dir).collect()
        }
        batch = spark.read.parquet(input_dir)
        want = {
            (r["doc_id"], r["query_name"])
            for r in route_queries(batch, queries).collect()
        }
        assert got == want
        assert (1, "q_sort") in got and (2, "q_sort") not in got


class TestStreamDecayAndCdc:
    def test_stream_decayed_counts_match_batch(self, spark, tmp_path):
        """Decayed counters via the generic ledger: at a PINNED horizon
        the state is a plain per-key SUM of bit-shift weights, so the
        batch_reducer (per-batch decayed partials, ≤ |keys| rows per
        micro-batch — a true contraction) folds by addition. Stream
        state == the one-shot batch sketch, scaled cell for cell."""
        from pyspark.sql import functions as F

        from core_spark.operators.decay import decayed_counts
        from core_spark.streaming.incremental import (
            resolve_ledger, stream_accumulate,
        )

        input_dir = str(tmp_path / "in")
        rows = [("k%d" % (i % 4), i % 13, (i * 7) % 5 + 1)
                for i in range(300)]
        for part in range(3):
            chunk = [r for r in rows if hash(r) % 3 == part] or rows[:1]
            spark.createDataFrame(
                chunk, "k string, t long, x long"
            ).coalesce(1).write.mode("append").parquet(input_dir)

        HZ, HL = 12, 3

        q = stream_accumulate(
            spark,
            input_dir,
            checkpoint_dir=str(tmp_path / "ckpt"),
            output_dir=str(tmp_path / "ledger"),
            schema="k string, t long, x long",
            batch_reducer=lambda df: decayed_counts(
                df, halflife=HL, horizon=HZ
            ).select("k", "decayed_scaled", "n"),
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)

        got = sorted(
            tuple(r) for r in resolve_ledger(
                spark, str(tmp_path / "ledger"),
                lambda df: df.groupBy("k").agg(
                    F.expr("CAST(SUM(decayed_scaled) AS BIGINT)")
                    .alias("decayed_scaled"),
                    F.expr("CAST(SUM(n) AS BIGINT)").alias("n"),
                ),
            ).collect()
        )
        want = sorted(
            (r.k, r.decayed_scaled, r.n)
            for r in decayed_counts(
                spark.read.parquet(input_dir), halflife=HL, horizon=HZ
            ).collect()
        )
        assert got == want and len(got) == 4

    def test_stream_cdc_state_matches_batch(self, spark, tmp_path):
        """CDC via the generic ledger: collapse_changes is seq- and
        schema-preserving, hence ASSOCIATIVE — batch-local winners
        re-collapsed over the ledger equal the global collapse, so the
        resolved stream state merged into base equals the one-shot
        cdc_merge over the full changelog. Cross-batch precedence is
        real: later batches carry higher seqs that override earlier
        winners, and a final D erases a key an early batch inserted."""
        from core_spark.operators.cdc import cdc_merge, collapse_changes
        from core_spark.streaming.incremental import (
            resolve_ledger, stream_accumulate,
        )

        input_dir = str(tmp_path / "in")
        batches = [
            [(1, "I", 10, 100), (2, "I", 11, 200), (3, "I", 12, 300)],
            [(2, "U", 20, 201), (3, "D", 21, None), (4, "I", 22, 400)],
            [(3, "I", 30, 301), (1, "D", 31, None)],
        ]
        for chunk in batches:
            spark.createDataFrame(
                chunk, "key long, op string, seq long, val long"
            ).coalesce(1).write.mode("append").parquet(input_dir)

        q = stream_accumulate(
            spark,
            input_dir,
            checkpoint_dir=str(tmp_path / "ckpt"),
            output_dir=str(tmp_path / "ledger"),
            schema="key long, op string, seq long, val long",
            batch_reducer=collapse_changes,
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)

        base = spark.createDataFrame(
            [(2, 2000), (5, 500)], "key long, val long")
        got = sorted(
            (r.key, r.val) for r in cdc_merge(
                base,
                resolve_ledger(
                    spark, str(tmp_path / "ledger"), collapse_changes),
            ).collect()
        )
        want = sorted(
            (r.key, r.val) for r in cdc_merge(
                base, spark.read.parquet(input_dir)
            ).collect()
        )
        assert got == want
        # the semantics themselves: 3 revived by seq 30, 1 deleted
        assert got == [(2, 201), (3, 301), (4, 400), (5, 500)]
