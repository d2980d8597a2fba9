"""Sessionization: batch window variant vs DuckDB oracle, and the
applyInPandasWithState streaming variant vs the batch result."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from core_spark.streaming.sessions import (
    sessionize_batch,
    sessionize_stream,
    sql_sessionize,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.spark
class TestSessionizeBatch:
    def test_matches_duckdb_oracle(self, spark):
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        ev = spark.read.parquet(f"{SF}/events.parquet")
        got = (
            sessionize_batch(ev, gap_minutes=30)
            .orderBy("user_id", "session_start")
            .toPandas()
        )
        want = duckdb.sql(
            sql_sessionize(f"'{SF}/events.parquet'", 30)
            + " ORDER BY user_id, session_start"
        ).df()
        assert len(got) == len(want)
        assert got["user_id"].tolist() == want["user_id"].astype(int).tolist()
        assert got["n_events"].tolist() == want["n_events"].astype(int).tolist()
        assert got["session_start"].tolist() == want["session_start"].tolist()
        assert got["session_end"].tolist() == want["session_end"].tolist()

    def test_gap_semantics(self, spark):
        rows = [
            (1, "2024-01-01 00:00:00", 10, 1.0),
            (2, "2024-01-01 00:10:00", 10, 2.0),
            (3, "2024-01-01 01:10:00", 10, 3.0),  # > 30min gap -> new session
            (4, "2024-01-01 00:00:00", 20, 4.0),
        ]
        from datetime import datetime

        ev = spark.createDataFrame(
            [(i, datetime.fromisoformat(t), u, v) for i, t, u, v in rows],
            "event_id bigint, ts timestamp, user_id bigint, value double",
        )
        got = sessionize_batch(ev).orderBy("user_id", "session_start").collect()
        assert [(r.user_id, r.n_events, r.total_value) for r in got] == [
            (10, 2, 3.0),
            (10, 1, 3.0),
            (20, 1, 4.0),
        ]


@pytest.mark.spark
class TestSessionizeStream:
    def test_stream_closed_sessions_match_batch(self, spark, tmp_path):
        """Feed the events table as a file stream; every session the batch
        variant closes (has a successor event or watermark passes) must be
        emitted identically by the stateful stream."""
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        ev = spark.read.parquet(f"{SF}/events.parquet").select(
            "event_id", "ts", "user_id", "value"
        )
        src = str(tmp_path / "src")
        ev.coalesce(2).write.parquet(src)

        stream = spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, value double"
        ).parquet(src)
        q = (
            sessionize_stream(stream, gap_minutes=30, watermark="0 seconds")
            .writeStream.format("memory")
            .queryName("sessions_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = (
            spark.table("sessions_out")
            .orderBy("user_id", "session_start")
            .toPandas()
        )
        want = (
            sessionize_batch(ev, gap_minutes=30)
            .orderBy("user_id", "session_start")
            .toPandas()
        )
        # the stream can only emit sessions already closed by a successor or
        # by the final watermark; every emitted row must match the batch
        # result exactly
        assert len(got) > 0
        merged = got.merge(
            want,
            on=["user_id", "session_start", "session_end", "n_events"],
            how="left",
            indicator=True,
        )
        assert (merged["_merge"] == "both").all()
