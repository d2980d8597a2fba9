"""Stream-stream time-interval self-join: cross-batch contacts equal
the batch operator exactly; validation hygiene."""

from __future__ import annotations

import datetime

import pytest

from core_spark.operators.stjoin import contact_pairs
from core_spark.streaming.stcontacts import stream_contacts

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _ts(s):
    return T0 + datetime.timedelta(seconds=s)


def test_cross_batch_contacts_match_batch_exactly(spark, tmp_path):
    # three files -> three micro-batches (maxFilesPerTrigger=1); every
    # contact pair SPANS batches, so join state is what's under test
    batches = [
        [(0, 0, 0, _ts(0)), (1, 10, 10, _ts(1))],
        [(2, 1, 1, _ts(3)), (3, 10, 11, _ts(100))],   # (0,2) cross-batch
        [(4, 0, 1, _ts(5)), (5, 50, 50, _ts(6))],     # (0,4), (2,4)
    ]
    for rows in batches:
        spark.createDataFrame(
            rows, "event_id long, x long, y long, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(str(tmp_path / "in"))

    q = stream_contacts(
        spark, str(tmp_path / "in"), str(tmp_path / "ckpt"),
        str(tmp_path / "out"), eps=3, tau_seconds=10,
    )
    q.awaitTermination(180)
    got = sorted(
        (r["a"], r["b"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )

    allrows = [
        (e, x, y, int((t - T0).total_seconds()))
        for b in batches for (e, x, y, t) in b
    ]
    bdf = spark.createDataFrame(allrows, "event_id long, x long, y long, t long")
    want = sorted(
        (r["a"], r["b"]) for r in contact_pairs(bdf, 3, 10).collect()
    )
    assert got == want == [(0, 2), (0, 4), (2, 4)]
    # (1,3) near in space (dist 1) but 99s apart -> correctly absent


def test_validation(spark, tmp_path):
    with pytest.raises(ValueError):
        stream_contacts(spark, "x", "c", "o", eps=0, tau_seconds=5)
    with pytest.raises(ValueError):
        stream_contacts(spark, "x", "c", "o", eps=3, tau_seconds=0)
