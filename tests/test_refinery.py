"""corpus_refinery composition: every stage bites and invariants hold."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE


@pytest.mark.spark
def test_refinery_stages_bite_and_pack_is_consistent(spark):
    import __spark_entry__ as e

    rows = e.q_corpus_refinery(spark, SF_ORACLE).collect()
    n_in = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").count()
    assert 0 < len(rows) < n_in  # the chain filtered something

    # every survivor has valid packing coordinates; per (shard, bin,
    # offset) the stream reconstructs (same property as test_packing)
    by_shard = {}
    for r in rows:
        assert r["offset"] < e.REFINERY_BUDGET and r["bin"] >= 0
        by_shard.setdefault(r["shard"], []).append(r)
    for rs in by_shard.values():
        rs.sort(key=lambda r: (r["bin"], r["offset"]))
        cum = 0
        for r in rs:
            assert (r["bin"], r["offset"]) == (
                cum // e.REFINERY_BUDGET, cum % e.REFINERY_BUDGET
            )
            cum += r["n_tokens"]

    # host cap honored end-to-end
    per_host = {}
    for r in rows:
        per_host[r["host"]] = per_host.get(r["host"], 0) + 1
    assert max(per_host.values()) <= e.REFINERY_CAP
