"""corpus_refinery composition: every stage bites and invariants hold."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE, SF_SMOKE


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


@pytest.mark.spark
def test_refinery_subdoc_chain(spark):
    """The round-5 sub-document chain (span dedup -> span decon ->
    mixture) composes: output strata only carry targeted langs, planted
    boilerplate never survives into the mixed corpus, and token counts
    reflect the CLEANED text."""
    import __spark_entry__ as entry

    out = entry.q_refinery_subdoc(spark, SF_SMOKE).toPandas()
    assert len(out) > 0
    assert set(out.lang) <= set(entry.MIXTURE_TARGETS)
    assert (out.n_tokens_clean >= 1).all()
    # boilerplate spans were removed before mixing: no kept doc's clean
    # token count exceeds its raw token count (removal only shrinks)
    docs = entry._docs(spark, SF_SMOKE, wide=False).selectExpr(
        "doc_id", f"size(split(trim({entry.SPAN_GEN_SQL}), ' ')) AS n_raw"
    ).toPandas().set_index("doc_id")
    merged = out.set_index("doc_id").join(docs)
    assert (merged.n_tokens_clean <= merged.n_raw).all()
    # docs that carried planted boilerplate (doc_id % 5 in {0,1,2}, not
    # the global first occurrences) lost tokens
    lost = merged[merged.index % 5 == 1]
    assert (lost.n_tokens_clean < lost.n_raw).mean() > 0.9
