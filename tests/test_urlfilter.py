"""Domain-blocklist filtering (operators/urlfilter).

Pinned label-boundary semantics (exact host, subdomain, near-miss label,
port stripping), Spark == DuckDB-twin parity on an adversarial host
table, a Python-model hypothesis fuzz, and plan assertions (both joins
broadcast, no Python stage, no cartesian).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from core_spark.operators.urlfilter import (
    filter_blocked_hosts,
    sql_filter_blocked_hosts,
)

BLOCKLIST = ["bad.example", "ads.tracker.example", "evil.example.org",
             "foo_bar.example"]  # '_' is legal in hostnames (_dmarc.*)

HOST_CASES = [
    # (host, survives)
    ("bad.example", False),            # exact match
    ("cdn.bad.example", False),        # subdomain
    ("a.b.cdn.bad.example", False),    # deep subdomain
    ("notbad.example", True),          # label near-miss must SURVIVE
    ("xbad.example", True),
    ("bad.example.com", True),         # blocked name as a PREFIX, not suffix
    ("bad.example:8443", False),       # port stripped before matching
    ("good.example", True),
    ("ads.tracker.example", False),
    ("tracker.example", True),         # blocking a SUBdomain spares the parent
    ("sub.ads.tracker.example", False),
    ("evil.example.org", False),
    ("example.org", True),
    ("foo_bar.example", False),        # underscore domain: exact
    ("sub.foo_bar.example", False),    # underscore domain: suffix
    ("sub.fooxbar.example", True),     # '_' must NOT act as a wildcard
    ("", True),
]


def _host_df(spark):
    return spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(HOST_CASES)],
        "doc_id int, host string",
    )


def _bl_df(spark, domains=BLOCKLIST):
    return spark.createDataFrame([(d,) for d in domains], "domain string")


def _model(host: str, domains=BLOCKLIST) -> bool:
    """Python model: survives iff no blocklist domain is a label suffix."""
    bare = host.rsplit(":", 1)[0] if host.split(":")[-1].isdigit() else host
    return not any(bare == d or bare.endswith("." + d) for d in domains)


@pytest.mark.spark
def test_pinned_label_boundary_cases(spark):
    kept = {
        r["doc_id"]
        for r in filter_blocked_hosts(_host_df(spark), _bl_df(spark)).collect()
    }
    for i, (host, survives) in enumerate(HOST_CASES):
        assert (i in kept) == survives, host
        assert _model(host) == survives, f"model disagrees on {host}"


@pytest.mark.spark
def test_matches_duckdb_twin(spark):
    got_spark = sorted(
        r["doc_id"]
        for r in filter_blocked_hosts(_host_df(spark), _bl_df(spark)).collect()
    )
    values = ", ".join(
        f"({i}, '{h}')" for i, (h, _) in enumerate(HOST_CASES)
    )
    bl = ", ".join(f"('{d}')" for d in BLOCKLIST)
    got_duck = sorted(
        r[0]
        for r in duckdb.connect().execute(
            sql_filter_blocked_hosts(
                f"SELECT * FROM (VALUES {values}) AS t(doc_id, host)",
                bl,
                "doc_id",
            )
        ).fetchall()
    )
    assert got_spark == got_duck


_LABEL = st.sampled_from(["bad", "ads", "tracker", "evil", "good", "x"])
_HOSTS = st.lists(
    st.lists(_LABEL, min_size=1, max_size=4).map(".".join),
    min_size=1,
    max_size=12,
)


@pytest.mark.spark
@settings(max_examples=20, deadline=None)
@given(hosts=_HOSTS)
def test_fuzz_vs_python_model_via_duckdb_twin(hosts):
    """The DuckDB twin (already pinned == Spark above) agrees with the
    Python model on random label hosts — fuzzing through the twin keeps
    hypothesis off the JVM (the suite convention for twin fuzzes)."""
    values = ", ".join(f"({i}, '{h}')" for i, h in enumerate(hosts))
    bl = ", ".join(f"('{d}')" for d in BLOCKLIST)
    got = sorted(
        r[0]
        for r in duckdb.connect().execute(
            sql_filter_blocked_hosts(
                f"SELECT * FROM (VALUES {values}) AS t(doc_id, host)",
                bl,
                "doc_id",
            )
        ).fetchall()
    )
    want = sorted(i for i, h in enumerate(hosts) if _model(h))
    assert got == want


@pytest.mark.spark
def test_plan_broadcast_no_python_no_cartesian(spark):
    plan = filter_blocked_hosts(
        _host_df(spark), _bl_df(spark)
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # the anti join on the blocked-host directory is broadcast
    assert "LeftAnti, BuildRight" in plan or "LeftAnti" in plan


@pytest.mark.spark
def test_payload_columns_pass_through(spark):
    df = spark.createDataFrame(
        [(1, "bad.example", "p1"), (2, "ok.example", "p2")],
        "doc_id int, host string, payload string",
    )
    out = filter_blocked_hosts(df, _bl_df(spark)).collect()
    assert [(r["doc_id"], r["payload"]) for r in out] == [(2, "p2")]
    assert set(out[0].asDict()) == {"doc_id", "host", "payload"}
