"""URL canonicalization + per-host cap + latest-snapshot (operators/weburl).

The canonicalizer is pinned against a hand-written expected table (every
normalization rule and its non-firing twin); cap_per_host is checked for
exact per-host counts, branch coverage (over-cap hosts through the window,
under-cap hosts through the anti-join), and repartition stability;
latest_snapshot against a brute-force Python model including the tie-break.
"""

from __future__ import annotations

import pytest

from core_spark.operators.weburl import (
    canonicalize_url,
    cap_per_host,
    latest_snapshot,
)

CANON_CASES = [
    # (raw, host, url_canon)
    ("https://SITE3.Example.COM/a/7", "site3.example.com",
     "https://site3.example.com/a/7"),
    ("https://site.example.com:443/a/7/", "site.example.com",
     "https://site.example.com/a/7"),
    ("http://site.example.com:80/x", "site.example.com",
     "http://site.example.com/x"),
    # :80 is only default for http, :443 only for https
    ("https://site.example.com:80/x", "site.example.com:80",
     "https://site.example.com:80/x"),
    ("http://www.site.example.com/x?utm_source=feed", "site.example.com",
     "http://site.example.com/x"),
    ("https://h.example/a/index.html", "h.example", "https://h.example/a"),
    ("https://h.example/index.html", "h.example", "https://h.example/"),
    ("https://h.example:8443/a", "h.example:8443",
     "https://h.example:8443/a"),
    ("https://h.example/a?q=1&utm_campaign=x#frag", "h.example",
     "https://h.example/a?q=1"),
    ("http://h.example/a?utm_a=1&utm_b=2", "h.example",
     "http://h.example/a"),
    # tracking param in the middle: separators must heal
    ("http://h.example/a?x=1&utm_m=2&y=3", "h.example",
     "http://h.example/a?x=1&y=3"),
    ("https://H.Example/", "h.example", "https://h.example/"),
    ("https://h.example", "h.example", "https://h.example/"),
    # www only strips as a label prefix; wwwx stays
    ("https://wwwx.example/p", "wwwx.example", "https://wwwx.example/p"),
    # fragment containing a '?' must not resurrect a query
    ("https://h.example/p#frag?x=1", "h.example", "https://h.example/p"),
    # idempotence hazards: stacked www labels, stacked index.html,
    # doubled trailing slashes, dangling separators — all must reach the
    # fixpoint in ONE pass
    ("https://www.www.h.example/p", "h.example", "https://h.example/p"),
    ("https://h.example/a/index.html/index.html", "h.example",
     "https://h.example/a"),
    ("https://h.example/a//", "h.example", "https://h.example/a"),
    ("https://h.example//", "h.example", "https://h.example/"),
    ("http://h.example/a?x=1&", "h.example", "http://h.example/a?x=1"),
    ("http://h.example/a?utm_x=1&", "h.example", "http://h.example/a"),
    # near-miss param names: tracking names are anchored to a [?&]
    # separator, so params that merely CONTAIN a tracking name survive
    ("http://h.example/a?xfbclid=1", "h.example",
     "http://h.example/a?xfbclid=1"),
    ("http://h.example/a?last_utm_source=y", "h.example",
     "http://h.example/a?last_utm_source=y"),
    ("http://h.example/a?fbclid=1&xgclid=2", "h.example",
     "http://h.example/a?xgclid=2"),
    # consecutive tracking params: healed separators, no '&&' residue
    ("http://h.example/a?utm_a=1&fbclid=2&x=3", "h.example",
     "http://h.example/a?x=3"),
    ("http://h.example/a?utm_a=1&utm_b=2&c=3", "h.example",
     "http://h.example/a?c=3"),
]


@pytest.mark.spark
def test_canonicalize_pinned_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _, _) in enumerate(CANON_CASES)],
        "doc_id int, url string",
    )
    got = {
        r["doc_id"]: (r["host"], r["url_canon"])
        for r in canonicalize_url(df).collect()
    }
    for i, (raw, host, canon) in enumerate(CANON_CASES):
        assert got[i] == (host, canon), raw


@pytest.mark.spark
def test_canonicalize_matches_duckdb(spark):
    """Spark and DuckDB emit byte-identical host/url_canon per raw URL."""
    import duckdb

    from core_spark.operators.weburl import sql_canonicalize

    rows = [(i, raw) for i, (raw, _, _) in enumerate(CANON_CASES)]
    df = spark.createDataFrame(rows, "doc_id int, url string")
    got_spark = sorted(
        (r["doc_id"], r["host"], r["url_canon"])
        for r in canonicalize_url(df).collect()
    )
    con = duckdb.connect()
    values = ", ".join(f"({i}, '{raw}')" for i, raw in rows)
    got_duck = sorted(
        con.execute(
            "SELECT doc_id, host, url_canon FROM ("
            + sql_canonicalize(f"(SELECT * FROM (VALUES {values})"
                               " AS t(doc_id, url))")
            + ")"
        ).fetchall()
    )
    assert got_spark == got_duck


def _cap_input(spark, repartition=None):
    # host 'big' has 30 docs, 'mid' 10, 'tiny' 2 — cap 10 trims only 'big'
    rows = (
        [(i, "big") for i in range(30)]
        + [(100 + i, "mid") for i in range(10)]
        + [(200 + i, "tiny") for i in range(2)]
    )
    df = spark.createDataFrame(rows, "doc_id long, host string")
    return df.repartition(repartition) if repartition else df


@pytest.mark.spark
def test_cap_per_host_counts_and_stability(spark):
    kept = cap_per_host(_cap_input(spark), cap=10).collect()
    by_host = {}
    for r in kept:
        by_host.setdefault(r["host"], set()).add(r["doc_id"])
    assert len(by_host["big"]) == 10
    assert by_host["mid"] == {100 + i for i in range(10)}  # untouched
    assert by_host["tiny"] == {200, 201}
    # deterministic + repartition-stable: same kept set from 7 partitions
    kept2 = {
        (r["host"], r["doc_id"])
        for r in cap_per_host(_cap_input(spark, 7), cap=10).collect()
    }
    assert kept2 == {(r["host"], r["doc_id"]) for r in kept}


@pytest.mark.spark
def test_cap_per_host_preserves_columns(spark):
    df = spark.createDataFrame(
        [(1, "h", "x"), (2, "h", "y")], "doc_id long, host string, extra string"
    )
    out = cap_per_host(df, cap=5)
    assert set(out.columns) == {"doc_id", "host", "extra"}
    assert out.count() == 2


@pytest.mark.spark
def test_latest_snapshot_vs_python_model(spark):
    rows = [
        # (doc_id, url, ts): u1 latest is ts=9 (doc 2); u2 has a ts tie
        # (docs 11/12 both ts=5) -> max doc_id (12) wins
        (1, "u1", 3), (2, "u1", 9), (3, "u1", 7),
        (11, "u2", 5), (12, "u2", 5), (10, "u2", 1),
        (20, "u3", 4),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, ts long")
    got = sorted(
        (r["url"], r["doc_id"], r["ts"])
        for r in latest_snapshot(df, "url", "ts", "doc_id").collect()
    )
    best = {}
    for d, u, t in rows:
        if u not in best or (t, d) > (best[u][1], best[u][0]):
            best[u] = (d, t)
    want = sorted((u, d, t) for u, (d, t) in best.items())
    assert got == want


@pytest.mark.spark
def test_latest_snapshot_plan_has_no_window(spark):
    df = spark.createDataFrame(
        [(1, "u", 1)], "doc_id long, url string, ts long"
    )
    plan = latest_snapshot(df, "url", "ts", "doc_id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan  # agg + semi join, never a per-URL sort


@pytest.mark.spark
def test_gate_hosts_by_quality(spark):
    from core_spark.operators.weburl import gate_hosts_by_quality

    rows = [
        # goodhost: 20 stopwords / 100 tokens = 20% -> passes at 5%
        (1, "goodhost", 20, 100),
        (2, "goodhost", 0, 50),    # poor doc, but its HOST passes
        # badhost: 2 / 200 = 1% aggregate -> every doc dropped,
        # including the individually-plausible doc 4
        (3, "badhost", 0, 100),
        (4, "badhost", 2, 100),
        # edge: exactly at threshold (5 / 100 = 5%) is NOT below -> kept
        (5, "edgehost", 5, 100),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, host string, stop_n long, n_tokens long"
    )
    kept = {r["doc_id"] for r in gate_hosts_by_quality(df, 5).collect()}
    assert kept == {1, 2, 5}


@pytest.mark.spark
def test_gate_plan_broadcasts_bad_hosts(spark):
    from core_spark.operators.weburl import gate_hosts_by_quality

    df = spark.createDataFrame(
        [(1, "h", 1, 10)], "doc_id long, host string, stop_n long, n_tokens long"
    )
    plan = gate_hosts_by_quality(df, 5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
