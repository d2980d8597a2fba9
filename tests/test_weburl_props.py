"""Property tests for URL canonicalization (operators/weburl.py).

Hypothesis drives the DuckDB side of the dialect-shared spec (millisecond
per example — no JVM); Spark↔DuckDB byte parity on the same spec is pinned
separately in test_weburl.py, so a DuckDB-proved property holds for Spark.

Properties:
- idempotence: canonicalize(url_canon) == url_canon (every rule strips all
  repetitions in one pass);
- host is lowercase and never keeps a leading www label;
- canonical URLs never carry fragments, tracking params, or dangling ?/&.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from core_spark.operators.weburl import sql_canonicalize

_LABEL = st.from_regex(r"[A-Za-z]([A-Za-z0-9-]{0,6}[A-Za-z0-9])?",
                       fullmatch=True)
_SEG = st.from_regex(r"[A-Za-z0-9._~-]{1,8}", fullmatch=True)
_KEY = st.one_of(
    st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,6}", fullmatch=True),
    st.sampled_from(["utm_source", "utm_campaign", "utm_a", "fbclid",
                     "gclid",
                     # near-misses: contain a tracking name but are NOT
                     # tracking params (must survive canonicalization)
                     "xfbclid", "last_utm_source", "xgclid", "agclid"]),
)

_TRACKING = ("fbclid", "gclid")


def _is_tracking(k: str) -> bool:
    return k.startswith("utm_") or k in _TRACKING


@st.composite
def urls(draw) -> str:
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    www = draw(st.sampled_from(["", "www.", "WWW.", "www.www."]))
    host = ".".join(draw(st.lists(_LABEL, min_size=1, max_size=3)))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    segs = draw(st.lists(_SEG, min_size=0, max_size=3))
    path = "".join("/" + s for s in segs)
    path += draw(st.sampled_from(["", "/", "//", "/index.html"]))
    q = draw(st.lists(st.tuples(_KEY, _SEG), min_size=0, max_size=3))
    query = ("?" + "&".join(f"{k}={v}" for k, v in q)) if q else ""
    query += draw(st.sampled_from(["", "&"])) if query else ""
    frag = draw(st.sampled_from(["", "#x", "#frag?y=1"]))
    return f"{scheme}://{www}{host}{port}{path}{query}{frag}"


def _canon(con, url: str) -> tuple[str, str]:
    u = url.replace("'", "''")
    host, canon = con.execute(
        "SELECT host, url_canon FROM ("
        + sql_canonicalize(f"(SELECT '{u}' AS url)")
        + ")"
    ).fetchone()
    return host, canon


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@settings(max_examples=300, deadline=None)
@given(url=urls())
def test_canonicalize_idempotent(url):
    con = duckdb.connect()
    host1, canon1 = _canon(con, url)
    host2, canon2 = _canon(con, canon1)
    assert (host2, canon2) == (host1, canon1), url


@settings(max_examples=300, deadline=None)
@given(url=urls())
def test_canonical_invariants(url):
    con = duckdb.connect()
    host, canon = _canon(con, url)
    assert host == host.lower()
    assert not host.startswith("www.")
    assert "#" not in canon
    # tracking params are gone from the QUERY (a path segment may
    # legitimately spell 'utm_...'; only key=value pairs are stripped)
    query = canon.split("?", 1)[1] if "?" in canon else ""
    for kv in filter(None, query.split("&")):
        k = kv.split("=", 1)[0]
        assert not _is_tracking(k)
    # ...and every NON-tracking key=value pair survives untouched (the
    # near-miss keys in _KEY make this fail if tracking names ever match
    # as substrings of longer param names — the ADVICE r4 regression)
    in_query = url.split("#", 1)[0]
    in_query = in_query.split("?", 1)[1] if "?" in in_query else ""
    kept_in = [kv for kv in filter(None, in_query.split("&"))
               if not _is_tracking(kv.split("=", 1)[0])]
    assert [kv for kv in filter(None, query.split("&"))] == kept_in
    assert not canon.endswith("?") and not canon.endswith("&")
    # path part never ends with a redundant slash (root '/' excepted)
    tail = canon.split("://", 1)[1]
    path = "/" + tail.split("/", 1)[1] if "/" in tail else "/"
    path = path.split("?", 1)[0]
    assert path == "/" or not path.endswith("/")
