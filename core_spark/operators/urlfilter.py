"""Domain-blocklist URL filtering (RefinedWeb/UT1-style suffix matching).

Web curation pipelines drop documents whose host matches a curated domain
blocklist (RefinedWeb uses the UT1 adult/malware lists; C4 uses a banned
word list) — with SUFFIX semantics: blocking ``bad.example`` must also
block ``cdn.bad.example`` but NOT ``notbad.example`` (match only on a
full label boundary).

Plan shape (the gate_hosts_by_quality precedent, weburl.py):

1. ``hosts = df.select(host).distinct()`` — the HOST DIRECTORY, a
   uniform-key hash-agg (map-side combine); at web scale |hosts| is
   orders of magnitude smaller than |docs|.
2. Per host, build its label-suffix set WITHIN-ROW from one stepwise
   ``split`` (CLAUDE.md stepwise rule — the split is computed once) and
   explode: a host with L labels yields L (host, suffix) rows, L ≤ ~6
   in practice, bounded by the input.
3. Broadcast hash join suffixes against the blocklist — the blocked-host
   directory falls out as a ``distinct`` over matches.
4. ``df`` anti-joins the broadcast blocked-host list on the plain host
   column: good-host documents never shuffle, never replicate.

The doc table is consumed twice (host directory + final anti join), both
times as a scan + narrow projection — deliberately NOT pinned, the same
rationale as ``gate_hosts_by_quality`` (the multi-consumer pin rule
targets recompute that includes a shuffle, not map-only scans).

Sizing: the blocklist (UT1 ~4M domains ≈ 100 MB) and the MATCHED host
list are broadcast; both are bounded by curated-list size, not corpus
size. If a corpus ever had most hosts blocked, swap the final join to a
shuffle anti join — semantics unchanged.

Hosts are expected canonical (lowercase, as ``weburl.canonicalize_url``
emits); the blocklist must be lowercase label sequences without ports.
Ports are stripped before matching (``h.example:8443`` matches a block
on ``h.example`` — the listing targets the domain, not one origin).

No reference counterpart (specvital/core has no corpus subsystem);
semantics follow the published RefinedWeb §3.1 URL-filtering stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def host_suffix_steps(host_col: str) -> list[tuple[str, str]]:
    """Stepwise spec: ordered (col, sql_expr) producing ``_sufs``, the
    array of every label suffix of ``host_col`` (port stripped, longest
    first): ``a.b.c:8080`` -> ['a.b.c', 'b.c', 'c']. Stepwise so the
    label split is computed once (CLAUDE.md rule). The oracle twin does
    NOT mirror these steps — it is an independent dot-boundary LIKE plan
    (``sql_filter_blocked_hosts``)."""
    return [
        ("_hostbare", f"regexp_replace({host_col}, ':[0-9]+$', '')"),
        ("_labels", "split(_hostbare, '[.]')"),
        (
            "_sufs",
            "transform(sequence(1, size(_labels)),"
            " i -> array_join(slice(_labels, i, size(_labels) - i + 1),"
            " '.'))",
        ),
    ]


def blocked_host_directory(
    df: DataFrame, blocklist: DataFrame, host_col: str = "host"
) -> DataFrame:
    """Distinct hosts of ``df`` that suffix-match ``blocklist.domain``."""
    hosts = df.select(host_col).distinct()
    for name, expr in host_suffix_steps(host_col):
        hosts = hosts.withColumn(name, F.expr(expr))
    return (
        hosts.select(host_col, F.explode("_sufs").alias("_suf"))
        .join(F.broadcast(blocklist), F.col("_suf") == F.col("domain"))
        .select(host_col)
        .distinct()
    )


def filter_blocked_hosts(
    df: DataFrame, blocklist: DataFrame, host_col: str = "host"
) -> DataFrame:
    """Drop every row whose host suffix-matches a blocklist domain.

    ``blocklist`` must have a single ``domain`` column (lowercase).
    Returns ``df``'s rows and columns unchanged for surviving hosts.
    """
    bad = blocked_host_directory(df, blocklist, host_col)
    return df.join(F.broadcast(bad), host_col, "left_anti")


def sql_filter_blocked_hosts(
    inner_sql: str,
    blocklist_values: str,
    select_cols: str,
    host_col: str = "host",
) -> str:
    """DuckDB oracle twin — an INDEPENDENT plan: no label split, the
    suffix predicate is exact-or-dot-boundary ``ends_with`` against the
    raw (port-stripped) host. ``ends_with`` (not ``LIKE``) because
    domains can legally contain ``_`` (e.g. ``_dmarc.*`` labels), which
    LIKE would treat as a single-char wildcard — only on the oracle
    side, masking or inventing mismatches.

    ``blocklist_values`` is a SQL VALUES body, e.g. ``('a.example'),
    ('b.example')``.
    """
    return f"""
        SELECT {select_cols} FROM ({inner_sql}) d
        WHERE NOT EXISTS (
          SELECT 1 FROM (VALUES {blocklist_values}) AS b(domain)
          WHERE regexp_replace(d.{host_col}, ':[0-9]+$', '', 'g') = b.domain
             OR ends_with(regexp_replace(d.{host_col}, ':[0-9]+$', '', 'g'),
                          '.' || b.domain)
        )
    """
