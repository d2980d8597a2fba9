"""Outlink extraction + host-edge rollup (the real-crawl link graph).

``operators/linkgraph.py`` runs exact-integer PageRank over ANY host edge
table; this module produces that edge table from actual page markup the
way a crawl pipeline does: pull ``href`` targets out of ``<a>``/``<link>``
tags, keep absolute http(s) URLs, map each to its host, and aggregate
(src_host, dst_host, n_links) counts.

Everything is JVM-side (``regexp_extract_all`` + higher-order functions,
whole-stage codegen) — no Python crosses the hot path. The per-row work
is emitted as STEPWISE columns (CLAUDE.md rule) so the tag scan runs
once per document.

Extraction spec (regex-grade, deliberately):
  - a ``href`` attribute inside an ``<a ...>`` or ``<link ...>`` tag,
    case-insensitive, value double-quoted, single-quoted, or unquoted;
  - document order, duplicates kept (two links = two edge slots);
  - only absolute ``http://`` / ``https://`` targets survive (relative,
    ``mailto:``, ``javascript:`` etc. are curation noise);
  - dst host = lowercase authority, default-port and leading-www
    stripped (the weburl canonical-host convention).

Known regex-spec limit (documented, pinned in tests): a
WHITESPACE-preceded ``href=`` embedded inside another attribute's value
(``title='a href="x"'``) is read as the attribute; the common
quote-preceded embedding (``title='href="x"'``) is correctly skipped
because the spec requires ``\\s`` before ``href``. Full
attribute-grammar parsing needs an HTML tokenizer, which
curation-grade link statistics do not justify. The generation-rule
oracle (`site_outlinks`) gates the spec's branch space cross-engine;
tests pin the divergence case explicitly.

100-TB shape: extraction is a projection on the document scan (no
shuffle); the explode emits (src_host, dst_host) pairs only — never the
document payload — and the edge aggregate shuffles on uniform host-pair
keys with map-side combine. A mega-site's outlinks salt the same way
zonal.py salts mega-cells if a single src_host ever dominates a task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: group 1 = the raw href token (quotes included when quoted)
HREF_PATTERN = (
    r"(?i)<(?:a|link)\b[^>]*?\shref\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>\"']+)"
)


def outlink_steps(html_col: str) -> list[tuple[str, str]]:
    """Stepwise (col, Column) spec producing ``outlinks``: the ordered
    array of absolute http(s) href targets of ``html_col`` (a STRING
    column — decode binary html upstream)."""
    raw = F.regexp_extract_all(F.col(html_col), F.lit(HREF_PATTERN), 1)
    unq = F.transform(
        raw, lambda x: F.regexp_replace(x, F.lit(r"^[\"']|[\"']$"), F.lit(""))
    )
    kept = F.filter(
        unq,
        lambda x: x.startswith("http://") | x.startswith("https://"),
    )
    return [("outlinks", kept)]


def with_outlinks(df: DataFrame, html_col: str = "html_str") -> DataFrame:
    """Append ``outlinks`` (array<string>); pure projection, no shuffle."""
    for name, col in outlink_steps(html_col):
        df = df.withColumn(name, col)
    return df


def link_host_expr(link_col) -> "F.Column":
    """Canonical host of an absolute URL Column: lowercase authority,
    default ports and a leading ``www.`` label run stripped (the
    ``weburl._canon_steps`` host convention, inlined for array lambdas)."""
    hostport = F.lower(
        F.regexp_extract(link_col, "^[A-Za-z]+://([^/?#]+)", 1)
    )
    bare = F.regexp_replace(hostport, ":(80|443)$", "")
    return F.regexp_replace(bare, r"^(www[.])+", "")


def host_edges(
    df: DataFrame,
    src_host_col: str = "src_host",
    links_col: str = "outlinks",
) -> DataFrame:
    """(src_host, dst_host, n_links): aggregate link counts per host pair.

    Projects to (src_host, link) BEFORE the explode so document payloads
    are never replicated; the aggregate shuffles uniform host-pair keys
    with map-side combine.
    """
    pairs = df.select(
        F.col(src_host_col).alias("src_host"),
        F.explode(links_col).alias("_link"),
    )
    return (
        pairs.select("src_host", link_host_expr(F.col("_link")).alias("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )
