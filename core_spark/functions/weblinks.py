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


#: anchor variant: group 1 = raw href token, group 2 = the DIRECT text
#: content of the <a> element (no nested markup — see anchor_steps).
ANCHOR_PATTERN = (
    r"(?i)<a\b[^>]*?\shref\s*=\s*"
    r"(\"[^\"]*\"|'[^']*'|[^\s>\"']+)[^>]*>([^<]*)</a>"
)


def anchor_steps(html_col: str) -> list[tuple[str, str]]:
    """Stepwise spec producing ``anchors``: array<struct<link,text>> of
    (absolute http(s) href, direct anchor text) pairs in document order.

    The two capture groups are pulled with two ``regexp_extract_all``
    passes over the SAME pattern, so the arrays align match-for-match
    and ``arrays_zip`` pairs them exactly. Anchor semantics (documented,
    pinned in tests): only the a element's DIRECT text counts — an
    anchor wrapping nested markup (``<a ...><b>x</b></a>``) does not
    match (the ``[^<]*`` group cannot cross a tag) and contributes no
    anchor statistics; an empty anchor (``<a ...></a>``) matches but
    yields no terms. Full inner-text recovery needs an HTML tokenizer,
    which curation-grade anchor statistics do not justify (same
    regex-grade stance as HREF_PATTERN above).
    """
    hrefs = F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_PATTERN), 1)
    texts = F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_PATTERN), 2)
    zipped = F.arrays_zip(
        F.transform(
            hrefs,
            lambda x: F.regexp_replace(x, F.lit(r"^[\"']|[\"']$"), F.lit("")),
        ).alias("link"),
        texts.alias("text"),
    )
    kept = F.filter(
        zipped,
        lambda s: s["link"].startswith("http://")
        | s["link"].startswith("https://"),
    )
    return [("anchors", kept)]


def with_anchors(df: DataFrame, html_col: str = "html_str") -> DataFrame:
    """Append ``anchors`` (array<struct<link,text>>); pure projection."""
    for name, col in anchor_steps(html_col):
        df = df.withColumn(name, col)
    return df


def anchor_topk(
    df: DataFrame,
    k: int = 3,
    anchors_col: str = "anchors",
) -> DataFrame:
    """Top-k anchor terms per TARGET host — the classic web-graph signal
    (what the rest of the web calls a page is a stronger description
    than the page's own words; every search stack aggregates it).

    Terms are the lowercased ``[a-z0-9]+`` runs of each anchor text.
    Output (dst_host, term, n, rank), rank 1-based BIGINT by
    (n DESC, term ASC). 100-TB shape: the explode emits only
    (dst_host, term) pairs — payloads and full anchor structs never
    survive the projection; one uniform-key hash-agg with map-side
    combine; the per-host top-k is a rank window Spark rewrites into
    per-partition group limits (InferWindowGroupLimit), so no full
    per-host sort materializes.
    """
    from pyspark.sql import Window

    pairs = df.select(
        F.explode(anchors_col).alias("_a")
    ).select(
        link_host_expr(F.col("_a.link")).alias("dst_host"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col("_a.text")), r"[^a-z0-9]+"),
                lambda x: x != "",
            )
        ).alias("term"),
    )
    counts = pairs.groupBy("dst_host", "term").agg(F.count("*").alias("n"))
    w = Window.partitionBy("dst_host").orderBy(
        F.col("n").desc(), F.col("term").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("dst_host", "term", "n", "rank")
    )


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
