"""Sitemap parsing (sitemaps.org protocol): URL discovery for the crawl.

robots.py answers "may I fetch this URL"; sitemaps answer "which URLs
exist" — the other half of crawl discovery. The protocol
(https://www.sitemaps.org/protocol.html, the public spec referenced by
RFC 9309's Sitemap extension) defines two XML document kinds:

  - ``<urlset>``: one ``<url>`` entry per page with ``<loc>`` (required)
    and optional ``<lastmod>`` / ``<changefreq>`` / ``<priority>``;
  - ``<sitemapindex>``: one ``<sitemap>`` entry per CHILD sitemap with
    ``<loc>`` and optional ``<lastmod>`` — large sites shard their URL
    lists behind an index.

Parsing is pure JVM SQL over the sitemap DIRECTORY (one XML per
sitemap URL — like the robots directory, it is host-bounded and never
the page corpus): one ``(?s)``-dotall ``regexp_extract_all`` pulls the
entry blocks (a single alternation serves both kinds — ``\\b`` keeps
``<url>`` from matching ``<urlset>``), ``posexplode_outer`` keeps
empty/malformed documents as one NULL-entry row (error-as-data: kind
``error`` for documents that are neither kind — the scanner.go
config-parse parity convention), and per-entry fields come from
anchored non-greedy extracts. ``<loc>`` values are XML-unescaped (the
spec REQUIRES entity-escaping ampersands in URLs; ``&amp;`` is decoded
LAST so double-escaped text stays literal). lastmod/changefreq/priority
stay raw strings — W3C datetime parsing is caller policy, and priority
as a string keeps every compared value float-free.

Scope (documented, pytest-pinned): entity decoding covers the five XML
entities on ``<loc>`` only; CDATA sections and namespace-prefixed tags
(``<sm:loc>``) are out of scope — real-world sitemaps overwhelmingly
use the plain form.

``child_present`` closes the loop for index entries: a left join of the
entry's ``loc`` against the distinct directory keys (broadcast — the
directory is small) flags referenced child sitemaps that are missing
from the crawl's fetched set, which is exactly the frontier's next
fetch list. Composition: urlset rows' (loc, priority) feed
``frontier.schedule_frontier`` as candidates; ``robots_decide`` gates
them.

100-TB shape: the directory pays the regex scan (entries-per-sitemap is
spec-capped at 50k, bytes at 50MB uncompressed); the only join is
broadcast; the page corpus is never touched. No reference counterpart
(specvital/core has no crawl subsystem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from core_spark.plans.materialize import pin

#: one alternation pulls blocks for BOTH kinds; \\b keeps <url> off <urlset>
_BLOCK_RE = r"(?s)<(?:url|sitemap)\b[^>]*>(.*?)</(?:url|sitemap)>"


def _field(entry_col: str, tag: str) -> F.Column:
    return F.nullif(
        F.trim(
            F.regexp_extract(
                F.col(entry_col), rf"(?s)<{tag}>\s*(.*?)\s*</{tag}>", 1
            )
        ),
        F.lit(""),
    )


def _xml_unescape(col: F.Column) -> F.Column:
    """The five XML entities; &amp; LAST so '&amp;lt;' stays '&lt;'."""
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&apos;", "'"), ("&amp;", "&"),
    ):
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def parse_sitemaps(
    sitemaps: DataFrame,
    host_col: str = "host",
    url_col: str = "sitemap_url",
    xml_col: str = "xml",
) -> DataFrame:
    """Sitemap directory -> one row per entry:
    (host, sitemap_url, kind, pos, loc, lastmod, changefreq, priority,
    child_present).

    ``kind`` is ``urlset`` / ``sitemapindex`` / ``error`` (document is
    neither — kept as ONE row with NULL entry fields, never dropped).
    ``pos`` is the 0-based entry ordinal within its document.
    ``child_present`` is 1/0 for sitemapindex entries (is the referenced
    child sitemap in the directory?), NULL otherwise.
    """
    # directory feeds the parse AND the child-presence join — pin once
    sitemaps = pin(
        sitemaps.select(
            F.col(host_col).alias("host"),
            F.col(url_col).alias("sitemap_url"),
            F.col(xml_col).alias("xml"),
        )
    )
    parsed = (
        sitemaps.select(
            "host",
            "sitemap_url",
            F.when(F.col("xml").contains("<sitemapindex"),
                   F.lit("sitemapindex"))
            .when(F.col("xml").contains("<urlset"), F.lit("urlset"))
            .otherwise(F.lit("error"))
            .alias("kind"),
            # the function form, not expr(): a SQL string literal would
            # re-interpret \b as a backspace escape
            F.regexp_extract_all("xml", F.lit(_BLOCK_RE), F.lit(1))
            .alias("_blocks"),
        )
        .select(
            "host",
            "sitemap_url",
            "kind",
            F.posexplode_outer("_blocks").alias("pos", "_entry"),
        )
        .select(
            "host",
            "sitemap_url",
            "kind",
            F.col("pos").cast("long").alias("pos"),
            _xml_unescape(_field("_entry", "loc")).alias("loc"),
            _field("_entry", "lastmod").alias("lastmod"),
            _field("_entry", "changefreq").alias("changefreq"),
            _field("_entry", "priority").alias("priority"),
        )
    )
    dirs = (
        sitemaps.select(F.col("sitemap_url").alias("_child"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        parsed.join(F.broadcast(dirs), parsed.loc == dirs._child, "left")
        .select(
            "host",
            "sitemap_url",
            "kind",
            "pos",
            "loc",
            "lastmod",
            "changefreq",
            "priority",
            F.when(
                (F.col("kind") == "sitemapindex") & F.col("loc").isNotNull(),
                F.coalesce(F.col("_hit"), F.lit(0)),
            ).cast("int").alias("child_present"),
        )
    )
