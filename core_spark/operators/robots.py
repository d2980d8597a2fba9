"""robots.txt parsing + crawl-permission decisions (RFC 9309).

The gate every crawl pipeline runs before a fetch enters the corpus:
parse the per-host robots.txt directory into a rules table, then decide
allow/deny for every candidate URL under a given user-agent. Both halves
are pure JVM SQL (regex line grammar + windows; no Python anywhere).

Parse semantics (RFC 9309 §2.2, pinned by pytest + the generation-rule
oracle):

  - lines: ``#`` comments stripped, whitespace trimmed; only
    ``user-agent`` / ``allow`` / ``disallow`` directives matter (names
    case-insensitive), everything else is ignored;
  - groups: one or more CONSECUTIVE user-agent lines start a group; the
    allow/disallow rules that follow belong to it (a user-agent line
    after rules starts a NEW group). Rules before any user-agent line
    belong to no group and are dropped;
  - an empty-pattern rule (``Disallow:``) imposes no restriction and is
    dropped (the RFC's "empty pattern matches nothing" reading) — but
    the GROUP it belongs to survives as a NULL-pattern row, because
    group selection must still see it: a crawler whose specific group
    contains only empty rules is excluded from the ``*`` groups and
    allowed everywhere (RFC 9309 §2.2.1 — a matching specific group,
    even an empty one, takes the place of the ``*`` group);
  - patterns: ``*`` matches any run, a TRAILING ``$`` anchors the end,
    everything else is literal — translated ONCE, rules-side, into an
    anchored regex (``^`` + escaped body with ``.*`` for stars).

Decision semantics (§2.2.1-2.2.2):

  - group selection per host: groups whose agent set contains the
    crawler's product token (case-insensitive exact match) if any exist,
    else the ``*`` groups; multiple matching groups MERGE;
  - among matching rules the LONGEST pattern wins; a length tie goes to
    allow (the documented Google tiebreak the RFC permits); no matching
    rule — or no robots.txt for the host — means allowed.

100-TB shape: the robots DIRECTORY (one text per host) pays the line
explode and regex translation — never the URL corpus; rules-per-host is
bounded by crawl policy. Decisions are one equi-join on the uniform
host key (Spark broadcasts the rules side when the directory is small)
followed by one (url)-keyed max(struct(len, allow)) hash-agg with
map-side combine — the longest-match winner WITHOUT a window. URL keys
are unique by construction, so the agg is skew-free.

No reference counterpart (specvital/core has no crawl subsystem);
semantics follow RFC 9309 (published September 2022).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_DIRECTIVE = r"^(?i)(user-agent|allow|disallow)\s*:\s*(.*)$"


def parse_robots(
    robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """robots.txt directory -> rules table
    (host, group_id, agents array<string>, pattern, allow, regex, plen).

    Groups with no effective rules (only empty patterns, or none at
    all) yield ONE row with NULL pattern/allow/regex/plen: it never
    matches a path, but it keeps the group visible to agent selection
    in ``robots_decide`` (an empty specific group excludes ``*``).
    """
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "_raw"),
    ).select(
        "host",
        "pos",
        F.trim(F.regexp_replace("_raw", "#.*$", "")).alias("_line"),
    ).select(
        "host",
        "pos",
        F.lower(F.regexp_extract("_line", _DIRECTIVE, 1)).alias("typ"),
        F.trim(F.regexp_extract("_line", _DIRECTIVE, 2)).alias("val"),
    ).filter(F.col("typ") != "")

    w = Window.partitionBy("host").orderBy("pos")
    grouped = lines.withColumn(
        "_new",
        (
            (F.col("typ") == "user-agent")
            & (
                F.lag("typ").over(w).isNull()
                | (F.lag("typ").over(w) != "user-agent")
            )
        ).cast("int"),
    ).withColumn("group_id", F.sum("_new").over(w))

    agents = (
        grouped.filter(F.col("typ") == "user-agent")
        .groupBy("host", "group_id")
        .agg(F.collect_set(F.lower("val")).alias("agents"))
    )
    rules = grouped.filter(
        F.col("typ").isin("allow", "disallow")
        & (F.col("val") != "")
        & (F.col("group_id") > 0)
    ).select(
        "host",
        "group_id",
        F.col("val").alias("pattern"),
        (F.col("typ") == "allow").alias("allow"),
    )

    # pattern -> anchored regex, computed once on the (small) rules side.
    # Trailing $ is the end anchor and must come off BEFORE escaping.
    anchored = F.col("pattern").endswith("$")
    body = F.when(
        anchored, F.expr("substring(pattern, 1, length(pattern) - 1)")
    ).otherwise(F.col("pattern"))
    esc = F.regexp_replace(
        body, r"([.^$+?(){}\[\]|\\])", r"\\$1"
    )
    starred = F.replace(esc, F.lit("*"), F.lit(".*"))
    regex = F.concat(
        F.lit("^"), starred, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )
    return agents.join(rules, ["host", "group_id"], "left").select(
        "host",
        "group_id",
        "agents",
        "pattern",
        "allow",
        regex.alias("regex"),
        F.length("pattern").cast("long").alias("plen"),
    )


def robots_sitemap_urls(
    robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, sitemap_url) from ``Sitemap:`` directives — where sitemap
    discovery STARTS (sitemaps.org designates robots.txt as the
    canonical place a site publishes its sitemap locations; RFC 9309
    §2.3 carries it as an other-record). Directive name is
    case-insensitive, the value is the rest of the line (comments
    stripped, whitespace trimmed — same line grammar as parse_robots),
    directives live OUTSIDE groups so position is irrelevant, and a
    file may carry any number of them. One line explode over the
    host-bounded directory; empty values are dropped."""
    return (
        robots.select(
            F.col(host_col).alias("host"),
            F.explode(F.split(F.col(text_col), "\n")).alias("_raw"),
        )
        .select(
            "host",
            F.trim(
                F.regexp_extract(
                    F.trim(F.regexp_replace("_raw", "#.*$", "")),
                    r"^(?i)sitemap\s*:\s*(.*)$",
                    1,
                )
            ).alias("sitemap_url"),
        )
        .filter(F.col("sitemap_url") != "")
    )


def robots_decide(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    url_col: str = "url",
) -> DataFrame:
    """(url, allowed) for every input url under ``agent``.

    ``rules`` is a ``parse_robots`` result. Hosts absent from the rules
    table, and urls no rule matches, are allowed (RFC default).
    """
    agent_l = agent.lower()
    u = urls.select(
        F.col(url_col).alias("url"),
        F.lower(
            F.regexp_replace(
                F.regexp_extract(url_col, "^[A-Za-z]+://([^/?#]+)", 1),
                ":(80|443)$",
                "",
            )
        ).alias("host"),
        F.coalesce(
            F.nullif(F.regexp_extract(url_col, r"^[A-Za-z]+://[^/?#]*(/.*)?$", 1), F.lit("")),
            F.lit("/"),
        ).alias("path"),
    )

    exact = rules.filter(F.array_contains("agents", F.lit(agent_l)))
    star = rules.filter(F.array_contains("agents", F.lit("*")))
    hosts_exact = exact.select("host").distinct()
    applicable = exact.unionByName(
        star.join(hosts_exact, "host", "left_anti")
    ).select("host", "allow", "regex", "plen")

    joined = u.join(applicable, "host", "left")
    matched = F.col("regex").isNotNull() & F.expr("path rlike regex")
    scored = joined.select(
        "url",
        F.when(matched, F.col("plen")).otherwise(F.lit(-1)).alias("_len"),
        F.when(matched & F.col("allow"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("_allow"),
    )
    best = scored.groupBy("url").agg(
        F.max(F.struct(F.col("_len"), F.col("_allow"))).alias("_best")
    )
    return best.select(
        "url",
        F.when(F.col("_best._len") < 0, F.lit(True))
        .otherwise(F.col("_best._allow") == 1)
        .alias("allowed"),
    )
