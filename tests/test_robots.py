"""robots.txt parse + decide (RFC 9309): grammar branches, group
formation, longest-match/tie semantics, agent selection, defaults."""

from __future__ import annotations

import pytest

from core_spark.operators.robots import parse_robots, robots_decide

ROBOTS = [
    ("simple.example", "User-agent: *\nDisallow: /private/"),
    ("layered.example", "User-agent: *\nDisallow: /\nAllow: /public/"),
    (
        "agents.example",
        "User-agent: testbot\nDisallow: /\n\nUser-agent: *\nAllow: /",
    ),
    ("anchor.example", "User-agent: *\nDisallow: /*.pdf$"),
    ("empty.example", "User-agent: *\nDisallow:"),
    (
        "messy.example",
        "# banner\nUSER-AGENT: *  # inline\n  DISALLOW : /x\nCrawl-delay: 5",
    ),
    ("orphan.example", "Disallow: /\nUser-agent: *\nDisallow: /y"),
    (
        "multiua.example",
        "User-agent: testbot\nUser-agent: otherbot\nDisallow: /z",
    ),
    ("tie.example", "User-agent: *\nAllow: /t\nDisallow: /t"),
]

CASES = [
    # url, allowed for agent=testbot
    ("https://norobots.example/a", True),          # host absent -> allow
    ("https://simple.example/ok", True),
    ("https://simple.example/private/x", False),
    ("https://simple.example/privateer", True),    # prefix is path-literal
    ("https://layered.example/", False),
    ("https://layered.example/public/p", True),    # longer allow wins
    ("https://agents.example/anything", False),    # exact group beats *
    ("https://anchor.example/d.pdf", False),
    ("https://anchor.example/d.pdfx", True),       # $ anchors the end
    ("https://anchor.example/x.pdf?y", True),      # query breaks the anchor
    ("https://empty.example/a", True),             # empty pattern dropped
    ("https://messy.example/x1", False),           # comments + case + space
    ("https://messy.example/a", True),
    ("https://orphan.example/q", True),            # orphan Disallow:/ dropped
    ("https://orphan.example/y2", False),
    ("https://multiua.example/z9", False),         # testbot in 2-ua group
    ("https://tie.example/t/q", True),             # equal length -> allow
    ("https://TIE.example:443/t", True),           # host canonicalized
]


@pytest.mark.spark
class TestRobots:
    def _decide(self, spark, agent="testbot"):
        robots = spark.createDataFrame(ROBOTS, "host string, robots_txt string")
        urls = spark.createDataFrame(
            [(u,) for u, _ in CASES], "url string"
        )
        rules = parse_robots(robots)
        return {r.url: r.allowed for r in robots_decide(urls, rules, agent).collect()}

    def test_decisions(self, spark):
        got = self._decide(spark)
        for url, want in CASES:
            assert got[url] is want, (url, want, got[url])

    def test_star_agent_fallback(self, spark):
        """A crawler with no exact group gets the * groups: on
        agents.example that's Allow: / -> allowed."""
        got = self._decide(spark, agent="strangerbot")
        assert got["https://agents.example/anything"] is True
        assert got["https://multiua.example/z9"] is True  # no * group at all

    def test_rules_table_shape(self, spark):
        robots = spark.createDataFrame(ROBOTS, "host string, robots_txt string")
        rules = {
            (r.host, r.pattern, r.allow, r.regex, r.plen)
            for r in parse_robots(robots).collect()
        }
        assert ("anchor.example", "/*.pdf$", False, r"^/.*\.pdf$", 7) in rules
        assert ("messy.example", "/x", False, "^/x", 2) in rules
        # empty pattern dropped -> the GROUP survives as one NULL row
        # (group selection must still see it), orphan rule dropped
        assert [r for r in rules if r[0] == "empty.example"] == [
            ("empty.example", None, None, None, None)
        ]
        assert [r for r in rules if r[0] == "orphan.example"] == [
            ("orphan.example", "/y", False, "^/y", 2)
        ]

    def test_agent_merge_multiple_groups(self, spark):
        """Two groups naming the same agent MERGE their rules."""
        robots = spark.createDataFrame(
            [(
                "m.example",
                "User-agent: testbot\nDisallow: /a\n\n"
                "User-agent: testbot\nDisallow: /b",
            )],
            "host string, robots_txt string",
        )
        urls = spark.createDataFrame(
            [("https://m.example/a1",), ("https://m.example/b1",),
             ("https://m.example/c1",)],
            "url string",
        )
        got = {
            r.url: r.allowed
            for r in robots_decide(urls, parse_robots(robots), "TestBot").collect()
        }
        assert got == {
            "https://m.example/a1": False,
            "https://m.example/b1": False,
            "https://m.example/c1": True,
        }

    def test_empty_specific_group_excludes_star(self, spark):
        """RFC 9309 §2.2.1: a specific group whose rules are all
        empty-pattern (or absent) still EXCLUDES the * group for that
        agent — testbot is allowed everywhere even though * says
        Disallow: /. Other agents get the * group's total ban."""
        robots = spark.createDataFrame(
            [(
                "eg.example",
                "User-agent: testbot\nDisallow:\n\n"
                "User-agent: *\nDisallow: /",
            )],
            "host string, robots_txt string",
        )
        urls = spark.createDataFrame(
            [("https://eg.example/a",), ("https://eg.example/b/c",)],
            "url string",
        )
        rules = parse_robots(robots)
        mine = {
            r.url: r.allowed
            for r in robots_decide(urls, rules, "testbot").collect()
        }
        assert mine == {
            "https://eg.example/a": True,
            "https://eg.example/b/c": True,
        }
        other = {
            r.url: r.allowed
            for r in robots_decide(urls, rules, "strangerbot").collect()
        }
        assert other == {
            "https://eg.example/a": False,
            "https://eg.example/b/c": False,
        }

    def test_plan_no_python_no_cartesian(self, spark):
        robots = spark.createDataFrame(ROBOTS, "host string, robots_txt string")
        urls = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
        plan = (
            robots_decide(urls, parse_robots(robots), "testbot")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


class TestRobotsSitemapUrls:
    def test_directive_extraction(self, spark):
        """Case-insensitive name, comments stripped, multiple per file,
        position-independent (inside or outside groups), empties dropped."""
        from core_spark.operators.robots import robots_sitemap_urls

        robots = spark.createDataFrame(
            [
                ("a.example", "User-agent: *\nDisallow: /private\n"
                              "Sitemap: https://a.example/sitemap.xml\n"
                              "SITEMAP: https://a.example/sm2.xml  # main\n"),
                ("b.example", "sitemap:https://b.example/s.xml\n"
                              "User-agent: *\nAllow: /\n"),
                ("c.example", "User-agent: *\nDisallow:\nSitemap:\n"),
                ("d.example", "# nothing here\n"),
            ],
            "host string, robots_txt string",
        )
        got = sorted(
            (r["host"], r["sitemap_url"])
            for r in robots_sitemap_urls(robots).collect()
        )
        assert got == [
            ("a.example", "https://a.example/sitemap.xml"),
            ("a.example", "https://a.example/sm2.xml"),
            ("b.example", "https://b.example/s.xml"),
        ]
