"""robots.txt parser: section selection, Allow-overrides, crawl-delay,
Arrow batch integration."""

from __future__ import annotations

from nde_crawlers_spark.operators.robots import (
    is_allowed, parse_robots_bodies, parse_robots_txt,
)

ROBOTS = """
# comments ignored
User-agent: *
Disallow: /private/
Disallow: /tmp/
Crawl-delay: 2

User-agent: nde-spark
Disallow: /private/
Allow: /private/public-subdir/
Crawl-delay: 0.5

User-agent: evilbot
Disallow: /
"""


def test_parse_selects_most_specific_agent():
    r = parse_robots_txt(ROBOTS, agent="nde-spark")
    assert r["crawl_delay_ms"] == 500
    assert r["disallow_prefixes"] == ["/private/"]
    assert r["allow_prefixes"] == ["/private/public-subdir/"]
    # generic agent falls back to *
    r2 = parse_robots_txt(ROBOTS, agent="someone-else")
    assert r2["crawl_delay_ms"] == 2000
    assert r2["disallow_prefixes"] == ["/private/", "/tmp/"]
    # empty body -> defaults (open, reference DOWNLOAD_DELAY)
    r3 = parse_robots_txt("", agent="nde-spark")
    assert r3 == {"disallow_prefixes": [], "allow_prefixes": [], "crawl_delay_ms": 500}


def test_allow_longest_match_wins():
    r = parse_robots_txt(ROBOTS, agent="nde-spark")
    assert not is_allowed("/private/secret", r["disallow_prefixes"], r["allow_prefixes"])
    assert is_allowed("/private/public-subdir/file", r["disallow_prefixes"], r["allow_prefixes"])
    assert is_allowed("/records/1", r["disallow_prefixes"], r["allow_prefixes"])


def test_parse_robots_bodies_batch(spark):
    df = spark.createDataFrame(
        [("h1.org", ROBOTS), ("h2.org", ""), ("h3.org", None)], "host string, body string"
    )
    rows = {r["host"]: r for r in parse_robots_bodies(df).collect()}
    assert rows["h1.org"]["crawl_delay_ms"] == 500
    assert rows["h2.org"]["disallow_prefixes"] == []
    assert rows["h3.org"]["crawl_delay_ms"] == 500
