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


def test_robots_render_parse_roundtrip():
    """The crawl plan fetches robots.txt BODIES and parses them with the
    real parser; parse(render(host)) must round-trip to the semantic
    rules exactly for every host shape (no-disallow, disallow, 0-delay,
    2s-delay)."""
    from nde_crawlers_spark.operators.robots import parse_robots_txt
    from nde_crawlers_spark.sources.synthetic import render_robots_txt, robots_rules

    seen_shapes = set()
    for i in range(300):
        host = f"host-{i:04d}.example.org"
        want = robots_rules(host)
        got = parse_robots_txt(render_robots_txt(host))
        assert got["disallow_prefixes"] == want["disallow_prefixes"], host
        assert got["crawl_delay_ms"] == want["crawl_delay_ms"], host
        seen_shapes.add((bool(want["disallow_prefixes"]), want["crawl_delay_ms"]))
    # the corpus actually exercises all rule shapes
    assert len(seen_shapes) >= 4
