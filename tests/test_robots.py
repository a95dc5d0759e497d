"""robots.txt parsing (functions/robots.py): RFC 9309 group
selection and longest-match precedence, the column-expression twin,
and the engine wiring (hosts built from robots text crawl exactly
like hand-injected rules)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai4orgwebscraper_spark.functions.robots import (
    RobotsRules,
    host_entry_from_robots,
    is_allowed,
    parse_robots,
    robots_allowed_col,
)

ROBOTS = """
# example robots
User-agent: *
Disallow: /private/
Crawl-delay: 2

User-agent: refbot
User-agent: otherbot
Disallow: /tmp/
Allow: /tmp/ok/

User-agent: greedybot
Disallow: /
"""


def test_group_selection():
    star = parse_robots(ROBOTS, "somebot/1.0")
    assert star.disallow == ["/private/"] and star.crawl_delay == 2.0
    ref = parse_robots(ROBOTS, "refbot/2.1 (+http://x)")
    assert ref.disallow == ["/tmp/"] and ref.allow == ["/tmp/ok/"]
    assert ref.crawl_delay is None
    other = parse_robots(ROBOTS, "otherbot")
    assert other.disallow == ["/tmp/"]  # shared group via stacked UA lines
    assert parse_robots(ROBOTS, "greedybot").disallow == ["/"]


def test_specific_agent_beats_star_even_when_longer_name():
    txt = "User-agent: bot\nDisallow: /a/\n\nUser-agent: bigbot\nDisallow: /b/\n"
    # agent string contains both tokens; the longer token wins
    assert parse_robots(txt, "mybigbot").disallow == ["/b/"]
    assert parse_robots(txt, "mybot").disallow == ["/a/"]


def test_empty_group_shadows_star():
    # RFC 9309: blank lines do NOT split a user-agent run — stacked
    # UAs join one group until a rule line intervenes...
    joined = "User-agent: nicebot\n\nUser-agent: *\nDisallow: /\n"
    assert parse_robots(joined, "nicebot").disallow == ["/"]
    # ...so an agent opts out of * by closing its group with a rule
    # line; the RFC's no-op empty Disallow leaves the group EMPTY
    # (everything allowed) yet still shadowing *
    txt = "User-agent: nicebot\nDisallow:\n\nUser-agent: *\nDisallow: /\n"
    assert parse_robots(txt, "nicebot").disallow == []
    assert parse_robots(txt, "anyone-else").disallow == ["/"]


def test_longest_match_precedence():
    rules = RobotsRules(allow=["/tmp/ok/"], disallow=["/tmp/"])
    assert is_allowed("/home", rules)
    assert not is_allowed("/tmp/x", rules)
    assert is_allowed("/tmp/ok/y", rules)  # longer Allow overrides
    # tie resolves to allow
    tie = RobotsRules(allow=["/ab"], disallow=["/ab"])
    assert is_allowed("/abc", tie)
    # empty Disallow line is a no-op (never parsed into a rule)
    assert parse_robots("User-agent: *\nDisallow:\n").disallow == []


def test_column_twin_matches_python(spark):
    rules = RobotsRules(allow=["/tmp/ok/", "/ab"], disallow=["/tmp/", "/ab", "/"])
    paths = [
        "/", "/home", "/tmp/", "/tmp/x", "/tmp/ok", "/tmp/ok/", "/tmp/ok/y",
        "/ab", "/abc", "/a", "",
    ]
    df = spark.createDataFrame([(p,) for p in paths], "path string")
    got = {
        r["path"]: r["ok"]
        for r in df.select("path", robots_allowed_col(F.col("path"), rules).alias("ok")).collect()
    }
    for p in paths:
        assert got[p] == is_allowed(p, rules), p


def test_host_entry_wiring_and_refusal():
    entry = host_entry_from_robots(
        "host3.example.com", "User-agent: *\nDisallow: /private/\nCrawl-delay: 1\n"
    )
    assert entry["robots_disallow"] == ["/private/"]
    assert entry["crawl_delay_s"] == 1.0
    # Allow overriding a Disallow prefix cannot flatten into the
    # engine's prefix filter -> loud refusal, never silent drop
    with pytest.raises(ValueError, match="Allow"):
        host_entry_from_robots("h", "User-agent: *\nDisallow: /tmp/\nAllow: /tmp/ok/\n")
    # an Allow overlapping no Disallow is redundant and drops cleanly
    ok = host_entry_from_robots("h", "User-agent: *\nDisallow: /x/\nAllow: /y/\n")
    assert ok["robots_disallow"] == ["/x/"]


def test_engine_accepts_robots_built_hosts(spark):
    """A crawl over hosts built from robots.txt text equals the same
    crawl over hand-injected rules — C5 end-to-end through the parser."""
    from ai4orgwebscraper_spark.frontier.engine import CrawlEngine
    from ai4orgwebscraper_spark.sources.corpus import SKEW_HOST, default_hosts, seed_urls

    injected = default_hosts()
    built = []
    for h in injected:
        if h["robots_disallow"] or h["crawl_delay_s"]:
            lines = ["User-agent: somebot", "User-agent: *"]
            lines += [f"Disallow: {p}" for p in h["robots_disallow"]]
            if h["crawl_delay_s"]:
                lines.append(f"Crawl-delay: {h['crawl_delay_s']}")
            e = host_entry_from_robots(h["host"], "\n".join(lines))
            e["auth_required"] = h["auth_required"]
            e["session_token"] = h["session_token"]
            built.append(e)
        else:
            built.append(dict(h))
    assert any(b["robots_disallow"] for b in built)  # the skew host parsed

    seeds = seed_urls(30)
    eng_a = CrawlEngine(spark, hosts=injected, reference_mode=True)
    eng_b = CrawlEngine(spark, hosts=built, reference_mode=True)
    try:
        a = eng_a.run(eng_a.seeds_from_list(seeds)).fetch_log.collect()
        b = eng_b.run(eng_b.seeds_from_list(seeds)).fetch_log.collect()
        assert a == b
        assert eng_a.config_fingerprint == eng_b.config_fingerprint
    finally:
        eng_a.close()
        eng_b.close()
