"""robots.txt parsing + longest-match evaluation: reference-fixture
behavior (test_crawl_quality.py:195-220) and urllib cross-check where
first-match and longest-match agree."""

from __future__ import annotations

import urllib.robotparser

from pyspark.sql import functions as F

from distributed_crawler_spark.functions.robots_txt import (
    evaluate,
    parse_robots_txt,
    parse_robots_txt_udf,
    robots_filter_rules,
)

FIXTURE = """
User-agent: *
Disallow: /private/
Disallow: /admin/
Allow: /public/
"""

NESTED = """
# comment line
User-agent: *
Disallow: /a/
Allow: /a/sub/

User-agent: badbot
Disallow: /
"""


def test_parse_reference_fixture():
    rules = parse_robots_txt(FIXTURE)
    assert {(r["rule"], r["path_prefix"]) for r in rules} == {
        ("disallow", "/private/"),
        ("disallow", "/admin/"),
        ("allow", "/public/"),
    }


def test_evaluate_matches_reference_expectations():
    # test_crawl_quality.py:207-220 expectations
    rules = parse_robots_txt(FIXTURE)
    assert evaluate("/public/page.html", rules)
    assert not evaluate("/private/secret.html", rules)
    assert not evaluate("/admin/panel.html", rules)
    assert evaluate("/blog/post.html", rules)      # unmatched → allow
    assert evaluate("/anything", [])               # no rules → allow


def test_longest_match_allow_override():
    rules = parse_robots_txt(NESTED)
    assert not evaluate("/a/x", rules)
    assert evaluate("/a/sub/x", rules)             # longer allow wins
    assert evaluate("/b", rules)
    # per-agent groups
    assert not evaluate("/b", rules, user_agent="badbot")


def test_cross_check_with_urllib_on_fixture():
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(FIXTURE.strip().splitlines())
    rules = parse_robots_txt(FIXTURE)
    for path in ["/public/x", "/private/x", "/admin/", "/", "/other"]:
        assert evaluate(path, rules) == rp.can_fetch("*", "https://h.com" + path), path


def test_rules_filter_dataframe(spark):
    cand = spark.createDataFrame(
        [
            ("https://h1.com/private/x", "h1.com"),
            ("https://h1.com/public/x", "h1.com"),
            ("https://h1.com/other", "h1.com"),
            ("https://h2.com/anything", "h2.com"),   # no rules → allow
        ],
        ["url", "host"],
    )
    rules = spark.createDataFrame(
        [
            ("h1.com", "disallow", "/private/"),
            ("h1.com", "allow", "/public/"),
            ("h1.com", "disallow", "/public/x/secret"),
        ],
        ["host", "rule", "path_prefix"],
    )
    got = {r["url"] for r in robots_filter_rules(cand, rules).collect()}
    assert got == {
        "https://h1.com/public/x",
        "https://h1.com/other",
        "https://h2.com/anything",
    }


def test_parse_udf_roundtrip(spark):
    df = spark.createDataFrame([(FIXTURE.encode(),)], ["body"])
    rows = df.select(parse_robots_txt_udf(F.col("body")).alias("r")).collect()[0]["r"]
    assert {(x["rule"], x["path_prefix"]) for x in rows} == {
        ("disallow", "/private/"),
        ("disallow", "/admin/"),
        ("allow", "/public/"),
    }
