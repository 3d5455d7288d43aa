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


CD_FIXTURE = """
User-agent: *
Crawl-delay: 2
Disallow: /private/

User-agent: fastbot
Crawl-delay: 0.5

User-agent: brokenbot
Crawl-delay: soon
"""


def test_crawl_delay_parse_and_lookup():
    from distributed_crawler_spark.functions.robots_txt import (
        crawl_delay_for,
        parse_robots_txt,
    )

    rules = parse_robots_txt(CD_FIXTURE)
    assert crawl_delay_for(rules, "*") == 2.0
    assert crawl_delay_for(rules, "fastbot") == 0.5
    # specific agent with no directive of its own falls back to '*'
    assert crawl_delay_for(rules, "otherbot") == 2.0
    # malformed value is dropped entirely -> falls back to '*'
    assert crawl_delay_for(rules, "brokenbot") == 2.0
    # no crawl-delay anywhere -> None
    assert crawl_delay_for(parse_robots_txt("User-agent: *\nDisallow: /x")) is None


def test_crawl_delay_matches_urllib():
    """Cross-check against stdlib on groups that carry path rules.
    (urllib DISCARDS a group containing only a Crawl-delay and no
    Allow/Disallow line — rp.crawl_delay('fastbot') on CD_FIXTURE is
    None; this parser keeps such groups, the RFC-9309-consistent and
    crawler-useful reading, same documented-divergence class as
    longest-match vs first-match.)"""
    import urllib.robotparser

    from distributed_crawler_spark.functions.robots_txt import (
        crawl_delay_for,
        parse_robots_txt,
    )

    body = (
        "User-agent: *\nCrawl-delay: 2\nDisallow: /private/\n\n"
        "User-agent: fastbot\nCrawl-delay: 5\nDisallow: /tmp/\n"
    )
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(body.splitlines())
    rules = parse_robots_txt(body)
    for agent in ("fastbot", "somebot"):
        assert crawl_delay_for(rules, agent) == float(rp.crawl_delay(agent))
    # second divergence, also toward usefulness: urllib's isdigit() gate
    # drops fractional delays entirely; this parser accepts any float
    # (Crawl-delay: 0.5 is common in the wild)
    frac = "User-agent: fastbot\nCrawl-delay: 0.5\nDisallow: /tmp/\n"
    rp3 = urllib.robotparser.RobotFileParser()
    rp3.parse(frac.splitlines())
    assert rp3.crawl_delay("fastbot") is None
    assert crawl_delay_for(parse_robots_txt(frac), "fastbot") == 0.5
    # the documented divergence: delay-only group
    rp2 = urllib.robotparser.RobotFileParser()
    rp2.parse(CD_FIXTURE.splitlines())
    assert rp2.crawl_delay("fastbot") is None  # urllib drops the group
    assert crawl_delay_for(parse_robots_txt(CD_FIXTURE), "fastbot") == 0.5


def test_host_crawl_delays_dataframe(spark):
    from distributed_crawler_spark.functions.robots_txt import host_crawl_delays

    rules = spark.createDataFrame(
        [
            ("h1.com", "*", "crawl-delay", "2"),
            ("h1.com", "mybot", "crawl-delay", "0.25"),
            ("h2.com", "*", "crawl-delay", "5"),
            ("h2.com", "*", "disallow", "/x"),   # non-delay rows ignored
            ("h3.com", "*", "disallow", "/y"),   # no directive at all
        ],
        ["host", "user_agent", "rule", "path_prefix"],
    )
    got = {r.host: r.delay_s for r in host_crawl_delays(rules, user_agent="mybot").collect()}
    assert got == {"h1.com": 0.25, "h2.com": 5.0}  # h3 absent (joins get default)
    got_star = {r.host: r.delay_s for r in host_crawl_delays(rules).collect()}
    assert got_star == {"h1.com": 2.0, "h2.com": 5.0}


# ---- RFC 9309 §2.2.3 special characters ('*' and trailing '$') ---------

def test_pattern_matches_rfc_examples():
    """The RFC's / Google robots documentation's published example
    matrix — urllib has no wildcard support, so the cross-check here is
    the spec's own table."""
    from distributed_crawler_spark.functions.robots_txt import pattern_matches

    # /fish* is equivalent to /fish
    for pat in ("/fish", "/fish*"):
        assert pattern_matches("/fish", pat)
        assert pattern_matches("/fish.html", pat)
        assert pattern_matches("/fishheads/yummy.html", pat)
        assert not pattern_matches("/Fish.asp", pat)
        assert not pattern_matches("/catfish", pat)
    # /fish/ prefix
    assert pattern_matches("/fish/salmon.htm", "/fish/")
    assert not pattern_matches("/fish", "/fish/")
    # /*.php — contains .php anywhere after /
    assert pattern_matches("/filename.php", "/*.php")
    assert pattern_matches("/folder/filename.php", "/*.php")
    assert pattern_matches("/folder/any.php.file.html", "/*.php")
    assert not pattern_matches("/", "/*.php")
    assert not pattern_matches("/windows.PHP", "/*.php")
    # /*.php$ — ends with .php
    assert pattern_matches("/filename.php", "/*.php$")
    assert pattern_matches("/folder/filename.php", "/*.php$")
    assert not pattern_matches("/filename.php?parameters", "/*.php$")
    assert not pattern_matches("/filename.php/", "/*.php$")
    assert not pattern_matches("/windows.PHP", "/*.php$")
    # /fish*.php — .php after /fish
    assert pattern_matches("/fish.php", "/fish*.php")
    assert pattern_matches("/fishheads/catfish.php?parameters", "/fish*.php")
    assert not pattern_matches("/Fish.PHP", "/fish*.php")
    # plain anchored rule
    assert pattern_matches("/exact", "/exact$")
    assert not pattern_matches("/exactly", "/exact$")
    # '$' not at the end is literal
    assert pattern_matches("/a$b/c", "/a$b")


def test_evaluate_wildcard_specificity():
    from distributed_crawler_spark.functions.robots_txt import evaluate

    rules = [
        {"user_agent": "*", "rule": "disallow", "path_prefix": "/*.php$"},
        {"user_agent": "*", "rule": "allow", "path_prefix": "/public/"},
    ]
    assert not evaluate("/x/page.php", rules)
    assert evaluate("/x/page.php?y", rules)  # $ anchor fails -> no match
    # /public/index.php: allow /public/ (len 8) vs disallow /*.php$
    # (len 7) -> allow wins on specificity
    assert evaluate("/public/index.php", rules)


def test_robots_filter_rules_wildcards_match_python(spark):
    """Spark LIKE-compiled matching ≡ python pattern_matches/evaluate
    over a randomized rule x path matrix (incl. LIKE metacharacters
    that must be escaped)."""
    import random

    from distributed_crawler_spark.functions.robots_txt import (
        evaluate,
        robots_filter_rules,
    )

    rng = random.Random(31)
    pats = [
        "/a/", "/a", "/*.php$", "/fish*", "/a*b$", "/x_y", "/p%q",
        "/a*b*c", "/q$", "/exact$",
    ]
    rules_rows = []
    for host in ("h1", "h2"):
        for p in pats:
            if rng.random() < 0.7:
                rules_rows.append(
                    (host, rng.choice(["allow", "disallow"]), p)
                )
    paths = [
        "/a/", "/a/x.php", "/a", "/ab", "/axb", "/axbyc", "/x_y", "/xzy",
        "/p%q", "/fish", "/fishy/z.php?k", "/q", "/q?x", "/exact",
        "/exactly", "/folder/deep/file.php",
    ]
    cands = [
        (h, f"https://{h}.example.com{p}")
        for h in ("h1", "h2", "h3")  # h3 has no rules -> default allow
        for p in paths
    ]
    cdf = spark.createDataFrame(cands, "host STRING, url STRING")
    rdf = spark.createDataFrame(
        rules_rows, "host STRING, rule STRING, path_prefix STRING"
    )
    got = {
        (r.host, r.url)
        for r in robots_filter_rules(cdf, rdf).collect()
    }
    by_host: dict = {}
    for h, rule, p in rules_rows:
        by_host.setdefault(h, []).append(
            {"user_agent": "*", "rule": rule, "path_prefix": p}
        )
    want = {
        (h, u)
        for h, u in cands
        if evaluate(u.split(".example.com", 1)[1] or "/", by_host.get(h, []))
    }
    assert got == want
