"""robots.txt parsing and allow/deny evaluation.

The reference fetches and evaluates robots.txt with urllib's
RobotFileParser (utils.py:53-66, default-allow on any error); its test
fixture (test_crawl_quality.py:198-203) is the behavioral spec:
Disallow: /private/, Disallow: /admin/, Allow: /public/.

Two pieces:
  * ``parse_robots_txt`` — robots.txt body → (user_agent, rule, prefix)
    rows (grouped User-agent sections, Allow/Disallow lines, comments,
    blank-line group resets), exposed also as an Arrow UDF so a crawled
    robots.txt page column becomes a rules table.
  * ``evaluate`` / ``robots_filter_rules`` — RFC-9309 longest-match
    evaluation (allow wins length ties), default-allow. NOTE: urllib's
    RobotFileParser uses first-match-in-file-order; RFC 9309 (and every
    major crawler) uses longest-match — they agree on the reference's
    fixtures and on single-rule hosts; divergence documented and
    covered by tests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

RULE_SCHEMA = ArrayType(
    StructType(
        [
            StructField("user_agent", StringType()),
            StructField("rule", StringType()),
            StructField("path_prefix", StringType()),
        ]
    )
)


def parse_robots_txt(body: str | None) -> list[dict]:
    """robots.txt body → rule rows. Group semantics per RFC 9309: one or
    more consecutive User-agent lines open a group; Allow/Disallow lines
    attach to the open group; an empty Disallow means 'allow all' and is
    dropped (no-op)."""
    if not body:
        return []
    rules: list[dict] = []
    agents: list[str] = []
    last_was_agent = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not last_was_agent:
                agents = []
            agents.append(value)
            last_was_agent = True
        elif key in ("allow", "disallow"):
            last_was_agent = False
            if not value:
                continue  # empty pattern = no-op
            for ua in agents or ["*"]:
                rules.append(
                    {"user_agent": ua, "rule": key, "path_prefix": value}
                )
        elif key == "crawl-delay":
            last_was_agent = False
            try:
                float(value)
            except ValueError:
                continue  # malformed delay = no-op (urllib keeps strings;
                          # a crawler can only honor numbers)
            for ua in agents or ["*"]:
                rules.append(
                    {"user_agent": ua, "rule": "crawl-delay", "path_prefix": value}
                )
        else:
            last_was_agent = False
    return rules


def crawl_delay_for(
    rules: list[dict], user_agent: str = "*"
) -> float | None:
    """Seconds from the group's ``Crawl-delay`` directive (the de-facto
    per-host politeness knob fetch scheduling consumes — see
    politeness.crawl_delay_schedule); the specific agent's group wins
    over '*', mirroring urllib.robotparser.crawl_delay."""
    best = None
    for r in rules:
        if r["rule"] != "crawl-delay":
            continue
        if r["user_agent"] == user_agent:
            return float(r["path_prefix"])
        if r["user_agent"] == "*" and best is None:
            best = float(r["path_prefix"])
    return best


def host_crawl_delays(
    rules: DataFrame, default_s: float = 1.0, user_agent: str = "*"
) -> DataFrame:
    """(host, delay_s) from a parsed per-host rule table — hosts with no
    directive get ``default_s`` (the reference's global
    CRAWLER_DOWNLOAD_DELAY, config.py:14). Feed the result to
    crawl_delay_schedule via a broadcast join. Agent-specific groups win
    over '*' (min over the ranked pair, like crawl_delay_for)."""
    cd = rules.filter(F.col("rule") == "crawl-delay").filter(
        F.col("user_agent").isin(user_agent, "*")
    )
    ranked = cd.select(
        "host",
        F.struct(
            F.when(F.col("user_agent") == user_agent, F.lit(0))
            .otherwise(F.lit(1))
            .alias("pref"),
            F.col("path_prefix").cast("double").alias("delay_s"),
        ).alias("__r"),
    )
    return (
        ranked.groupBy("host")
        .agg(F.min("__r").alias("__best"))
        .select("host", F.coalesce(F.col("__best.delay_s"), F.lit(default_s)).alias("delay_s"))
    )


@pandas_udf(RULE_SCHEMA)
def parse_robots_txt_udf(bodies: pd.Series) -> pd.Series:
    return bodies.map(
        lambda b: [
            (r["user_agent"], r["rule"], r["path_prefix"])
            for r in parse_robots_txt(
                b.decode("utf-8", "ignore") if isinstance(b, (bytes, bytearray)) else b
            )
        ]
    )


def _ordered_segments(s: str, parts: list[str]) -> bool:
    """First segment anchored at the start, later segments found left to
    right (greedy earliest match is complete for ordered-substring
    existence)."""
    if not s.startswith(parts[0]):
        return False
    pos = len(parts[0])
    for seg in parts[1:]:
        j = s.find(seg, pos)
        if j < 0:
            return False
        pos = j + len(seg)
    return True


def pattern_matches(path: str, pattern: str) -> bool:
    """RFC 9309 §2.2.3 rule matching: '*' matches any character
    sequence, a TRAILING '$' anchors the rule at the end of the path
    ('$' anywhere else is literal), and an un-anchored rule matches any
    path it prefixes.  urllib.robotparser has neither special
    character, so the cross-check tests pin the RFC's own examples
    (/fish*, /*.php$, ...) instead."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = pattern.split("*")
    if not anchored:
        return _ordered_segments(path, parts)
    last = parts[-1]
    if not path.endswith(last):
        return False
    trimmed = path[: len(path) - len(last)]
    if len(parts) == 1:
        return trimmed == ""
    return _ordered_segments(trimmed, parts[:-1])


def evaluate(path: str, rules: list[dict], user_agent: str = "*") -> bool:
    """True = allowed. Most specific match wins (longest RULE string,
    the RFC 9309 / Googlebot measure — identical to longest-prefix for
    wildcard-free rules); allow wins ties; no match ⇒ allow
    (utils.py:64-66 default)."""
    applicable = [
        r for r in rules if r["user_agent"] in ("*", user_agent)
    ]
    best_len = -1
    allowed = True
    for r in applicable:
        p = r["path_prefix"]
        if pattern_matches(path, p):
            if len(p) > best_len or (len(p) == best_len and r["rule"] == "allow"):
                best_len = len(p)
                allowed = r["rule"] == "allow"
    return allowed


def robots_filter_rules(
    candidates: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Allow/deny filter with full (host, rule, path_prefix) rule tables:
    most-specific-match (longest rule string), allow-wins-ties,
    default-allow, WITH the RFC 9309 special characters ('*' any
    sequence, trailing '$' end anchor — pattern_matches is the python
    twin).  Same zero-shuffle shape as politeness.robots_filter: rules
    aggregated per host into an array of structs, broadcast, evaluated
    map-side with array lambdas; each rule is pre-compiled ONCE to a
    SQL LIKE pattern ('%'/'_'/'\\' escaped, '*'->'%', un-anchored rules
    get a trailing '%'), so the per-candidate match is the JVM's native
    LIKE — no regex compilation per row, no UDF."""
    anchored = F.col("path_prefix").endswith("$")
    core = F.when(
        anchored,
        F.expr("substring(path_prefix, 1, length(path_prefix) - 1)"),
    ).otherwise(F.col("path_prefix"))
    esc = F.replace(core, F.lit("\\"), F.lit("\\\\"))
    esc = F.replace(esc, F.lit("%"), F.lit("\\%"))
    esc = F.replace(esc, F.lit("_"), F.lit("\\_"))
    like_pat = F.replace(esc, F.lit("*"), F.lit("%"))
    like_pat = F.when(anchored, like_pat).otherwise(
        F.concat(like_pat, F.lit("%"))
    )
    prepped = rules.withColumn("__pat", like_pat)
    per_host = prepped.groupBy("host").agg(
        F.collect_list(F.struct("rule", "path_prefix", "__pat")).alias("__rules")
    ).withColumnRenamed("host", host_col)
    path = F.regexp_replace(F.col(url_col), r"^[a-z]+://[^/]*", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    joined = candidates.join(F.broadcast(per_host), on=host_col, how="left")

    matching = F.filter(
        F.col("__rules"), lambda r: F.like(path, r["__pat"], F.lit("\\"))
    )
    # pick the winner: max by (prefix length, rule) — 'disallow' > 'allow'
    # lexicographically, so invert: rank allow higher by mapping rule to
    # 0/1 with allow=1 and taking array_max of (len, is_allow)
    ranked = F.transform(
        matching,
        lambda r: F.struct(
            F.length(r["path_prefix"]).alias("plen"),
            F.when(r["rule"] == "allow", F.lit(1)).otherwise(F.lit(0)).alias("is_allow"),
        ),
    )
    best = F.array_max(ranked)
    allowed = (
        F.col("__rules").isNull()
        | (F.size(matching) == 0)
        | (best["is_allow"] == 1)
    )
    return joined.filter(allowed).select(*candidates.columns)
