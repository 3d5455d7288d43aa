"""Randomized crawl parity: engine ≡ oracle over seeded random webs with
random budgets/depths/robots — dangling links, self-links, duplicate
links, cross-host edges, schemeless hrefs all occur by construction."""

from __future__ import annotations

import random
import shutil

import pytest

from distributed_crawler_spark.config import CrawlConfig
from distributed_crawler_spark.functions.urls import get_domain_py
from distributed_crawler_spark.operators.scheduler import CrawlScheduler

from .oracle_sim import simulate


def _random_web(seed: int):
    rng = random.Random(seed)
    n = rng.randint(10, 40)
    hosts = [f"h{rng.choice([0, 0, 0, 1, 2, 3, 4])}.test" for _ in range(n)]
    urls = [f"https://{hosts[i]}/p/{i}" for i in range(n)]

    pages: dict[str, bytes] = {}
    for i in range(n):
        k = rng.randint(0, 5)
        hrefs = []
        for _ in range(k):
            r = rng.random()
            if r < 0.1:
                hrefs.append(f"https://{hosts[i]}/missing/{rng.randint(0, 99)}")  # dangling
            elif r < 0.2:
                hrefs.append(urls[i])                      # self link
            elif r < 0.3:
                hrefs.append(f"/p/{rng.randrange(n)}")      # relative (maybe dangling)
            elif r < 0.35:
                hrefs.append("javascript:void(0)")
            else:
                hrefs.append(urls[rng.randrange(n)] + rng.choice(["", "#f", "/"]))
        body = "".join(f'<a href="{h}">x</a>' for h in hrefs)
        pages[urls[i]] = (
            f"<html><head><title>p{i}</title></head><body>text {i}{body}</body></html>"
        ).encode()

    robots: dict[str, list[str]] = {}
    for h in set(hosts):
        if rng.random() < 0.3:
            robots[h] = [rng.choice(["/p/1", "/p/2", "/"])]

    seeds = sorted(rng.sample(urls, rng.randint(1, min(4, n))))
    budget = rng.choice([1, 2, 5, 100])
    depth = rng.choice([1, 2, 3])
    return pages, robots, seeds, budget, depth


@pytest.mark.parametrize("seed", [11, 23, 47, 89, 131])
def test_random_web_parity(spark, seed):
    pages, robots, seeds, budget, depth = _random_web(seed)

    order, frontier, extracted, _ = simulate(
        pages, robots, seeds, max_depth=depth, max_urls_per_domain=budget
    )
    _assert_engine_matches(
        spark, seed, pages, robots, seeds, budget, depth,
        order, frontier, extracted,
    )


@pytest.mark.parametrize("seed", [7, 59, 103])
def test_random_web_parity_with_flaky_retries(spark, seed):
    """Same randomized parity with transient fetch failures and a random
    retry budget — the retry/re-feed machinery must agree with the
    row-at-a-time oracle on arbitrary graphs, not just the fixed corpus."""
    rng = random.Random(seed * 7919)
    pages, robots, seeds, budget, depth = _random_web(seed)
    max_retries = rng.choice([0, 1, 2, 3])
    flaky_mod = rng.choice([2, 3, 4])

    order, frontier, extracted, _ = simulate(
        pages, robots, seeds, max_depth=depth, max_urls_per_domain=budget,
        max_retries=max_retries, flaky_mod=flaky_mod,
    )
    _assert_engine_matches(
        spark, f"flaky{seed}", pages, robots, seeds, budget, depth,
        order, frontier, extracted,
        max_retries=max_retries, flaky_mod=flaky_mod,
    )


def test_mega_web_parity(spark):
    """One seeded ~10^4-page web with mega-domain skew, robots rules,
    dangling/relative links and a binding per-host budget (VERDICT r05
    next #4): ordering or budget tie-break bugs that only manifest past
    a partition boundary are invisible at the 10-40-page sizes above —
    at 10^4 urls the canonical (round, url) order and the salted
    two-phase budget window both span many partitions, so full
    order/status/text parity here is the emergent-order check the small
    webs can't provide (SURVEY §7.4.1)."""
    rng = random.Random(4242)
    n = 10_000
    hosts = [
        "mega.test" if rng.random() < 0.6 else f"h{rng.randrange(50)}.test"
        for _ in range(n)
    ]
    urls = [f"https://{hosts[i]}/p/{i}" for i in range(n)]
    pages: dict[str, bytes] = {}
    for i in range(n):
        hrefs = []
        for _ in range(rng.randint(2, 5)):
            r = rng.random()
            if r < 0.05:
                hrefs.append(f"https://{hosts[i]}/missing/{rng.randrange(999)}")
            elif r < 0.1:
                hrefs.append(f"/p/{rng.randrange(n)}")
            else:
                hrefs.append(urls[rng.randrange(n)])
        body = "".join(f'<a href="{h}">x</a>' for h in hrefs)
        pages[urls[i]] = (
            f"<html><head><title>p{i}</title></head>"
            f"<body>t {i} {body}</body></html>"
        ).encode()
    robots = {"mega.test": ["/p/1"], "h3.test": ["/"], "h7.test": ["/p/2"]}
    seeds = sorted(rng.sample(urls, 40))
    budget, depth = 1500, 6

    order, frontier, extracted, _ = simulate(
        pages, robots, seeds, max_depth=depth, max_urls_per_domain=budget
    )
    # the skew + budget must actually bind for the test to mean anything
    assert sum(1 for u in frontier if get_domain_py(u) == "mega.test") == budget
    assert len(order) > 4000
    _assert_engine_matches(
        spark, "mega", pages, robots, seeds, budget, depth,
        order, frontier, extracted,
    )


def _assert_engine_matches(
    spark, tag, pages, robots, seeds, budget, depth,
    order, frontier, extracted, max_retries=3, flaky_mod=0,
):

    pages_df = spark.createDataFrame(
        [(u, b) for u, b in pages.items()], ["url", "html"]
    ).selectExpr("url", "CAST(NULL AS TIMESTAMP) AS warc_ts", "html")
    robots_df = spark.createDataFrame(
        [(h, p) for h, ps in robots.items() for p in ps] or [("__none__", "/x")],
        ["host", "path_prefix"],
    )
    seeds_df = spark.createDataFrame([(u,) for u in seeds], ["url"])

    state = f"/tmp/dcs_randweb_{tag}"
    shutil.rmtree(state, ignore_errors=True)
    cfg = CrawlConfig(
        max_depth=depth, max_urls_per_domain=budget,
        max_retries=max_retries, flaky_mod=flaky_mod,
    )
    sched = CrawlScheduler(spark, pages_df, robots_df, state, cfg)
    sched.run(seeds=seeds_df)

    got_frontier = {
        r["url"]: (r["depth"], r["status"]) for r in sched.frontier().collect()
    }
    assert got_frontier == frontier, f"seed={seed} budget={budget} depth={depth}"

    got_order = [
        (r["seq"], r["round"], r["url"])
        for r in sched.crawl_order().orderBy("seq").collect()
    ]
    assert got_order[: len(order)] == order

    got_text = {
        r["url"]: r["text"] for r in sched.extracted_all().select("url", "text").collect()
    }
    assert got_text == extracted
