"""Pure-Python oracle simulator of the canonical crawl semantics.

Implements, row-at-a-time like the reference master (master_node.py:315-448
_enqueue_url + 450-539 result recursion), the semantics the Spark engine
must match: BFS by depth, robots prefix rules with default-allow, global
per-host budget consumed in canonical order (url asc within a round),
global URL-seen dedup, fetch-miss → failed.

Deliberately shares NO code with the engine's DataFrame path — it parses
the same HTML corpus with the same parse function (the parse function
itself has its own byte-parity tests against reference semantics).
"""

from __future__ import annotations

from collections import defaultdict

import duckdb

from distributed_crawler_spark.functions.extract import parse_page_py
from distributed_crawler_spark.functions.urls import get_domain_py


def load_corpus(corpus_dir: str):
    con = duckdb.connect()
    pages = {
        url: bytes(html)
        for url, html in con.execute(
            f"SELECT url, html FROM '{corpus_dir}/pages.parquet/*.parquet'"
        ).fetchall()
    }
    robots = defaultdict(list)
    for host, prefix in con.execute(
        f"SELECT host, path_prefix FROM '{corpus_dir}/robots.parquet/*.parquet'"
    ).fetchall():
        robots[host].append(prefix)
    seeds = [
        r[0]
        for r in con.execute(
            f"SELECT url FROM '{corpus_dir}/seeds.parquet/*.parquet' ORDER BY url"
        ).fetchall()
    ]
    con.close()
    return pages, dict(robots), seeds


def robots_allowed(url: str, robots: dict[str, list[str]]) -> bool:
    host = get_domain_py(url)
    rules = robots.get(host)
    if not rules:
        return True  # default-allow (utils.py:64-66)
    path = url.split(host, 1)[1] or "/"
    return not any(path.startswith(p) for p in rules)


def simulate(
    pages: dict[str, bytes],
    robots: dict[str, list[str]],
    seeds: list[str],
    max_depth: int = 3,
    max_urls_per_domain: int = 100,
    respect_robots: bool = True,
):
    """Returns (crawl_order, frontier_rows, extracted_texts).

    crawl_order: list of (seq, round, url); frontier_rows: dict
    url -> (depth, status); extracted_texts: url -> soup text.
    """
    seen: set[str] = set()
    host_counts: dict[str, int] = defaultdict(int)
    frontier: dict[str, tuple[int, str]] = {}
    order: list[tuple[int, int, str]] = []
    extracted: dict[str, str] = {}
    seq = 0

    def admit(candidates: list[str], depth: int) -> list[str]:
        """Apply gates in reference order (_enqueue_url): depth, seen,
        robots, budget — budget consumed in canonical (url asc) order."""
        nonlocal seq
        admitted = []
        if depth > max_depth:
            return admitted
        for url in sorted(set(candidates)):
            if url in seen:
                continue
            if respect_robots and not robots_allowed(url, robots):
                continue
            host = get_domain_py(url)
            if host_counts[host] >= max_urls_per_domain:
                continue
            seen.add(url)
            host_counts[host] += 1
            admitted.append(url)
        return admitted

    pending = admit(seeds, 0)
    rnd = 0
    while pending and rnd <= max_depth:
        discovered: list[str] = []
        for url in sorted(pending):
            seq += 1
            order.append((seq, rnd, url))
            html = pages.get(url)
            if html is None:
                frontier[url] = (rnd, "failed")
                continue
            parsed = parse_page_py(html.decode("utf-8", errors="ignore"), url)
            extracted[url] = parsed["text"]
            frontier[url] = (rnd, "completed")
            discovered.extend(parsed["links"])
        pending = admit(discovered, rnd + 1)
        rnd += 1
    for url in pending:  # un-processed tail (depth cap reached)
        frontier[url] = (rnd, "pending")
    return order, frontier, extracted
