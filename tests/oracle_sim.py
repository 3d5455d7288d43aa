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
    max_retries: int = 3,
    flaky_mod: int = 0,
):
    """Returns (crawl_order, frontier_rows, extracted_texts, retry_counts).

    crawl_order: list of (seq, round, url) — FIRST attempts only (retries
    never re-enter the order, matching the engine's min-round frontier);
    frontier_rows: dict url -> (depth, status) with the LATEST status;
    extracted_texts: url -> soup text; retry_counts: url -> retries used.

    Retry rule (crawler_node.py:160,887-916): a failed fetch re-enters the
    next round at the same depth until retry_count == max_retries. With
    ``flaky_mod`` > 0, a fetch also fails transiently while
    attempt < crc32(url) % flaky_mod (same rule as the engine's fault
    injection in operators/frontier.py).
    """
    import zlib

    seen: set[str] = set()
    host_counts: dict[str, int] = defaultdict(int)
    frontier: dict[str, tuple[int, str]] = {}
    retry_counts: dict[str, int] = defaultdict(int)
    order: list[tuple[int, int, str]] = []
    extracted: dict[str, str] = {}
    depth_of: dict[str, int] = {}
    seq = 0

    def admit(candidates: list[tuple[str, int]]) -> list[str]:
        """Apply gates in reference order (_enqueue_url): depth, seen,
        robots, budget — budget consumed in canonical (url asc) order.
        Candidate depth = min over discovering parents of parent_depth+1
        (with retries, round number and depth diverge)."""
        depth_by_url: dict[str, int] = {}
        for url, depth in candidates:
            if url not in depth_by_url or depth < depth_by_url[url]:
                depth_by_url[url] = depth
        admitted = []
        for url in sorted(depth_by_url):
            depth = depth_by_url[url]
            if depth > max_depth:
                continue
            if url in seen:
                continue
            if respect_robots and not robots_allowed(url, robots):
                continue
            host = get_domain_py(url)
            if host_counts[host] >= max_urls_per_domain:
                continue
            seen.add(url)
            host_counts[host] += 1
            depth_of[url] = depth
            admitted.append(url)
        return admitted

    pending = admit([(u, 0) for u in seeds])
    rnd = 0
    # backstop mirrors the engine (operators/scheduler.py run()): sized
    # for the worst delayed chain — retried parents succeeding late push
    # in-depth children past the naive max_depth+max_retries bound
    bound = (max_depth + 1) * (max_retries + 1)
    while pending and rnd <= bound:
        discovered: list[tuple[str, int]] = []
        retries: list[str] = []
        for url in sorted(pending):
            attempt = retry_counts[url]
            if attempt == 0:
                seq += 1
                order.append((seq, rnd, url))
            html = pages.get(url)
            transient = flaky_mod > 0 and attempt < (
                zlib.crc32(url.encode()) % flaky_mod
            )
            if html is None or transient:
                frontier[url] = (depth_of[url], "failed")
                if attempt < max_retries:
                    retry_counts[url] = attempt + 1
                    retries.append(url)
                continue
            parsed = parse_page_py(html.decode("utf-8", errors="ignore"), url)
            extracted[url] = parsed["text"]
            frontier[url] = (depth_of[url], "completed")
            discovered.extend(
                (link, depth_of[url] + 1) for link in parsed["links"]
            )
        pending = admit(discovered) + retries
        rnd += 1
    for url in pending:  # un-processed tail (depth or retry cap reached)
        frontier[url] = (depth_of[url], "pending")
    return order, frontier, extracted, dict(retry_counts)
