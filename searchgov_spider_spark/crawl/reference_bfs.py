"""Single-node reference BFS crawler — the crawl-ordering / URL-seen oracle.

Plays the role of the reference's golden full-crawl tests
(tests/search_gov_crawler/search_gov_spiders/spiders/
test_domain_spider_full_crawl.py:57-123: 378/74/120 items on a replayed HTTP
cache): a pure-Python breadth-first crawl with the exact admission pipeline
the Spark engine implements, producing the expected visited-URL set, per-URL
depth, and FIFO discovery order.  Spark results are asserted equal to this.

Admission pipeline per discovered href (mirrors the reference's middleware
order — SURVEY.md §3.1 step 5):
  extension filter (in link extraction) -> jsessionid strip
  (middlewares.py:58-65) -> canonicalize (dupefilter fingerprint) -> offsite
  filter (middlewares.py:205-264) -> query-string filter (middlewares.py:45-56)
  -> depth cap (DepthMiddleware, DEPTH_LIMIT) -> robots allow (ROBOTSTXT_OBEY)
  -> URL-seen dedup at enqueue (job_state/dupefilter.py:8-25).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from ..kernels.htmlx import extract_links
from ..kernels.robotstxt import RobotsRules, parse_robots
from ..kernels.textproc import decode_bytes
from ..kernels.urlnorm import canonicalize_url, strip_jsessionid, url_host, url_path, url_query


@dataclass
class CrawlPolicy:
    allowed_domains: list[str]          # "host" or "host/path/" entries
    allow_query_string: bool = False
    depth_limit: int = 3
    deny_paths: list[str] = field(default_factory=list)
    agent: str = "usasearch"


def host_allowed(host: str, policy: CrawlPolicy) -> bool:
    for entry in policy.allowed_domains:
        allowed_host = entry.split("/", 1)[0].lower()
        if host == allowed_host or host.endswith("." + allowed_host):
            return True
    return False


def path_allowed(url: str, policy: CrawlPolicy) -> bool:
    """Path-restricted allowed_domains entries ("host/path/") bind the path
    (reference middlewares.py:237-264)."""
    host = url_host(url)
    path = url_path(url)
    unrestricted = False
    restricted_ok = False
    any_restricted = False
    for entry in policy.allowed_domains:
        parts = entry.split("/", 1)
        allowed_host = parts[0].lower()
        if not (host == allowed_host or host.endswith("." + allowed_host)):
            continue
        if len(parts) == 1 or not parts[1]:
            unrestricted = True
        else:
            any_restricted = True
            if path.startswith("/" + parts[1].rstrip("/")):
                restricted_ok = True
    if unrestricted:
        return True
    if any_restricted:
        return restricted_ok
    return False


def admit(
    raw_url: str,
    depth: int,
    policy: CrawlPolicy,
    robots: dict[str, RobotsRules],
    seen: set[str],
    is_seed: bool = False,
) -> str | None:
    """Run the admission pipeline; return the canonical URL if admitted.

    Seeds (``is_seed``) bypass the jsessionid rewrite, query-string filter,
    deny paths AND the offsite filter — the reference's start requests are
    dont_filter=True (middlewares.py:114-115), and Scrapy's downloader
    OffsiteMiddleware exempts dont_filter requests too (its process_request
    is ``if request.dont_filter or self.should_follow(...)``); depth/robots
    still apply (RobotsTxtMiddleware does not honor dont_filter)."""
    url = raw_url if is_seed else strip_jsessionid(raw_url)
    canon = canonicalize_url(url)
    host = url_host(canon)
    if not is_seed and (not host_allowed(host, policy) or not path_allowed(canon, policy)):
        return None
    if not is_seed:
        if not policy.allow_query_string and url_query(canon):
            return None
        if any(dp in url_path(canon) for dp in policy.deny_paths):
            return None
    if depth > policy.depth_limit:
        return None
    rules = robots.get(host)
    if rules is not None and not rules.allowed(canon):
        return None
    if canon in seen:
        return None
    seen.add(canon)
    return canon


@dataclass
class CrawlResult:
    # admission (FIFO) order of canonical URLs, including fetch-misses
    order: list[str]
    depth: dict[str, int]
    fetched: set[str]      # URLs found in the pages table
    missed: set[str]       # admitted but absent from the pages table


def reference_crawl(
    pages: dict[str, bytes],
    robots_texts: dict[str, str],
    start_urls: list[str],
    policy: CrawlPolicy,
) -> CrawlResult:
    """Breadth-first crawl of an in-memory web.

    ``pages`` maps canonical URL -> html bytes; ``robots_texts`` maps host ->
    robots.txt body.  FIFO queue + dedup-at-enqueue reproduces the Scrapy
    BFO order contract (SURVEY.md §2.5 O1).
    """
    robots = {h: parse_robots(t, policy.agent) for h, t in robots_texts.items()}
    seen: set[str] = set()
    order: list[str] = []
    depth: dict[str, int] = {}
    fetched: set[str] = set()
    missed: set[str] = set()
    queue: deque[tuple[str, int]] = deque()

    for s in start_urls:
        canon = admit(s, 0, policy, robots, seen, is_seed=True)
        if canon:
            order.append(canon)
            depth[canon] = 0
            queue.append((canon, 0))

    while queue:
        url, d = queue.popleft()
        body = pages.get(url)
        if body is None:
            missed.add(url)
            continue
        fetched.add(url)
        html = decode_bytes(body)
        for href in extract_links(html, url):
            canon = admit(href, d + 1, policy, robots, seen)
            if canon:
                order.append(canon)
                depth[canon] = d + 1
                queue.append((canon, d + 1))
    return CrawlResult(order=order, depth=depth, fetched=fetched, missed=missed)
