"""Sitemap monitor cadence loop (S7/U1 driver, reference
sitemap_monitor.py:297-371).

The reference runs a forever loop over a min-heap of
``(next_check_time, sitemap_url)``: pop the earliest, sleep until due,
diff the sitemap against the stored snapshot, launch a depth-1 crawl per
batch of 20 new URLs, then reschedule the sitemap at ``now() +
check_sitemap_hours``.  This module reproduces that scheduling contract
with every effectful dependency INJECTED (clock, sleep, fetch, crawl) so
the cadence is testable without wall-clock time, and bounded by
``max_checks`` (the reference's ``while True`` is the production setting).

The crawl callback is where the Spark engine plugs in: hand it a closure
that seeds ``CrawlEngine.run(batch, max_rounds=1)`` (depth_limit=1 per the
reference's sitemap-delta spider args) or any queue sink; the monitor
itself stays a driver-side scheduler — at 100 TB the per-sitemap URL sets
live in parquet snapshots and the diff runs through flows.sitemap_delta,
with this loop only deciding WHEN each sitemap is re-checked.
"""

from __future__ import annotations

import heapq
import time
from collections.abc import Callable, Iterable
from dataclasses import dataclass, field


@dataclass(frozen=True)
class SitemapRecord:
    """Per-sitemap scheduling config (reference records_map entries)."""

    sitemap_url: str
    check_sitemap_hours: float = 24.0  # _get_check_interval default shape
    depth_limit: int = 1  # sitemap-delta crawls are depth 1 (line 343)
    batch_size: int = 20  # itertools.batched(sorted(new_urls), 20) (line 345)


@dataclass
class CheckEvent:
    """One processed check, for assertions/metrics."""

    ts: float
    sitemap_url: str
    n_new: int
    n_total: int
    batches: list[list[str]] = field(default_factory=list)


class SitemapMonitor:
    """Heap-scheduled sitemap re-check loop with injectable effects.

    ``fetch_urls(sitemap_url) -> set[str]`` plays _fetch_sitemap;
    ``crawl(sitemap_url, batch, depth_limit)`` plays the dedicated-process
    spider launch; ``clock``/``sleep`` default to wall time.
    """

    def __init__(
        self,
        records: Iterable[SitemapRecord],
        fetch_urls: Callable[[str], set[str]],
        crawl: Callable[[str, list[str], int], None],
        clock: Callable[[], float] = time.time,
        sleep: Callable[[float], None] = time.sleep,
        inter_batch_sleep_s: float = 3.0,  # reference line 355
    ):
        self.records = {r.sitemap_url: r for r in records}
        self.fetch_urls = fetch_urls
        self.crawl = crawl
        self.clock = clock
        self.sleep = sleep
        self.inter_batch_sleep_s = inter_batch_sleep_s
        self.stored: dict[str, set[str]] = {}
        self.next_check_times: dict[str, float] = {}
        self.events: list[CheckEvent] = []

    def _interval_s(self, url: str) -> float:
        return self.records[url].check_sitemap_hours * 3600.0

    def run(self, max_checks: int) -> list[CheckEvent]:
        """Process up to ``max_checks`` heap pops; returns the event log."""
        now = self.clock()
        heap: list[tuple[float, str]] = []
        for url in self.records:
            # first check is due immediately (reference setup seeds now)
            self.next_check_times.setdefault(url, now)
            heapq.heappush(heap, (self.next_check_times[url], url))

        for _ in range(max_checks):
            if not heap:
                break
            due, url = heapq.heappop(heap)
            wait = due - self.clock()
            if wait > 0:
                self.sleep(wait)  # reference line 314-324

            record = self.records[url]
            current = set(self.fetch_urls(url))
            previous = self.stored.get(url, set())
            new_urls = current - previous  # line 283
            self.stored[url] = current

            event = CheckEvent(self.clock(), url, len(new_urls), len(current))
            if new_urls:
                ordered = sorted(new_urls)
                for i in range(0, len(ordered), record.batch_size):
                    batch = ordered[i : i + record.batch_size]
                    self.crawl(url, batch, record.depth_limit)  # blocking (line 353)
                    self.sleep(self.inter_batch_sleep_s)
                    event.batches.append(batch)
            self.events.append(event)

            # reschedule from POST-processing time (line 360)
            self.next_check_times[url] = self.clock() + self._interval_s(url)
            heapq.heappush(heap, (self.next_check_times[url], url))
        return self.events
