"""Close-of-run monitor checks (A7 extension).

Spark rebuild of the reference's spidermon close-monitor suite
(search_gov_spiders/monitors.py:21-48 with thresholds from
settings/domain_spider.py:71-78): item-count minimum, unwanted-HTTP-code
counts vs a max, execution-time ceiling, and expected finish reason.  All
inputs are bounded aggregates (counts come from distributed Observations /
groupBy upstream), so the checks themselves are driver-side pure functions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# settings/domain_spider.py:73-78
EXPECTED_FINISH_REASONS = ("finished",)
MIN_ITEMS = 1
MAX_EXECUTION_TIME_S = 172_800  # 48 hours
UNWANTED_HTTP_CODES = (400, 407, 429, 500, 502, 503, 504, 523, 540, 541)
UNWANTED_HTTP_CODES_MAX_COUNT = 50


@dataclass
class MonitorSettings:
    min_items: int = MIN_ITEMS
    unwanted_http_codes: tuple[int, ...] = UNWANTED_HTTP_CODES
    unwanted_http_codes_max_count: int = UNWANTED_HTTP_CODES_MAX_COUNT
    max_execution_time_s: float = MAX_EXECUTION_TIME_S
    expected_finish_reasons: tuple[str, ...] = field(default=EXPECTED_FINISH_REASONS)


def status_code_counts(df: DataFrame, col: str = "status_code") -> dict[int, int]:
    """Distributed count per status code; the result is bounded by the number
    of distinct HTTP codes, so collecting it is driver-safe at any scale."""
    return {int(r[col]): int(r["n"]) for r in df.groupBy(col).agg(F.count("*").alias("n")).collect()}


def run_monitors(
    items_scraped: int,
    status_counts: dict[int, int],
    finish_reason: str,
    elapsed_seconds: float,
    settings: MonitorSettings | None = None,
) -> list[dict]:
    """Evaluate the four close monitors; returns one row per monitor with
    pass/fail and detail (the analog of spidermon's monitor results)."""
    s = settings or MonitorSettings()
    results = []
    results.append(
        {
            "monitor": "item_count",
            "passed": items_scraped >= s.min_items,
            "detail": f"items_scraped={items_scraped} min={s.min_items}",
        }
    )
    over = {
        code: n
        for code, n in sorted(status_counts.items())
        if code in s.unwanted_http_codes and n > s.unwanted_http_codes_max_count
    }
    results.append(
        {
            "monitor": "unwanted_http_codes",
            "passed": not over,
            "detail": f"over_threshold={over} max={s.unwanted_http_codes_max_count}",
        }
    )
    results.append(
        {
            "monitor": "execution_time",
            "passed": elapsed_seconds <= s.max_execution_time_s,
            "detail": f"elapsed_s={round(elapsed_seconds, 3)} max_s={s.max_execution_time_s}",
        }
    )
    results.append(
        {
            "monitor": "finish_reason",
            "passed": finish_reason in s.expected_finish_reasons,
            "detail": f"finish_reason={finish_reason!r} expected={list(s.expected_finish_reasons)}",
        }
    )
    return results


def monitors_from_run(run_metrics: list[dict], settings: MonitorSettings | None = None) -> list[dict]:
    """Monitor evaluation over a CrawlRun's per-round metrics.  The simulated
    fetch surfaces misses as 404-analogs; a live HTTP fetcher supplies real
    per-code counts via status_code_counts instead."""
    fetched = sum(m.get("fetched", 0) for m in run_metrics)
    missed = sum(m.get("missed", 0) for m in run_metrics)
    elapsed = sum(m.get("round_wall_s", 0.0) for m in run_metrics)
    stopped = bool(run_metrics and run_metrics[-1].get("stop"))
    return run_monitors(
        items_scraped=fetched,
        status_counts={200: fetched, 404: missed},
        finish_reason="finished" if stopped else "max_rounds",
        elapsed_seconds=elapsed,
        settings=settings,
    )
