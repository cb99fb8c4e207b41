"""robots.txt parsing and allow/deny evaluation (pure Python).

The reference delegates to Scrapy's RobotsTxtMiddleware (ROBOTSTXT_OBEY=True,
search_gov_crawler/search_gov_spiders/settings/domain_spider.py:13) with
user-agent "usasearch" (settings/common.py:16), i.e. standard
urllib.robotparser longest-match semantics.  This module implements the same
public REP semantics (RFC 9309): group selection by longest user-agent
substring match, rule selection by longest path-prefix match with allow
winning ties, ``*`` wildcard and ``$`` end-anchor support, plus Crawl-delay.

Parsed rules are precompiled per host on the driver or inside a pandas UDF;
evaluation is a pure function suitable for Arrow batches.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import unquote, urlsplit

DEFAULT_AGENT = "usasearch"


@dataclass
class RobotsRules:
    # list of (allow: bool, original_pattern, compiled_regex, pattern_length)
    rules: list[tuple[bool, str, re.Pattern, int]] = field(default_factory=list)
    crawl_delay: float | None = None

    def allowed(self, url: str) -> bool:
        path = urlsplit(url).path or "/"
        query = urlsplit(url).query
        target = unquote(path) + (f"?{query}" if query else "")
        best: tuple[int, bool] | None = None
        for allow, pattern, rx, plen in self.rules:
            if rx.match(target):
                key = (plen, allow)
                if best is None or key > best:
                    best = key
        return True if best is None else best[1]


def _compile_pattern(pattern: str) -> re.Pattern:
    parts = []
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    for chunk in body.split("*"):
        parts.append(re.escape(unquote(chunk)))
    rx = ".*".join(parts)
    if anchored:
        rx += "$"
    return re.compile(rx)


def parse_robots(rules_text: str, agent: str = DEFAULT_AGENT) -> RobotsRules:
    """Parse robots.txt, returning the rule group for ``agent``.

    Group selection: the group whose User-agent token is the longest
    case-insensitive substring of ``agent`` wins; ``*`` matches with length 0.
    """
    agent = agent.lower()
    groups: list[tuple[int, RobotsRules]] = []
    current: RobotsRules | None = None
    current_match = -1
    expecting_agents = True
    for raw in rules_text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            token = value.lower()
            match_len = -1
            if token == "*":
                match_len = 0
            elif token in agent:
                match_len = len(token)
            if expecting_agents and current is not None:
                current_match = max(current_match, match_len)
            else:
                current = RobotsRules()
                current_match = match_len
                expecting_agents = True
            if current is None:
                current = RobotsRules()
                current_match = match_len
        elif key in ("allow", "disallow") and current is not None:
            expecting_agents = False
            if current_match >= 0 and value:
                current.rules.append((key == "allow", value, _compile_pattern(value), len(value)))
            elif current_match >= 0 and not value and key == "disallow":
                pass  # "Disallow:" empty = allow all; no rule needed
            if current_match >= 0 and not any(g[0] == current_match and g[1] is current for g in groups):
                groups.append((current_match, current))
        elif key == "crawl-delay" and current is not None and current_match >= 0:
            expecting_agents = False
            try:
                current.crawl_delay = float(value)
            except ValueError:
                pass
            if not any(g[1] is current for g in groups):
                groups.append((current_match, current))
    if not groups:
        return RobotsRules()
    best_len = max(g[0] for g in groups)
    merged = RobotsRules()
    for glen, grp in groups:
        if glen == best_len:
            merged.rules.extend(grp.rules)
            if grp.crawl_delay is not None:
                merged.crawl_delay = grp.crawl_delay
    return merged


def robots_allowed(rules_text: str | None, url: str, agent: str = DEFAULT_AGENT) -> bool:
    """True when ``url`` may be fetched under ``rules_text`` (missing = allow)."""
    if not rules_text:
        return True
    return parse_robots(rules_text, agent).allowed(url)


def robots_crawl_delay(rules_text: str | None, agent: str = DEFAULT_AGENT) -> float | None:
    if not rules_text:
        return None
    return parse_robots(rules_text, agent).crawl_delay
