"""Sitemap XML parsing kernel (SURVEY.md §2.1 S7/S8).

Pure-Python (xml.etree) parser for <urlset> and <sitemapindex> documents,
mirroring the reference's recursive sitemap fetch semantics
(sitemaps/sitemap_monitor.py:194-258: recurse into <sitemapindex> up to
max_depth, collect <loc> urls from <urlset>) and the 4-method discovery's
robots `Sitemap:` directive extraction (sitemaps/sitemap_finder.py:87-230).

Namespace-tolerant: matches tags by local name, as real sitemaps come with
and without the sitemaps.org namespace.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

_SITEMAP_DIRECTIVE_RE = re.compile(r"(?im)^\s*sitemap\s*:\s*(\S+)\s*$")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


@dataclass
class SitemapParse:
    page_urls: list[str] = field(default_factory=list)     # from <urlset><url><loc>
    child_sitemaps: list[str] = field(default_factory=list)  # from <sitemapindex><sitemap><loc>
    kind: str = "invalid"                                    # urlset | sitemapindex | invalid


def parse_sitemap_xml(body: str) -> SitemapParse:
    """Parse one sitemap document; malformed XML yields kind='invalid'."""
    out = SitemapParse()
    try:
        root = ET.fromstring(body.strip())
    except ET.ParseError:
        return out
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        return out
    out.kind = kind
    for entry in root:
        if _local(entry.tag) not in ("url", "sitemap"):
            continue
        for child in entry:
            if _local(child.tag) == "loc" and child.text and child.text.strip():
                loc = child.text.strip()
                if kind == "urlset":
                    out.page_urls.append(loc)
                else:
                    out.child_sitemaps.append(loc)
    return out


def expand_sitemaps(
    bodies: dict[str, str], roots: list[str], max_depth: int = 10
) -> dict[str, set[str]]:
    """Recursive expansion of sitemap roots to page-URL sets.

    ``bodies`` maps sitemap URL -> XML body (the fetched web); recursion
    follows <sitemapindex> children to ``max_depth`` (reference default 10,
    sitemap_monitor.py:194-258).  Returns root -> set of page urls.
    """
    result: dict[str, set[str]] = {}
    for root in roots:
        pages: set[str] = set()
        stack: list[tuple[str, int]] = [(root, 0)]
        visited: set[str] = set()
        while stack:
            url, depth = stack.pop()
            if url in visited or depth > max_depth:
                continue
            visited.add(url)
            body = bodies.get(url)
            if body is None:
                continue
            parsed = parse_sitemap_xml(body)
            pages.update(parsed.page_urls)
            for child in parsed.child_sitemaps:
                stack.append((child, depth + 1))
        result[root] = pages
    return result


def sitemaps_from_robots(rules_text: str | None) -> list[str]:
    """``Sitemap:`` directives from a robots.txt body (discovery method 2,
    sitemap_finder.py)."""
    if not rules_text:
        return []
    return _SITEMAP_DIRECTIVE_RE.findall(rules_text)
