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


# --- 4-method sitemap discovery (S8; sitemaps/sitemap_finder.py:56-230) -------

# sitemap_finder.py:61-72
COMMON_SITEMAP_NAMES = (
    "sitemap.xml",
    "wp-sitemap.xml",
    "page-sitemap.xml",
    "tag-sitemap.xml",
    "category-sitemap.xml",
    "sitemap1.xml",
    "post-sitemap.xml",
    "sitemap_index.xml",
    "sitemap-index.xml",
    "sitemapindex.xml",
)

# sitemap_finder.py:169 / :196-199 / :221-224
ROBOTS_SITEMAP_RE = re.compile(r"(?i)Sitemap:\s*(https?://\S+)")
LINK_TAG_RE = re.compile(
    r"""<link[^>]*rel=["'](?:sitemap|alternate)["'][^>]*href=["']([^"']+)["']""", re.IGNORECASE
)
SITEMAP_XML_HREF_RE = re.compile(r"""href=["']([^"']*sitemap[^"']*\.xml)["']""", re.IGNORECASE)
ANY_XML_HREF_RE = re.compile(r"""href=["']([^"']+\.xml)["']""", re.IGNORECASE)


def normalize_base(base_url: str) -> str:
    """Trailing slash + https prefix (sitemap_finder.py:95-97)."""
    base_url = base_url if base_url.endswith("/") else f"{base_url}/"
    if not base_url.startswith(("http://", "https://")):
        base_url = f"https://{base_url}"
    return base_url


def fix_http(url: str) -> str:
    """strip + leading http:// -> https:// (sitemap_finder.py:82-86)."""
    url = url.strip()
    if url.startswith("http://"):
        return url.replace("http://", "https://")
    return url


def join_base(base_url: str, sitemap_path: str) -> str:
    """urljoin unless already absolute (sitemap_finder.py:77-80)."""
    from urllib.parse import urljoin

    if not sitemap_path.startswith(("http://", "https://")):
        return urljoin(base_url, sitemap_path)
    return sitemap_path


def confirm_sitemap_url(resource: tuple[int, str] | None) -> bool:
    """HEAD confirmation analog (sitemap_finder.py:112-137): the resource
    must exist, be 200, and have an xml Content-Type."""
    if resource is None:
        return False
    status, content_type = resource[0], resource[1] or ""
    return status == 200 and "xml" in content_type.lower()


def find_sitemaps(base_url: str, resources: dict[str, tuple[int, str, str]]) -> set[str]:
    """All four discovery methods over a fetched-resource map — the
    single-node oracle for flows.discover_sitemaps.

    ``resources`` maps URL -> (status_code, content_type, body); it plays
    the HTTP layer (HEAD confirm = status+type, GET = body).  Methods
    (sitemap_finder.py:88-230): 1 common locations (confirmed), 2 robots.txt
    ``Sitemap:`` directives (absolute-only, fix_http, NOT confirmed),
    3 HTML <link rel> + sitemap-ish hrefs (join_base+fix_http, confirmed),
    4 any .xml href containing 'sitemap' (urljoin, NO fix_http, confirmed).
    """
    from urllib.parse import urljoin

    base_url = normalize_base(base_url)
    found: list[str] = []

    # method 1: common locations
    for name in COMMON_SITEMAP_NAMES:
        candidate = urljoin(base_url, name)
        if confirm_sitemap_url(resources.get(candidate)):
            found.append(candidate)

    # method 2: robots.txt Sitemap: directives
    robots = resources.get(urljoin(base_url, "robots.txt"))
    if robots is not None and robots[0] == 200:
        found.extend(fix_http(m) for m in ROBOTS_SITEMAP_RE.findall(robots[2]))

    # methods 3 + 4 read the base page HTML
    page = resources.get(base_url)
    if page is not None and page[0] == 200:
        html = page[2]
        m3 = LINK_TAG_RE.findall(html) + SITEMAP_XML_HREF_RE.findall(html)
        for rel in m3:
            candidate = fix_http(join_base(base_url, rel))
            if confirm_sitemap_url(resources.get(candidate)):
                found.append(candidate)
        for rel in ANY_XML_HREF_RE.findall(html):
            if "sitemap" in rel.lower():
                candidate = urljoin(base_url, rel)
                if confirm_sitemap_url(resources.get(candidate)):
                    found.append(candidate)

    return set(found)
