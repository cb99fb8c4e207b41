"""Deterministic synthetic web generator (FIXTURES.md tables 1-5, seed 42).

Generates a Common-Crawl-style ``pages`` table
``(url, warc_ts, html:binary, text, lang)`` per BASELINE.json input_hint,
whose HTML embeds ``<a>/<area>/<va-link>`` links forming a known graph, so
link extraction reproduces the graph — the analog of the reference's recorded
quotes.toscrape.com HTTP cache
(tests/search_gov_crawler/search_gov_spiders/spiders/scrapy_httpcache/).

Every page is a pure function of ``(host_index, page_index, scale)`` — no
sequential RNG state — so generation is partition-parallel and byte-stable.
The ``text`` column is produced by the kernel extraction stack
(kernels.extract_text) at generation time: it is the byte-identity oracle the
distributed extraction must reproduce.

Graph shape per host (P pages, numbered 0..P-1, page 0 = root):
  * ternary tree: page k links to children 3k+1, 3k+2, 3k+3 (when < P)
  * k % 13 == 0 (k>0)   -> page lives under /tag/      (deny-path scenarios)
  * k % 11 == 0 (k>0)   -> page lives under /blocked/  (robots-denied)
  * k %  5 == 0         -> first child linked via a messy alias
                           (uppercase host, :443, #fragment) that
                           canonicalizes to the same URL
  * k %  9 == 0         -> second child linked with ;jsessionid=...
  * k %  4 == 0         -> extra link to a denied extension (.zip)
  * k %  6 == 0         -> extra query-string link (?ref=nav) to a
                           non-existent variant (query-filter scenarios)
  * k %  7 == 0         -> cross-host link to the next host's root
  * k %  8 == 0         -> fully offsite link (external-site.com)
  * k % 17 == 0 (k>0)   -> page body latin-1 encoded (decode cascade)
  * k % 10 == 3         -> Spanish text, else English
"""

from __future__ import annotations

import datetime as dt
import random
import re

import pandas as pd

from ..kernels.htmlx import extract_text

SEED = 42
EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

_EN_WORDS = (
    "data spark crawl frontier fetch parse index search page link depth host "
    "queue robot token bucket batch shuffle join filter scan text document "
    "government agency public record notice report policy service citizen"
).split()
_ES_WORDS = (
    "datos enlace pagina rastreo indice busqueda profundidad cola token "
    "informe publico aviso servicio agencia registro politica ciudadano"
).split()

SF_PAGES = {0.001: 2_000, 0.01: 20_000, 0.1: 200_000}
SF_HOSTS = {0.001: 20, 0.01: 60, 0.1: 200}


def host_name(h: int) -> str:
    return f"host{h}.example.gov"


def host_sizes(n_pages: int, n_hosts: int) -> list[int]:
    """Skewed page allocation: host0 25%, host1 15%, rest uniform."""
    sizes = [0] * n_hosts
    sizes[0] = n_pages // 4
    if n_hosts > 1:
        sizes[1] = (n_pages * 15) // 100
    remaining = n_pages - sizes[0] - (sizes[1] if n_hosts > 1 else 0)
    rest = n_hosts - min(2, n_hosts)
    for i in range(min(2, n_hosts), n_hosts):
        sizes[i] = remaining // rest
    sizes[-1] += n_pages - sum(sizes)
    return sizes


def page_path(k: int) -> str:
    if k == 0:
        return "/"
    if k % 13 == 0:
        return f"/tag/p{k}"
    if k % 11 == 0:
        return f"/blocked/p{k}"
    return f"/p{k}"


def page_url(h: int, k: int) -> str:
    return f"https://{host_name(h)}{page_path(k)}"


def page_links(h: int, k: int, host_pages: int, n_hosts: int, branch: int = 3) -> list[str]:
    """Raw hrefs as they appear in the page HTML (pre-canonicalization).

    ``branch`` is the link-tree fan-out (tests/fixtures use 3; the bench web
    uses a higher fan-out so BFS depth — and hence round count — stays low).
    """
    links: list[str] = []
    base_host = host_name(h)
    for i, c in enumerate(range(branch * k + 1, branch * k + branch + 1)):
        if c >= host_pages:
            continue
        path = page_path(c)
        if i == 0 and k % 5 == 0:
            links.append(f"HTTPS://{base_host.upper()}:443{path}#frag")
        elif i == 1 and k % 9 == 0:
            links.append(f"{path};jsessionid=A1B2C3")
        else:
            links.append(path)
    if k % 4 == 0:
        links.append(f"/static/file{k}.zip")
    if k % 6 == 0 and branch * k + branch < host_pages:
        links.append(f"{page_path(branch * k + branch)}?ref=nav")
    if k % 7 == 0 and n_hosts > 1:
        links.append(f"https://{host_name((h + 1) % n_hosts)}/")
    if k % 8 == 0:
        links.append("https://external-site.com/x")
    return links


def page_lang(k: int) -> str:
    return "es" if k % 10 == 3 else "en"


def _salad(rng: random.Random, words: list[str], n: int) -> str:
    """Deterministic word salad — byte-identical to
    ``" ".join(rng.choice(words) for _ in range(n))`` with the same rng.

    Inlined draw loop (r06): ``Random.choice`` routes every draw through
    two Python frames (choice -> _randbelow); this reproduces the exact
    rejection-sampling contract of ``Random._randbelow_with_getrandbits``
    (k = bit_length(len), redraw while >= len) against ``getrandbits``
    directly — ~2x fewer interpreter frames on the synthetic-web hot path.
    Equality with Random.choice is pinned by tests/test_fast_html_parity.py.
    """
    m = len(words)
    k = m.bit_length()
    gb = rng.getrandbits
    out = []
    append = out.append
    for _ in range(n):
        r = gb(k)
        while r >= m:
            r = gb(k)
        append(words[r])
    return " ".join(out)


_URL_RE = re.compile(r"^https://host(\d+)\.example\.gov(/.*)?$")
_PATH_RE = re.compile(r"^/(?:tag/|blocked/)?p(\d+)$")


def url_to_hk(url: str) -> tuple[int, int] | None:
    """Inverse of page_url: canonical URL -> (host_index, page_index).

    Returns None for URLs that don't address a generated page (the analog of
    an HTTP 404)."""
    m = _URL_RE.match(url)
    if not m:
        return None
    h = int(m.group(1))
    path = m.group(2) or "/"
    if path == "/":
        return h, 0
    m2 = _PATH_RE.match(path)
    if not m2:
        return None
    k = int(m2.group(1))
    if page_path(k) != path:
        return None
    return h, k


def build_page(h: int, k: int, host_pages: int, n_hosts: int, branch: int = 3, with_text: bool = True) -> dict:
    """Pure page constructor: (h, k, sizes) -> pages-table row.

    ``with_text=False`` skips the (expensive) oracle text-extraction column —
    the fetch path only needs the html bytes."""
    rng = random.Random(f"{SEED}:{h}:{k}")
    lang = page_lang(k)
    words = _ES_WORDS if lang == "es" else _EN_WORDS
    title = f"Host {h} Page {k}"
    para1 = _salad(rng, words, 24).capitalize() + "."
    para2 = _salad(rng, words, 18).capitalize() + "."
    latin1 = k % 17 == 0 and k > 0
    if latin1:
        para2 += " Café résumé über."
    desc = f"Synthetic page {k} on {host_name(h)}." if k % 3 == 0 else ""
    link_html = "".join(
        f'<a href="{href}">link {i}</a>\n'
        for i, href in enumerate(page_links(h, k, host_pages, n_hosts, branch))
    )
    meta_desc = f'<meta name="description" content="{desc}">' if desc else ""
    html = (
        f'<!DOCTYPE html><html lang="{lang}"><head><title>{title}</title>\n'
        f"{meta_desc}\n"
        f'<meta property="og:title" content="{title}">\n'
        f"</head><body>\n<h1>{title}</h1>\n<p>{para1}</p>\n<p>{para2}</p>\n"
        f"{link_html}<script>var x={k};</script>\n</body></html>"
    )
    encoding = "latin-1" if latin1 else "utf-8"
    html_bytes = html.encode(encoding)
    url = page_url(h, k)
    row = {
        "url": url,
        "warc_ts": EPOCH + dt.timedelta(seconds=h * 100_000 + k),
        "html": html_bytes,
        "lang": lang,
    }
    if with_text:
        row["text"] = extract_text(html_bytes, url)
    return row


def page_index(n_pages: int, n_hosts: int) -> list[tuple[int, int, int]]:
    """Global page list as (host, k, host_pages) triples."""
    sizes = host_sizes(n_pages, n_hosts)
    out = []
    for h, p in enumerate(sizes):
        out.extend((h, k, p) for k in range(p))
    return out


def pages_pandas(n_pages: int, n_hosts: int) -> pd.DataFrame:
    rows = [build_page(h, k, p, n_hosts) for h, k, p in page_index(n_pages, n_hosts)]
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


# --- robots (FIXTURES.md table 3) -------------------------------------------


def robots_text(h: int, n_hosts: int) -> str:
    if n_hosts > 2 and h == n_hosts - 1:
        return "User-agent: *\nDisallow: /\n"
    return (
        "User-agent: usasearch\nDisallow: /blocked/\nCrawl-delay: 1\n\n"
        "User-agent: *\nDisallow: /blocked/\nDisallow: /internal/\n"
    )


def robots_pandas(n_hosts: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "host": [host_name(h) for h in range(n_hosts)],
            "fetched_ts": [EPOCH] * n_hosts,
            "rules_text": [robots_text(h, n_hosts) for h in range(n_hosts)],
        }
    )


# --- seeds (FIXTURES.md table 2; shape: search_gov_app/crawl_config.py:24-42)


def seeds_pandas(n_hosts: int) -> pd.DataFrame:
    rows = [
        {
            "name": "host0-full",
            "allowed_domains": host_name(0),
            "starting_urls": page_url(0, 0),
            "allow_query_string": False,
            "handle_javascript": False,
            "output_target": "csv",
            "depth_limit": 20,
            "deny_paths": None,
            "schedule": None,
            "sitemap_urls": None,
            "check_sitemap_hours": None,
        },
        {
            "name": "host0-deny-tag",
            "allowed_domains": host_name(0),
            "starting_urls": page_url(0, 0),
            "allow_query_string": False,
            "handle_javascript": False,
            "output_target": "endpoint",
            "depth_limit": 20,
            "deny_paths": ["/tag/"],
            "schedule": None,
            "sitemap_urls": None,
            "check_sitemap_hours": None,
        },
        {
            "name": "two-hosts-depth3",
            "allowed_domains": f"{host_name(0)},{host_name(1 % n_hosts)}",
            "starting_urls": page_url(0, 0),
            "allow_query_string": True,
            "handle_javascript": False,
            "output_target": "opensearch",
            "depth_limit": 3,
            "deny_paths": None,
            "schedule": None,
            "sitemap_urls": None,
            "check_sitemap_hours": None,
        },
    ]
    return pd.DataFrame(rows)


# --- DAP visits (FIXTURES.md table 4) ----------------------------------------


def dap_visits_pandas(n_hosts: int, days: int = 28) -> pd.DataFrame:
    anchor = dt.date(2024, 1, 28)
    rows = []
    for h in range(n_hosts):
        dom = host_name(h)
        for d in range(days):
            day = anchor - dt.timedelta(days=d)
            rng = random.Random(f"{SEED}:dap:{h}:{d}")
            rows.append({"domain": dom, "date": int(day.strftime("%Y%m%d")), "visits": rng.randint(10, 5000)})
    rows.append({"domain": "(not set)", "date": 20240128, "visits": 5})
    rows.append({"domain": "12.34", "date": 20240128, "visits": 7})
    return pd.DataFrame(rows)


# --- sitemap snapshots (FIXTURES.md table 5) ---------------------------------


def sitemap_discovery_fixture(n_hosts: int) -> tuple[list[str], dict[str, tuple[int, str, str]]]:
    """Deterministic (bases, resources) web for the 4-method sitemap
    discovery (S8).  ``resources`` maps url -> (status, content_type, body);
    per host the fixture exercises: common-location hits and a wrong-type
    rejection (method 1), robots ``Sitemap:`` directives incl. http->https
    and an ignored relative one (method 2), <link rel> hrefs (method 3),
    sitemap-named .xml hrefs with and without confirmation (method 4)."""
    bases: list[str] = []
    res: dict[str, tuple[int, str, str]] = {}
    xml = "application/xml"
    sm_body = "<urlset><url><loc>https://x/</loc></url></urlset>"
    for h in range(n_hosts):
        host = host_name(h)
        base = f"https://{host}/"
        # every 4th base is a bare domain (exercises https+slash normalize)
        bases.append(host if h % 4 == 0 else base)
        # method 1 targets
        if h % 3 == 0:
            res[f"{base}sitemap.xml"] = (200, xml, sm_body)
        if h % 3 == 1:
            res[f"{base}sitemap_index.xml"] = (200, xml, sm_body)
        if h == 2:
            res[f"{base}sitemap.xml"] = (200, "text/html", "<html>not a sitemap</html>")
        # method 2: robots with one absolute http:// directive (fixed to
        # https) on even hosts and a relative directive the finder ignores
        robots_lines = ["User-agent: *", "Disallow: /internal/"]
        if h % 2 == 0:
            robots_lines.append(f"Sitemap: http://{host}/sm-robots.xml")
        robots_lines.append("Sitemap: /relative-sitemap.xml")
        res[f"{base}robots.txt"] = (200, "text/plain", "\n".join(robots_lines))
        # methods 3/4: base page html
        page_parts = [f"<html><head><title>{host}</title>"]
        if h % 2 == 1:
            page_parts.append('<link rel="sitemap" href="/linked-sitemap.xml">')
            res[f"{base}linked-sitemap.xml"] = (200, xml, sm_body)
        page_parts.append('</head><body><a href="files/data-sitemap.xml">data</a>')
        if h % 2 == 0:
            res[f"{base}files/data-sitemap.xml"] = (200, "text/xml", sm_body)
        page_parts.append('<a href="/plain.xml">feed</a></body></html>')
        res[f"{base}plain.xml"] = (200, xml, sm_body)  # no 'sitemap' in name: m4 skips
        res[base] = (200, "text/html", "".join(page_parts))
    return bases, res


def sitemap_snapshots_pandas(n_hosts: int) -> pd.DataFrame:
    rows = []
    for h in range(min(3, n_hosts)):
        sm = f"https://{host_name(h)}/sitemap.xml"
        first = [page_url(h, k) for k in (0, 1, 2)]
        second = first + [page_url(h, k) for k in (4, 5)]
        for u in first:
            rows.append({"sitemap_url": sm, "page_url": u, "snapshot_ts": EPOCH})
        for u in second:
            rows.append({"sitemap_url": sm, "page_url": u, "snapshot_ts": EPOCH + dt.timedelta(hours=48)})
    return pd.DataFrame(rows)
