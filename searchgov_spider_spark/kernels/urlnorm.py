"""URL canonicalization and URL-part kernels (pure Python, vectorizable).

Single-node reference implementations of the URL semantics the crawl engine
relies on.  These functions are the byte-parity oracle: the distributed
pandas-UDF path (searchgov_spider_spark.functions.udfs) calls exactly these
kernels, so the Spark output per URL is byte-identical to a single-node run.

Semantics mirror the reference crawler's request-fingerprint canonicalization
(reference: search_gov_crawler/search_gov_spiders/job_state/dupefilter.py:8-25,
which inherits scrapy-redis RFPDupeFilter -> scrapy RequestFingerprinter ->
w3lib.url.canonicalize_url) and its URL helpers
(reference: search_gov_crawler/search_gov_spiders/middlewares.py:45-65,
search_gov_crawler/indexing/helpers.py:143-192).  Implemented from the public
w3lib/RFC-3986 specification -- no reference code is copied.

Canonicalization spec (north_rule):
  * scheme and host lowercased
  * default ports stripped (http:80, https:443, ftp:21)
  * fragment removed
  * query parameters parsed with blank values kept, sorted by (key, value),
    re-encoded with a stable quoting alphabet
  * path percent-encoding normalized (unquote then re-quote, preserving
    reserved characters), empty path -> "/"
"""

from __future__ import annotations

import hashlib
import posixpath
import re
from urllib.parse import (
    parse_qsl,
    quote,
    unquote,
    urlencode,
    urlparse,
    urlsplit,
    urlunsplit,
)

DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21, "ws": 80, "wss": 443}

# characters left un-escaped when re-quoting paths; matches the conservative
# RFC-3986 path charset used by w3lib.safe_url_string
_PATH_SAFE = "/@:;,!$&'()*+=~-._"
_QUERY_SAFE = "-._~"



# Fast-path recognizer: scheme://host/path where the path contains only
# characters that round-trip quote(unquote(p), _PATH_SAFE) unchanged (all of
# _PATH_SAFE plus alphanumerics, NO '%', no query/fragment, no port/userinfo,
# host needs only lowercasing).  For such URLs the canonical form is just
# lower(scheme)://lower(host)+path — byte-identical to the full pipeline
# (hypothesis-verified in tests), at ~1/10 the cost; the overwhelmingly
# common shape for crawl-discovered links.
_FAST_URL_RE = re.compile(
    r"^(https?)://([A-Za-z0-9](?:[A-Za-z0-9.-]*[A-Za-z0-9])?)"
    r"(/[A-Za-z0-9/@:;,!$&'()*+=~\-._]*)?$"
)


def canonicalize_url(url: str) -> str:
    """Canonical form of ``url`` per the north_rule spec (see module doc)."""
    url = url.strip()
    m = _FAST_URL_RE.match(url)
    if m:
        scheme, host, path = m.group(1).lower(), m.group(2).lower(), m.group(3) or "/"
        return f"{scheme}://{host}{path}"
    return _canonicalize_slow(url)


def _canonicalize_slow(url: str) -> str:
    """The full RFC-3986 pipeline; the fast path above must be byte-identical
    on every URL it accepts (property-tested)."""
    parts = urlsplit(url)
    scheme = parts.scheme.lower() or "http"

    host = (parts.hostname or "").lower().rstrip(".")
    # rebuild netloc: userinfo + host + non-default port
    netloc = host
    if parts.username:
        userinfo = parts.username
        if parts.password:
            userinfo += f":{parts.password}"
        netloc = f"{userinfo}@{netloc}"
    try:
        port = parts.port
    except ValueError:
        port = None
    if port is not None and DEFAULT_PORTS.get(scheme) != port:
        netloc = f"{netloc}:{port}"

    path = quote(unquote(parts.path), safe=_PATH_SAFE) or "/"

    keyvals = parse_qsl(parts.query, keep_blank_values=True)
    keyvals.sort()
    query = urlencode(keyvals, safe=_QUERY_SAFE)

    return urlunsplit((scheme, netloc, path, query, ""))


def strip_jsessionid(url: str) -> str:
    """Clear the last path segment's params when they contain "jsessionid".

    Mirrors reference middlewares.py:58-65 (_remove_url_jsession_id) exactly:
    ``urlparse`` exposes only the LAST segment's ``;params``; when those
    contain "jsessionid" (case-insensitive) the ENTIRE params component is
    dropped (so ``/a;p1;jsessionid=X?q=1`` -> ``/a?q=1``).  Occurrences in
    mid-path segments or the query string are left untouched, as upstream.
    The call-site guard (middlewares.py:120-123) only rewrites when
    "jsessionid" appears case-insensitively anywhere in the URL.
    """
    if "jsessionid" not in url.lower():
        return url
    parts = urlparse(url)
    if "jsessionid" in parts.params.lower():
        return parts._replace(params="").geturl()
    return url


# netloc extractor for the hostname fast path: group 1 is the authority of
# any absolute-URL shape urlsplit recognizes; when it carries no userinfo,
# port, or IPv6 bracket, ``hostname`` is exactly its lowercase form.
_FAST_NETLOC_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)")


def url_host(url: str) -> str:
    """Lowercased hostname of ``url`` ('' when unparseable)."""
    m = _FAST_NETLOC_RE.match(url)
    if m is not None:
        netloc = m.group(1)
        if "@" not in netloc and ":" not in netloc and "[" not in netloc:
            return netloc.lower()
    return (urlsplit(url).hostname or "").lower()


def url_path(url: str) -> str:
    """Path component, http-prefixed first (reference indexing/helpers.py
    get_url_path)."""
    return urlsplit(ensure_http_prefix(url)).path


def url_query(url: str) -> str:
    return urlsplit(url).query


def ensure_http_prefix(url: str) -> str:
    """Prefix with https:// unless already http(s) (reference
    indexing/helpers.py ensure_http_prefix — a literal startswith check,
    so e.g. "ftp://x" also gets prefixed, matching the reference exactly)."""
    return url if url.startswith(("http://", "https://")) else f"https://{url}"


# http(s) URL path extractor: group 1 is exactly ``urlsplit(url).path`` for
# any absolute http/https URL (netloc = everything up to the first '/', '?'
# or '#'; path = up to '?' or '#').  Fast path for the per-link deny filter;
# non-http shapes fall back to urlsplit.
_HTTP_PATH_RE = re.compile(r"^https?://[^/?#]*([^?#]*)")


def url_extension(url: str) -> str:
    """Lowercased final-segment file extension without the dot ('' if none).

    Used by the link-extraction deny filter (case-insensitive, as Scrapy's
    LinkExtractor compares lowered extensions); for the document-field
    extension with original case see url_base_extension."""
    m = _HTTP_PATH_RE.match(url)
    if m is not None:
        path = m.group(1)
        base = path[path.rfind("/") + 1 :]  # == posixpath.basename(path)
    else:
        base = posixpath.basename(urlsplit(url).path)
    if "." not in base:
        return ""
    return base.rsplit(".", 1)[1].lower()


def url_base_extension(url: str) -> tuple[str, str, str]:
    """(stem, suffix-without-dot, full name) of the URL basename, case
    preserved (reference indexing/helpers.py get_base_extension)."""
    url = ensure_http_prefix(url)
    name = posixpath.basename(urlsplit(url).path)
    if name.endswith("."):
        name = name[:-1]
    if "." in name:
        stem, _, suffix = name.rpartition(".")
        return stem, suffix, name
    return name, "", name


def url_basename(url: str) -> str:
    """Final path segment stem (reference indexing/helpers.py get_base_extension)."""
    return url_base_extension(url)[0]


def domain_name(url: str) -> str:
    """The URL's netloc, case and ``www.`` preserved (reference
    indexing/helpers.py get_domain_name returns ``urlparse(url).netloc``;
    DAP matching strips ``www.`` separately at join time)."""
    url = ensure_http_prefix(url)
    return urlsplit(url).netloc


_CAMEL_OR_SEP_RE = re.compile(
    r"(?<!^)(?=[A-Z][a-z])|(?<=[a-z])(?=[A-Z])|[-_+~,%]|(?<=\D)(?=\d)|(?<=\d)(?=\D)"
)


def separate_filename(filename: str) -> str:
    """Split a filename into words at camelCase, separator and letter/digit
    boundaries, keeping capitalization (reference indexing/helpers.py
    separate_filename)."""
    from urllib.parse import unquote_plus

    basename = unquote_plus(filename).rsplit(".", 1)[0].replace(".", " ")
    words = _CAMEL_OR_SEP_RE.split(basename)
    return " ".join(str(w).strip() for w in words if w)


def get_title_from_filename(filename: str) -> str:
    """Unquoted filename stem for use as a document title (reference
    indexing/helpers.py get_title_from_filename)."""
    from pathlib import Path
    from urllib.parse import unquote_plus

    return Path(unquote_plus(filename)).stem


def doc_id(url: str) -> str:
    """sha256 hex of the http-prefixed URL (reference indexing/helpers.py:176-179)."""
    return hashlib.sha256(ensure_http_prefix(url).encode("utf-8")).hexdigest()


def url_seen_hash(url_canon: str) -> int:
    """Stable signed-64-bit hash of a canonical URL for the seen-set.

    Uses blake2b-8byte (stable across processes, unlike ``hash()``);
    interpreted as signed to match Spark LongType.
    """
    digest = hashlib.blake2b(url_canon.encode("utf-8"), digest_size=8).digest()
    value = int.from_bytes(digest, "big", signed=True)
    return value


def dap_domain_normalize(url_or_domain: str) -> str:
    """Strip scheme/path, lowercase, strip www. (reference dap/transform.py:61-71)."""
    value = url_or_domain.strip().lower()
    value = re.sub(r"^[a-z][a-z0-9+.-]*://", "", value)
    value = value.split("/", 1)[0].split("?", 1)[0].split("#", 1)[0]
    if value.startswith("www."):
        value = value[4:]
    return value


def dap_domain_is_valid(domain: str) -> bool:
    """Validity filter for DAP domains (reference dap/transform.py:9-34).

    Rejects empty, "(not set)", purely-numeric, leading-dot and dot-less
    entries.
    """
    if not domain or domain == "(not set)":
        return False
    if domain.startswith("."):
        return False
    if "." not in domain:
        return False
    if domain.replace(".", "").isdigit():
        return False
    return True
