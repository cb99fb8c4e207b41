"""Pure-Python kernels: the single-node byte-parity reference implementations.

Every function here is deterministic and dependency-free (stdlib only) so the
same code runs identically on the driver (tests/oracles) and inside Arrow
batches on executors (functions/udfs.py).
"""

from .htmlx import FILTER_EXTENSIONS, ExtractedDoc, extract_html_doc, extract_links, extract_text
from .robotstxt import parse_robots, robots_allowed, robots_crawl_delay
from .textproc import (
    decode_bytes,
    detect_language,
    document_fingerprint,
    quality_score,
    sanitize_text,
    summarize_text,
    token_count,
    tokenize,
)
from .urlnorm import (
    canonicalize_url,
    get_title_from_filename,
    separate_filename,
    url_base_extension,
    dap_domain_is_valid,
    dap_domain_normalize,
    doc_id,
    domain_name,
    ensure_http_prefix,
    strip_jsessionid,
    url_basename,
    url_extension,
    url_host,
    url_path,
    url_query,
    url_seen_hash,
)

__all__ = [
    "FILTER_EXTENSIONS",
    "ExtractedDoc",
    "extract_html_doc",
    "extract_links",
    "extract_text",
    "parse_robots",
    "robots_allowed",
    "robots_crawl_delay",
    "decode_bytes",
    "detect_language",
    "document_fingerprint",
    "quality_score",
    "sanitize_text",
    "summarize_text",
    "token_count",
    "tokenize",
    "canonicalize_url",
    "get_title_from_filename",
    "separate_filename",
    "url_base_extension",
    "dap_domain_is_valid",
    "dap_domain_normalize",
    "doc_id",
    "domain_name",
    "ensure_http_prefix",
    "strip_jsessionid",
    "url_basename",
    "url_extension",
    "url_host",
    "url_path",
    "url_query",
    "url_seen_hash",
]
