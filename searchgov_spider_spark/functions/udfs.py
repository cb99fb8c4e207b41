"""Arrow-batched pandas UDFs wrapping the pure-Python kernels.

This is the only place kernel code crosses into Spark: every UDF is a
vectorized (Arrow batch) wrapper — no per-row Python UDFs anywhere in the
engine (BASELINE.json input_hint requirement).  Because the UDF bodies call
the exact kernel functions, distributed output is byte-identical to the
single-node reference implementations per row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..kernels import htmlx, robotstxt, textproc, urlnorm

# --- URL functions -----------------------------------------------------------


@pandas_udf(T.StringType())
def canonicalize_url(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: urlnorm.canonicalize_url(u) if u else u)


@pandas_udf(T.StringType())
def strip_jsessionid(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: urlnorm.strip_jsessionid(u) if u else u)


@pandas_udf(T.StringType())
def url_host(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: urlnorm.url_host(u) if u else "")


@pandas_udf(T.StringType())
def url_path(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: urlnorm.url_path(u) if u else "")


@pandas_udf(T.StringType())
def url_query(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: urlnorm.url_query(u) if u else "")


@pandas_udf(T.StringType())
def url_extension(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: urlnorm.url_extension(u) if u else "")


@pandas_udf(T.LongType())
def url_seen_hash(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: urlnorm.url_seen_hash(u) if u else 0).astype("int64")


@pandas_udf(T.StringType())
def doc_id(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: urlnorm.doc_id(u) if u else "")


@pandas_udf(T.StringType())
def domain_name(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: urlnorm.domain_name(u) if u else "")


@pandas_udf(T.StringType())
def url_join(base: pd.Series, rel: pd.Series) -> pd.Series:
    """RFC-3986 resolution of a (possibly relative) href against a base URL,
    absolute hrefs passed through (sitemap_finder.py:77-80 _join_base)."""
    from ..kernels import sitemapxml

    return pd.Series([sitemapxml.join_base(b or "", r or "") for b, r in zip(base, rel)])


ADMISSION_STRUCT = T.StructType(
    [
        T.StructField("url_canon", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("url_hash", T.LongType()),
    ]
)


def _admission_rows(urls, strip: bool):
    rows = []
    for u in urls:
        if not u:
            rows.append(("", "", 0))
            continue
        nojs = urlnorm.strip_jsessionid(u) if strip else u
        canon = urlnorm.canonicalize_url(nojs)
        rows.append((canon, urlnorm.url_host(canon), urlnorm.url_seen_hash(canon)))
    return pd.DataFrame(rows, columns=["url_canon", "host", "url_hash"])


@pandas_udf(ADMISSION_STRUCT)
def admission_parts(urls: pd.Series) -> pd.DataFrame:
    """Fused admission kernel chain (jsessionid strip -> canonicalize ->
    host -> seen-hash) in ONE Arrow round trip — the dependent chain would
    otherwise compile to 3-4 serial ArrowEvalPython nodes per round."""
    return _admission_rows(urls, strip=True)


@pandas_udf(ADMISSION_STRUCT)
def admission_parts_seed(urls: pd.Series) -> pd.DataFrame:
    """Seed variant: no jsessionid rewrite (dont_filter semantics)."""
    return _admission_rows(urls, strip=False)


# The kernels are pure functions, but Catalyst re-substitutes deterministic
# UDFs into filters pushed below their projection — evaluating the whole
# admission kernel TWICE per link (plan-test-pinned).  Marking them
# nondeterministic forbids that duplication; task-retry re-execution still
# yields identical values.
admission_parts = admission_parts.asNondeterministic()
admission_parts_seed = admission_parts_seed.asNondeterministic()


URL_PARTS_STRUCT = T.StructType(
    [
        T.StructField("basename", T.StringType()),
        T.StructField("extension", T.StringType()),
        T.StructField("url_path", T.StringType()),
        T.StructField("domain_name", T.StringType()),
    ]
)


@pandas_udf(URL_PARTS_STRUCT)
def url_doc_parts(urls: pd.Series) -> pd.DataFrame:
    """Document-schema URL fields in one Arrow round (indexing/helpers.py
    get_base_extension/get_url_path/get_domain_name; extension '' -> None
    happens at the caller per transform.py:96)."""
    rows = []
    for u in urls:
        if not u:
            rows.append(("", "", "", ""))
            continue
        stem, suffix, _name = urlnorm.url_base_extension(u)
        rows.append((stem, suffix, urlnorm.url_path(u), urlnorm.domain_name(u)))
    return pd.DataFrame(rows, columns=["basename", "extension", "url_path", "domain_name"])


DOC_META_STRUCT = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("basename", T.StringType()),
        T.StructField("extension", T.StringType()),
        T.StructField("url_path", T.StringType()),
        T.StructField("domain_name", T.StringType()),
        T.StructField("created_at", T.StringType()),
        T.StructField("changed", T.StringType()),
    ]
)

# (netloc, path) of an absolute http(s) URL in one match — group 1/2 equal
# urlsplit(url).netloc / .path exactly for this shape (see urlnorm notes)
_HTTP_NETLOC_PATH_RE = __import__("re").compile(r"^https?://([^/?#]*)([^?#]*)")


@pandas_udf(DOC_META_STRUCT)
def doc_meta(urls: pd.Series, created_raw: pd.Series, changed_raw: pd.Series) -> pd.DataFrame:
    """Fused per-document metadata kernel for the crawl round loop (r06):
    doc_id + url_doc_parts + both parse_dates in ONE Arrow round trip —
    previously 5 ArrowEvalPython column evaluations per round (and three
    urlsplit calls per row inside url_doc_parts alone).  Field semantics
    are identical to the individual UDFs (differential-tested)."""
    from ..kernels import dates

    rows = []
    for u, cr, ch in zip(urls, created_raw, changed_raw):
        if not u:
            rows.append(("", "", "", "", "", None, None))
            continue
        m = _HTTP_NETLOC_PATH_RE.match(u)
        if m is not None:
            netloc, path = m.group(1), m.group(2)
            name = path[path.rfind("/") + 1 :]
            if name.endswith("."):
                name = name[:-1]
            if "." in name:
                stem, _, suffix = name.rpartition(".")
            else:
                stem, suffix = name, ""
        else:  # non-http shapes: the kernels' ensure_http_prefix + urlsplit
            stem, suffix, _name = urlnorm.url_base_extension(u)
            path = urlnorm.url_path(u)
            netloc = urlnorm.domain_name(u)
        rows.append(
            (
                urlnorm.doc_id(u),
                stem,
                suffix,
                path,
                netloc,
                dates.parse_dates_safely(cr) if cr else None,
                dates.parse_dates_safely(ch) if ch else None,
            )
        )
    return pd.DataFrame(
        rows,
        columns=["id", "basename", "extension", "url_path", "domain_name", "created_at", "changed"],
    )


@pandas_udf(T.StringType())
def parse_dates(raw: pd.Series) -> pd.Series:
    """dateutil fuzzy parse -> ISO string, unparsable -> null (X7,
    indexing/helpers.py:36-65 parse_dates_safely)."""
    from ..kernels import dates

    return pd.Series([dates.parse_dates_safely(v) if v else None for v in raw], dtype=object)


# --- extraction --------------------------------------------------------------

DOC_STRUCT = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("keywords", T.StringType()),
        T.StructField("language", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("audience", T.StringType()),
        T.StructField("created_raw", T.StringType()),
        T.StructField("changed_raw", T.StringType()),
        T.StructField("thumbnail_url", T.StringType()),
    ]
)

_DOC_FIELDS = ("title", "description", "keywords", "language", "content",
               "audience", "created_raw", "changed_raw", "thumbnail_url")

# doc + links in one parse (the engine's hot path: avoids parsing the HTML twice)
DOC_LINKS_STRUCT = T.StructType(
    list(DOC_STRUCT.fields) + [T.StructField("links", T.ArrayType(T.StringType()))]
)


@pandas_udf(T.ArrayType(T.StringType()))
def extract_links(html: pd.Series, base_url: pd.Series) -> pd.Series:
    out = []
    for body, url in zip(html, base_url):
        if body is None:
            out.append([])
            continue
        out.append(htmlx.extract_links(textproc.decode_bytes(bytes(body)), url or ""))
    return pd.Series(out)


@pandas_udf(DOC_STRUCT)
def extract_doc(html: pd.Series, url: pd.Series, lang_hint: pd.Series) -> pd.DataFrame:
    rows = []
    for body, u, lh in zip(html, url, lang_hint):
        if body is None:
            rows.append(("",) * len(_DOC_FIELDS))
            continue
        doc = htmlx.extract_html_doc(textproc.decode_bytes(bytes(body)), u or "", lh or "")
        rows.append(tuple(getattr(doc, f) for f in _DOC_FIELDS))
    return pd.DataFrame(rows, columns=list(_DOC_FIELDS))


@pandas_udf(DOC_LINKS_STRUCT)
def extract_doc_links(html: pd.Series, url: pd.Series, lang_hint: pd.Series) -> pd.DataFrame:
    rows = []
    for body, u, lh in zip(html, url, lang_hint):
        if body is None:
            rows.append(("",) * len(_DOC_FIELDS) + ([],))
            continue
        doc = htmlx.extract_html_doc(textproc.decode_bytes(bytes(body)), u or "", lh or "")
        rows.append(tuple(getattr(doc, f) for f in _DOC_FIELDS) + (doc.links,))
    return pd.DataFrame(rows, columns=[*_DOC_FIELDS, "links"])


@pandas_udf(T.StringType())
def extract_text(html: pd.Series, url: pd.Series) -> pd.Series:
    out = []
    for body, u in zip(html, url):
        out.append("" if body is None else htmlx.extract_text(bytes(body), u or ""))
    return pd.Series(out)


# --- PDF (X4/X15; minimal-subset kernel, see kernels/pdfx.py) -----------------

_PDF_FIELDS = ("title", "description", "content", "links", "created_at", "changed", "updated")

PDF_STRUCT = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
        T.StructField("created_at", T.StringType()),
        T.StructField("changed", T.StringType()),
        T.StructField("updated", T.StringType()),
    ]
)


@pandas_udf(PDF_STRUCT)
def extract_pdf_doc(body: pd.Series, url: pd.Series) -> pd.DataFrame:
    """PDF -> document fields via the single-node kernel
    (kernels.pdfx.convert_pdf; reference transform.py:120-195): title from
    /Info metadata or filename, title+filename content/description prepend
    (X15), annots ∪ text-url links (U4), exif-parsed dates (X7)."""
    from ..kernels import pdfx

    rows = []
    for b, u in zip(body, url):
        if b is None:
            rows.append(("", "", "", [], None, None, None))
            continue
        doc = pdfx.convert_pdf(bytes(b), u or "")
        rows.append(tuple(doc[f] for f in _PDF_FIELDS))
    return pd.DataFrame(rows, columns=list(_PDF_FIELDS))


# --- sitemaps ----------------------------------------------------------------

SITEMAP_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("page_urls", T.ArrayType(T.StringType())),
        T.StructField("child_sitemaps", T.ArrayType(T.StringType())),
    ]
)


@pandas_udf(SITEMAP_STRUCT)
def parse_sitemap(body: pd.Series) -> pd.DataFrame:
    from ..kernels import sitemapxml

    rows = []
    for b in body:
        if b is None:
            rows.append(("invalid", [], []))
            continue
        p = sitemapxml.parse_sitemap_xml(b)
        rows.append((p.kind, p.page_urls, p.child_sitemaps))
    return pd.DataFrame(rows, columns=["kind", "page_urls", "child_sitemaps"])


# --- robots ------------------------------------------------------------------


@pandas_udf(T.BooleanType())
def robots_allowed(rules_text: pd.Series, url: pd.Series) -> pd.Series:
    # parse each distinct robots body once per batch
    cache: dict[str, robotstxt.RobotsRules] = {}
    out = []
    for rt, u in zip(rules_text, url):
        if rt is None or not rt:
            out.append(True)
            continue
        rules = cache.get(rt)
        if rules is None:
            rules = robotstxt.parse_robots(rt)
            cache[rt] = rules
        out.append(rules.allowed(u))
    return pd.Series(out)


@pandas_udf(T.DoubleType())
def robots_crawl_delay(rules_text: pd.Series) -> pd.Series:
    cache: dict[str, float | None] = {}
    out = []
    for rt in rules_text:
        if rt is None or not rt:
            out.append(None)
            continue
        if rt not in cache:
            cache[rt] = robotstxt.robots_crawl_delay(rt)
        out.append(cache[rt])
    return pd.Series(out, dtype="float64")


# --- text analysis -----------------------------------------------------------


@pandas_udf(T.StringType())
def detect_language(text: pd.Series) -> pd.Series:
    return text.map(lambda t: textproc.detect_language(t) if t else "en")


@pandas_udf(T.DoubleType())
def quality_score(text: pd.Series) -> pd.Series:
    return text.map(lambda t: textproc.quality_score(t) if t else 0.0).astype("float64")


@pandas_udf(T.IntegerType())
def token_count(text: pd.Series) -> pd.Series:
    return text.map(lambda t: textproc.token_count(t) if t else 0).astype("int32")


@pandas_udf(T.LongType())
def document_fingerprint(text: pd.Series) -> pd.Series:
    return text.map(lambda t: textproc.document_fingerprint(t) if t else 0).astype("int64")


@pandas_udf(T.StringType())
def sanitize_text(text: pd.Series) -> pd.Series:
    return text.map(lambda t: textproc.sanitize_text(t) if t else "")


def with_url_columns(df, url_col: str = "url"):
    """Convenience: append canonical/host/query columns used by admission."""
    return (
        df.withColumn("url_nojs", strip_jsessionid(F.col(url_col)))
        .withColumn("url_canon", canonicalize_url(F.col("url_nojs")))
        .withColumn("host", url_host(F.col("url_canon")))
        .drop("url_nojs")
    )
