"""Unit tests for the pure-Python kernels (byte-parity reference surface).

Golden pairs modeled on the reference's own unit-test strategy
(tests/search_gov_crawler/.../test_content.py, test_encoding.py,
test_indexing_helpers.py — SURVEY.md §5)."""

import pytest

from searchgov_spider_spark.kernels import (
    canonicalize_url,
    dap_domain_is_valid,
    dap_domain_normalize,
    decode_bytes,
    detect_language,
    doc_id,
    document_fingerprint,
    domain_name,
    ensure_http_prefix,
    extract_html_doc,
    extract_links,
    parse_robots,
    quality_score,
    robots_allowed,
    sanitize_text,
    strip_jsessionid,
    summarize_text,
    token_count,
    url_basename,
    url_extension,
    url_host,
    url_seen_hash,
)


class TestCanonicalize:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            # lowercase scheme+host
            ("HTTPS://Example.GOV/Path", "https://example.gov/Path"),
            # strip default port
            ("https://example.gov:443/a", "https://example.gov/a"),
            ("http://example.gov:80/a", "http://example.gov/a"),
            # keep non-default port
            ("http://example.gov:8080/a", "http://example.gov:8080/a"),
            # strip fragment
            ("https://example.gov/a#section", "https://example.gov/a"),
            # sort query params (by key then value)
            ("https://example.gov/a?b=2&a=1", "https://example.gov/a?a=1&b=2"),
            ("https://example.gov/a?x=2&x=1", "https://example.gov/a?x=1&x=2"),
            # keep blank values
            ("https://example.gov/a?b=&a=1", "https://example.gov/a?a=1&b="),
            # empty path -> /
            ("https://example.gov", "https://example.gov/"),
            ("https://example.gov?q=1", "https://example.gov/?q=1"),
            # percent-encoding normalization (unreserved chars decoded)
            ("https://example.gov/%7Euser", "https://example.gov/~user"),
            # space encoding in query
            ("https://example.gov/?q=a b", "https://example.gov/?q=a+b"),
            # trailing dot host
            ("https://example.gov./a", "https://example.gov/a"),
        ],
    )
    def test_pairs(self, raw, expected):
        assert canonicalize_url(raw) == expected

    def test_idempotent(self):
        urls = [
            "HTTPS://A.Gov:443/x/y?b=2&a=1#f",
            "http://h.gov/p;jsessionid=ABC?z=9",
            "https://example.gov/%7Euser/file.html?a=%20b",
        ]
        for u in urls:
            c1 = canonicalize_url(u)
            assert canonicalize_url(c1) == c1

    def test_aliases_collapse(self):
        a = canonicalize_url("HTTPS://Example.GOV:443/docs/?b=2&a=1#frag")
        b = canonicalize_url("https://example.gov/docs/?a=1&b=2")
        assert a == b
        assert url_seen_hash(a) == url_seen_hash(b)


class TestUrlParts:
    def test_jsessionid(self):
        assert (
            strip_jsessionid("https://h.gov/p;jsessionid=1A2B?x=1")
            == "https://h.gov/p?x=1"
        )
        assert strip_jsessionid("https://h.gov/p;JSESSIONID=abc") == "https://h.gov/p"
        assert strip_jsessionid("https://h.gov/p?x=1") == "https://h.gov/p?x=1"

    def test_jsessionid_reference_edge_cases(self):
        # the WHOLE params component of the last segment is dropped
        # (reference _remove_url_jsession_id uses urlparse params)
        assert (
            strip_jsessionid("https://h.gov/a;p1;jsessionid=X?q=1")
            == "https://h.gov/a?q=1"
        )
        # mid-path segment params are NOT touched (urlparse only exposes the
        # last segment's params)
        assert (
            strip_jsessionid("https://h.gov/a;jsessionid=X/b")
            == "https://h.gov/a;jsessionid=X/b"
        )
        # query-string occurrences are NOT touched
        assert (
            strip_jsessionid("https://h.gov/a?jsessionid=X")
            == "https://h.gov/a?jsessionid=X"
        )

    def test_parts(self):
        assert url_host("https://WWW.Example.gov/a") == "www.example.gov"
        assert domain_name("https://www.example.gov/a") == "www.example.gov"  # netloc, www kept (ref parity)
        assert url_extension("https://h.gov/a/report.PDF") == "pdf"
        assert url_extension("https://h.gov/a/page") == ""
        assert url_basename("https://h.gov/a/report.pdf") == "report"
        assert ensure_http_prefix("example.gov/x") == "https://example.gov/x"
        assert ensure_http_prefix("http://e.gov") == "http://e.gov"

    def test_doc_id_is_sha256(self):
        import hashlib

        url = "https://example.gov/a"
        assert doc_id(url) == hashlib.sha256(url.encode()).hexdigest()
        # scheme-less urls get prefixed first (indexing/helpers.py:176-179)
        assert doc_id("example.gov/a") == hashlib.sha256(b"https://example.gov/a").hexdigest()

    def test_dap_domain(self):
        assert dap_domain_normalize("HTTPS://WWW.Example.GOV/path?q=1") == "example.gov"
        assert dap_domain_is_valid("example.gov")
        assert not dap_domain_is_valid("(not set)")
        assert not dap_domain_is_valid("12.34")
        assert not dap_domain_is_valid(".gov")
        assert not dap_domain_is_valid("localhost")


class TestTextProc:
    def test_sanitize_entities_and_whitespace(self):
        assert sanitize_text("a&nbsp;b") == "a b"
        assert sanitize_text("a&#13;&#10;b") == "a b"
        assert sanitize_text("  a \t b \n\n c ") == "a b c"
        assert sanitize_text("x\x00y\x07z") == "xyz"
        assert sanitize_text("x\x0by") == "x y"  # whitespace control chars -> space (ref parity)
        assert sanitize_text("") == ""

    def test_decode_cascade(self):
        assert decode_bytes("héllo".encode("utf-8")) == "héllo"
        assert decode_bytes("héllo".encode("latin-1")) == "héllo"

    def test_langid(self):
        assert detect_language("the quick brown fox is on the hill and it is fast") == "en"
        assert detect_language("el perro y el gato en la casa de un ser que no es") == "es"
        assert detect_language("der hund und die katze in den garten mit dem ball") == "de"
        assert detect_language("") == "en"
        assert detect_language("zzz qqq xxx") == "en"

    def test_token_count_and_quality(self):
        assert token_count("Hello, world! it's 42") == 4
        assert quality_score("") == 0.0
        good = "the quick brown fox jumps over the lazy dog and runs far away " * 10
        assert quality_score(good) > 0.5

    def test_summarize_deterministic(self):
        text = (
            "Spark runs fast. Spark scales jobs. Ducks swim slowly. "
            "Spark spark spark is the word."
        )
        s1 = summarize_text(text)
        s2 = summarize_text(text)
        assert s1 == s2
        assert "spark" in s1[1].split(",")[0]

    def test_fingerprint_stable(self):
        body = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
        assert document_fingerprint(body) == document_fingerprint(body)
        # whitespace/case normalization: tokenizer-level equality
        assert document_fingerprint(body) == document_fingerprint(body.upper().replace("  ", " \t "))
        assert document_fingerprint(body) != document_fingerprint(body + " omega " * 8)
        assert document_fingerprint("") == 0
        assert isinstance(document_fingerprint(body), int)


class TestHtmlExtraction:
    HTML = """<!DOCTYPE html><html lang="en"><head>
    <title>My &amp; Page</title>
    <meta name="description" content="A test page.">
    <meta name="keywords" content="a,b">
    <meta property="og:title" content="OG Title">
    </head><body>
    <h1>Header text</h1>
    <p>Body paragraph one.</p>
    <a href="/rel/link">anchor text excluded</a>
    <area href="https://other.gov/area">
    <va-link href="/va/path"></va-link>
    <a href="/dup">x</a><a href="/dup">y</a>
    <a href="/file.zip">zipped</a>
    <a href="mailto:x@y.gov">mail</a>
    <a href="#frag">frag</a>
    <script>var hidden = 1;</script>
    <style>.x{}</style>
    <button>click me</button>
    <p>Body paragraph two.</p>
    </body></html>"""

    def test_links(self):
        links = extract_links(self.HTML, "https://example.gov/base/")
        assert links == [
            "https://example.gov/rel/link",
            "https://other.gov/area",
            "https://example.gov/va/path",
            "https://example.gov/dup",
        ]

    def test_doc_fields(self):
        doc = extract_html_doc(self.HTML, "https://example.gov/base/")
        assert doc.title == "OG Title"
        assert doc.description == "A test page."
        assert doc.keywords == "a,b"
        assert doc.language == "en"
        assert "Header text" in doc.content
        assert "Body paragraph one." in doc.content
        assert "anchor text excluded" not in doc.content
        assert "hidden" not in doc.content
        assert "click me" not in doc.content

    def test_title_fallback_and_summary(self):
        html = "<html><head><title>T</title></head><body><p>One two. Three four.</p></body></html>"
        doc = extract_html_doc(html)
        assert doc.title == "T"
        assert doc.description  # filled from summary
        assert doc.summary == doc.description

    def test_malformed_html_no_crash(self):
        doc = extract_html_doc("<html><p>ok<a href='/x'>l</p>")
        assert "ok" in doc.content


class TestRobots:
    RULES = """
# comment
User-agent: googlebot
Disallow: /google-only/

User-agent: usasearch
Disallow: /private/
Allow: /private/open/
Crawl-delay: 2

User-agent: *
Disallow: /all-denied/
"""

    def test_group_selection(self):
        assert robots_allowed(self.RULES, "https://h.gov/private/x") is False
        assert robots_allowed(self.RULES, "https://h.gov/private/open/x") is True
        assert robots_allowed(self.RULES, "https://h.gov/google-only/x") is True
        # usasearch group wins over *; /all-denied only binds other agents
        assert robots_allowed(self.RULES, "https://h.gov/all-denied/x") is True
        assert robots_allowed(self.RULES, "https://h.gov/public") is True

    def test_star_group_for_unknown_agent(self):
        assert robots_allowed(self.RULES, "https://h.gov/all-denied/x", agent="otherbot") is False

    def test_wildcards_and_anchor(self):
        rules = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*/x\n"
        assert robots_allowed(rules, "https://h.gov/doc.pdf") is False
        assert robots_allowed(rules, "https://h.gov/doc.pdfx") is True
        assert robots_allowed(rules, "https://h.gov/tmp123/x") is False

    def test_longest_match_allow_wins_ties(self):
        rules = "User-agent: *\nDisallow: /a/\nAllow: /a/b/\n"
        assert robots_allowed(rules, "https://h.gov/a/z") is False
        assert robots_allowed(rules, "https://h.gov/a/b/z") is True

    def test_empty_and_missing(self):
        assert robots_allowed(None, "https://h.gov/x") is True
        assert robots_allowed("", "https://h.gov/x") is True
        assert robots_allowed("User-agent: *\nDisallow:\n", "https://h.gov/x") is True

    def test_crawl_delay(self):
        assert parse_robots(self.RULES).crawl_delay == 2.0

    def test_disallow_all(self):
        rules = "User-agent: *\nDisallow: /\n"
        assert robots_allowed(rules, "https://h.gov/") is False
        assert robots_allowed(rules, "https://h.gov/any") is False


class TestDates:
    def test_parse_dates_safely(self):
        from searchgov_spider_spark.kernels.dates import parse_dates_safely

        assert parse_dates_safely("2024-01-03") == "2024-01-03T00:00:00"
        assert parse_dates_safely(None, "", "Jan 3, 2024 10:30") == "2024-01-03T10:30:00"
        assert parse_dates_safely("not a date at all zzz qq") is None
        assert parse_dates_safely() is None
        import datetime as dt

        assert parse_dates_safely(dt.datetime(2023, 5, 6, 7, 8, 9)) == "2023-05-06T07:08:09"
        # first parsable wins
        assert parse_dates_safely("", "2020-02-02", "2021-03-03") == "2020-02-02T00:00:00"

    def test_parse_exif_date(self):
        import datetime as dt

        from searchgov_spider_spark.kernels.dates import parse_exif_date

        assert parse_exif_date("D:20150113143419Z00'00'") == dt.datetime(2015, 1, 13, 14, 34, 19)
        assert parse_exif_date("D:20191018122555-04'00'") == dt.datetime(2019, 10, 18, 12, 25, 55)
        assert parse_exif_date("D:20191018162538") == dt.datetime(2019, 10, 18, 16, 25, 38)
        assert parse_exif_date("D:20191018122555-04'00'", apply_tz_offset=True) == dt.datetime(
            2019, 10, 18, 12, 25, 55,
            tzinfo=dt.timezone(dt.timedelta(hours=-4)),
        )
        assert parse_exif_date("D:2019") is None            # malformed numeric
        assert parse_exif_date("D:20191301000000") is None  # month 13 -> ValueError
        assert parse_exif_date(42) == 42                    # non-string passthrough
        assert parse_exif_date("Some Title") == "Some Title"  # sanitized string

    def test_charset_sniffing(self):
        from searchgov_spider_spark.kernels.textproc import decode_bytes, sniff_charset

        # BOMs
        assert decode_bytes("héllo".encode("utf-16")) == "héllo"          # BOM'd utf-16
        assert sniff_charset("x".encode("utf-16-le")) is None             # no BOM
        # meta charset declaration wins over latin-1 fallback
        cp1252 = '<html><head><meta charset="cp1252"></head><body>’quote’</body></html>'.encode("cp1252")
        assert "’" in decode_bytes(cp1252)
        # declared-but-wrong charset falls through to latin-1
        bad = b'<meta charset="utf-8">caf\xe9'
        assert decode_bytes(bad) == bad.decode("latin-1")
        # unknown codec name ignored
        assert sniff_charset(b'<meta charset="notacodec">\xff') is None

    def test_statistical_charset_fallback(self):
        """Undeclared charsets (X6, reference helpers/encoding.py:9-18
        cchardet analog): golden byte/text pairs per encoding family."""
        from searchgov_spider_spark.kernels.textproc import (
            decode_bytes,
            detect_charset_statistical,
        )

        ru = "<html><body>Добро пожаловать на официальный сайт города</body></html>"
        assert detect_charset_statistical(ru.encode("cp1251")) == "cp1251"
        assert decode_bytes(ru.encode("cp1251")) == ru

        ja = "<html><body>国土交通省のホームページへようこそ。詳細はこちら。</body></html>"
        assert detect_charset_statistical(ja.encode("shift_jis")) == "shift_jis"
        assert decode_bytes(ja.encode("shift_jis")) == ja

        fr = "<html><body>Bienvenue à l'hôtel de ville — café, déjà vu, naïve</body></html>"
        # cp1252 em-dash 0x97 is invalid utf-8 and has no BOM/meta declaration
        assert detect_charset_statistical(fr.encode("cp1252")) == "cp1252"
        assert decode_bytes(fr.encode("cp1252")) == fr

        # pure-ascii high-byte-free input: no statistical opinion
        assert detect_charset_statistical(b"plain ascii only") is None


class TestCanonicalizeFastPath:
    def test_fast_equals_slow_on_fast_shapes(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from searchgov_spider_spark.kernels.urlnorm import (
            _FAST_URL_RE,
            _canonicalize_slow,
            canonicalize_url,
        )

        path_chars = st.sampled_from(list("/@:;,!$&'()*+=~-._" "abcXYZ09"))
        host_chars = st.sampled_from(list("abcXYZ09.-"))

        @settings(max_examples=300, deadline=None)
        @given(
            scheme=st.sampled_from(["http", "https", "HTTP", "Https"]),
            host=st.text(host_chars, min_size=1, max_size=20),
            path=st.text(path_chars, max_size=30),
        )
        def check(scheme, host, path):
            url = f"{scheme}://{host}/{path}"
            if _FAST_URL_RE.match(url):
                assert canonicalize_url(url) == _canonicalize_slow(url)

        check()

    def test_fast_equals_slow_on_messy_urls(self):
        from searchgov_spider_spark.kernels.urlnorm import _canonicalize_slow, canonicalize_url

        # messy shapes must bypass the fast path and remain identical
        for u in [
            "https://Example.GOV:443/a?b=2&a=1#f",
            "https://h.gov/%7Euser",
            "https://user:pw@h.gov/x",
            "https://h.gov./trailing",
            "http://h.gov:8080/p",
            "https://h.gov/sp ace",
            "https://h.gov/a?x=",
        ]:
            assert canonicalize_url(u) == _canonicalize_slow(u)

    def test_fast_path_examples(self):
        from searchgov_spider_spark.kernels.urlnorm import canonicalize_url

        assert canonicalize_url("HTTPS://Host0.Example.GOV/Page/One") == "https://host0.example.gov/Page/One"
        assert canonicalize_url("https://h.gov") == "https://h.gov/"
