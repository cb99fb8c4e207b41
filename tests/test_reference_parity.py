"""Byte-parity tests against the REFERENCE's own pure-Python functions.

Imports the reference modules read-only from /root/reference (studying
behavior, not copying code) and asserts our kernels produce byte-identical
output on shared input domains.  Heavy third-party imports the reference
pulls (langdetect/nltk/scrapy spider) are stubbed in sys.modules — only the
pure-stdlib functions under test execute.

Skipped wholesale if the reference tree is absent (e.g. running this repo
standalone)."""

import importlib.util
import os
import string
import sys
import types

import pytest

REF = "/root/reference/search_gov_crawler"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not available")


def _load(path, name, stubs=()):
    for mod_name, attrs in stubs:
        if mod_name not in sys.modules:
            mod = types.ModuleType(mod_name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[mod_name] = mod
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_content():
    return _load(f"{REF}/search_gov_spiders/helpers/content.py", "ref_content")


@pytest.fixture(scope="module")
def ref_helpers():
    stubs = [
        ("langdetect", {"detect": lambda t: "en"}),
        ("nltk", {}),
        ("nltk.corpus", {"stopwords": types.SimpleNamespace(words=lambda lang: [])}),
        ("nltk.tokenize", {"sent_tokenize": lambda t: [t], "word_tokenize": lambda t: t.split()}),
        ("search_gov_crawler", {}),
        ("search_gov_crawler.search_gov_spiders", {}),
        ("search_gov_crawler.search_gov_spiders.spiders", {"SearchGovDomainSpider": object}),
    ]
    return _load(f"{REF}/indexing/helpers.py", "ref_helpers", stubs)


SANITIZE_CORPUS = [
    "a&nbsp;b",
    "a&#13;&#10;b",
    "  a \t b \n\n c ",
    "x\x00y\x07z",
    "x\x0by\x0cz",
    "line1\nline2.\nline3>\nline4",
    "trailing   spaces   \n\n\n",
    "tabs\tand\tmore\ttabs",
    "unicode ␤ newline symbol",
    "nbsp run a&nbsp;&nbsp;&nbsp;b",
    "mixed &#10; entities &nbsp; here",
    "punct.\nnext{\nbrace\np\nafter",
    "already clean single line",
    "\x1b[31mansi\x1b[0m colored",
    "héllo wörld ünïcode",
    "a" * 500 + "\n" + "b" * 500,
]


class TestSanitizeParity:
    @pytest.mark.parametrize("text", SANITIZE_CORPUS)
    def test_sanitize_text(self, ref_content, text):
        from searchgov_spider_spark.kernels.textproc import sanitize_text

        expected = ref_content.sanitize_text(text)
        got = sanitize_text(text)
        assert got == (expected if expected is not None else "")

    def test_empty_maps_none_to_empty(self, ref_content):
        from searchgov_spider_spark.kernels.textproc import sanitize_text

        assert ref_content.sanitize_text("") is None
        assert sanitize_text("") == ""

    def test_clean_line(self, ref_content):
        from searchgov_spider_spark.kernels.textproc import clean_line

        for line in ["a&nbsp;b", " x\x00y ", "\ttabs  here\t", "", "plain"]:
            assert clean_line(line) == ref_content.clean_line(line)

    def test_random_printable_fuzz(self, ref_content):
        import random

        from searchgov_spider_spark.kernels.textproc import sanitize_text

        rng = random.Random(42)
        alphabet = string.printable + "\x00\x07 ␤éü"
        for _ in range(300):
            s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
            expected = ref_content.sanitize_text(s)
            assert sanitize_text(s) == (expected if expected is not None else "")


URL_CORPUS = [
    "https://www.example.gov/files/Report.PDF?x=1",
    "http://agency.gov/a/b/c.tar.gz",
    "example.gov/no-scheme",
    "https://Example.GOV:8080/Mixed/Case.HTML",
    "https://h.gov/trailing./dot.",
    "https://h.gov/",
    "https://h.gov/noext",
    "ftp://odd.gov/x.pdf",
    "https://h.gov/a%20b/My%20File.pdf",
]


class TestUrlHelpersParity:
    @pytest.mark.parametrize("url", URL_CORPUS)
    def test_ensure_http_prefix(self, ref_helpers, url):
        from searchgov_spider_spark.kernels.urlnorm import ensure_http_prefix

        assert ensure_http_prefix(url) == ref_helpers.ensure_http_prefix(url)

    @pytest.mark.parametrize("url", URL_CORPUS)
    def test_url_path(self, ref_helpers, url):
        from searchgov_spider_spark.kernels.urlnorm import url_path

        assert url_path(url) == ref_helpers.get_url_path(url)

    @pytest.mark.parametrize("url", URL_CORPUS)
    def test_base_extension(self, ref_helpers, url):
        from searchgov_spider_spark.kernels.urlnorm import url_base_extension

        assert url_base_extension(url) == tuple(ref_helpers.get_base_extension(url))

    @pytest.mark.parametrize("url", URL_CORPUS)
    def test_domain_name(self, ref_helpers, url):
        from searchgov_spider_spark.kernels.urlnorm import domain_name

        assert domain_name(url) == ref_helpers.get_domain_name(url)

    @pytest.mark.parametrize("url", URL_CORPUS)
    def test_doc_id(self, ref_helpers, url):
        from searchgov_spider_spark.kernels.urlnorm import doc_id

        assert doc_id(url) == ref_helpers.generate_url_sha256(url)


FILENAME_CORPUS = [
    "MyReportFile2023.pdf",
    "snake_case_name.docx",
    "kebab-case-v2.txt",
    "Mixed_Case-AndCamelCase99.html",
    "with%20quoted+plus.pdf",
    "dots.in.name.tar.gz",
    "ALLCAPS.PDF",
    "x",
]


class TestFilenameParity:
    @pytest.mark.parametrize("fn", FILENAME_CORPUS)
    def test_separate_filename(self, ref_helpers, fn):
        from searchgov_spider_spark.kernels.urlnorm import separate_filename

        assert separate_filename(fn) == ref_helpers.separate_filename(fn)

    @pytest.mark.parametrize("fn", FILENAME_CORPUS)
    def test_title_from_filename(self, ref_helpers, fn):
        from searchgov_spider_spark.kernels.urlnorm import get_title_from_filename

        assert get_title_from_filename(fn) == ref_helpers.get_title_from_filename(fn)


class TestDapParity:
    def test_domain_validity(self):
        # dap/transform.py has no heavy imports — load directly
        ref_dap = _load(f"{REF}/dap/transform.py", "ref_dap")
        from searchgov_spider_spark.kernels.urlnorm import dap_domain_is_valid

        cases = ["example.gov", "(not set)", "", "12.34", ".gov", "localhost",
                 "sub.domain.gov", "123.456.789", "a.b", "-x.gov"]
        for d in cases:
            assert dap_domain_is_valid(d) == ref_dap.domain_is_valid(d), d
