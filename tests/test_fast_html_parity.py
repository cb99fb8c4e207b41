"""Round-6 fast-path parity pins.

The r06 optimization round added bail-out fast paths to the extraction-stack
kernels (htmlx._fast_scan, textproc.sanitize_text/clean_line,
urlnorm.url_extension/url_host, webgen._salad).  Each must be byte-identical
to the slow/stdlib path it shortcuts; these tests pin that equivalence over
the full synthetic web plus adversarial fragments, so any future edit that
breaks parity fails here rather than (silently) changing crawl output.
"""

from __future__ import annotations

import posixpath
import random
import re
import string
from urllib.parse import urlsplit

from searchgov_spider_spark.kernels import htmlx, textproc, urlnorm
from searchgov_spider_spark.synth import webgen

ADVERSARIAL_HTML = [
    "",
    "plain text",
    "a < b",
    "x &amp; y",
    "<p>unclosed",
    "<p/>self<br/>",
    "<!DOCTYPE html><html><body>t</body></html>",
    '<!doctype HTML PUBLIC "x"><p>y</p>',
    "<!-- comment --><p>after</p>",
    '<script>if (a<b) { x("</div>"); }</script>ok',
    "<script>var x=1;</script><p>t</p>",
    "<SCRIPT>UP</script>done",
    '<a href="/x;jsessionid=1">l</a>',
    "<a href='/sq'>l</a><a href=unq>m</a>",
    '<a href="/amp?a=1&amp;b=2">l</a>',
    '<meta name="description" content="d &quot;q&quot;">',
    '<area href="/ar"><va-link href="/v"></va-link>',
    "<p class>empty attr</p>",
    '<p  a = "1"  b  >sp</p>',
    "<title>T &gt; U</title>",
    "<style>p{color:red}</style>text",
    "<div><p>nested</div></p>",
    "<p>tail</p> trailing &frac12; end",
    "<p>bad tag </ p> here</p>",
    "<?pi ?><p>x</p>",
    "<![CDATA[zz]]><p>y</p>",
    "<p>truncated <",
    '<p a="<">lt in attr</p>',
    "<em>e</em >odd end",
    "<input type=text value=a/>",
    "<p>&#65;&#x42;</p>",
    "<p>&unknown; &</p>",
    '<html lang="en"><head></head><body>b</body></html>',
    "<script>never closed",
    "<style>x",
    '<a href="">empty</a>',
    '<a href="/a" href="/b">dup attr</a>',
    '<bogus-tag attr="1">z</bogus-tag>',
    '<p\nmulti="line"\n>nl</p>',
    "<p> line sep</p>",
    "<a href='/mixed\"quote'>q</a>",
    # one/two-quoted-attr fast-path shapes (r06) + near-misses that must
    # fall through to the general tokenizer with identical results
    '<a href="/one">x</a>',
    '<a HREF="/up">x</a>',
    '<a href="/sp" >x</a>',
    '<a href = "/eq">x</a>',
    '<a href="/amp&x">amp stays general</a>',
    '<a href="a\'b">squote in value</a>',
    '<a href="x" disabled>mixed</a>',
    '<a href="/a" rel="nofollow">two</a>',
    '<meta name="keywords" content="k1, k2">',
    '<meta property="og:image" content="/img.png">',
    '<meta name="a" content="b" extra="c">',
    '<meta name="tab\tnl\n" content="v">',
    '<script src="/x.js">var a=1;</script>after',
    '<style type="text/css">p{}</style>after',
    '<a href="/x"/>startend</a>',
    '<a href="">e</a><a href="#">f</a>',
    '<p class="c">one-attr non-link</p>',
    '<a id="i" href="/h">href second</a>',
]


def _stdlib_parse(html: str) -> htmlx._PageParser:
    p = htmlx._PageParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return p


def _snap(p: htmlx._PageParser):
    return (p.links, p.title_parts, p.meta, p.og, p.html_lang, p.text_parts)


def _fast_result(html: str):
    p = htmlx._PageParser()
    try:
        ok = htmlx._fast_scan(html, p)
    except Exception:
        return None
    return _snap(p) if ok else None


def test_fast_scan_matches_stdlib_on_synthetic_web():
    sizes = webgen.host_sizes(2000, 20)
    checked = bailed = 0
    for h in range(len(sizes)):
        for k in range(sizes[h]):
            row = webgen.build_page(h, k, sizes[h], 20, 3, with_text=False)
            html = textproc.decode_bytes(bytes(row["html"]))
            fast = _fast_result(html)
            if fast is None:
                bailed += 1
                continue
            assert fast == _snap(_stdlib_parse(html)), (h, k)
            checked += 1
    # the generator's pages are all inside the fast subset — a bail here
    # means the hot path silently fell back to the slow parser
    assert bailed == 0 and checked == sum(sizes)


def test_fast_scan_matches_stdlib_on_adversarial_fragments():
    for html in ADVERSARIAL_HTML:
        fast = _fast_result(html)
        if fast is not None:  # bail == stdlib handles it; that IS parity
            assert fast == _snap(_stdlib_parse(html)), repr(html)


def test_extract_html_doc_identical_via_both_parsers(monkeypatch):
    sizes = webgen.host_sizes(2000, 20)
    row = webgen.build_page(0, 5, sizes[0], 20, 3, with_text=False)
    html = textproc.decode_bytes(bytes(row["html"]))
    url = webgen.page_url(0, 5)
    fast_doc = htmlx.extract_html_doc(html, url, "")
    monkeypatch.setattr(htmlx, "_fast_scan", lambda *_: False)
    slow_doc = htmlx.extract_html_doc(html, url, "")
    assert fast_doc == slow_doc


def _ref_sanitize(text: str) -> str:
    if not text:
        return ""
    ents = {"&#13;": "\r", "&#10;": "\n", "&nbsp;": " "}

    def cl(line: str) -> str:
        for e, r in ents.items():
            line = line.replace(e, r)
        line = "".join(c for c in line if c.isprintable() or c.isspace())
        return " ".join(line.split()).strip()

    lines = [cl(ln) for ln in text.splitlines()]
    joined = " ".join(ln for ln in lines if ln).replace("␤", "")
    return re.sub(r"\s+", " ", joined).strip()


def test_sanitize_fast_path_parity():
    rng = random.Random(7)
    pool = string.ascii_letters + "  \t\n\r\x00\x07&;#nbsp13␤\xe9\xfc" + string.punctuation
    cases = [
        "", " ", "abc", "a  b\tc", "x&nbsp;y", "l1\nl2", "a&#13;b",
        "␤hidden", "ctrl\x07char", "unicode \xe9 \xfc", "mix &amp; &nbsp; \n x",
    ] + ["".join(rng.choice(pool) for _ in range(rng.randint(0, 120))) for _ in range(3000)]
    for c in cases:
        assert textproc.sanitize_text(c) == _ref_sanitize(c), repr(c)


def _ref_url_extension(url: str) -> str:
    base = posixpath.basename(urlsplit(url).path)
    if "." not in base:
        return ""
    return base.rsplit(".", 1)[1].lower()


def test_url_extension_fast_path_parity():
    rng = random.Random(3)
    pool = "abcz:/?#.;@%~-_=&123"
    cases = [
        "https://h.gov/a/b.ZIP", "http://x/y", "https://x", "https://x/",
        "https://x?a=b.c", "https://x/a.b?c#d", "https://x/p;jsessionid=1.gz",
        "HTTPS://X/a.PdF", "ftp://q/a.z", "https://h/q#frag.x", "relative/p.txt",
        "//proto-rel/a.b", "https://h:8080/p.tar.gz", "https://u:p@h/x.y",
        "https://h/trailing.", "https://h/.hidden", "https://h/a.b.c",
    ] + ["https://" + "".join(rng.choice(pool) for _ in range(rng.randint(0, 40))) for _ in range(3000)]
    for u in cases:
        assert urlnorm.url_extension(u) == _ref_url_extension(u), repr(u)


def test_url_host_fast_path_parity():
    rng = random.Random(5)
    pool = "abcHZ:/?#.@%[]09-+_"
    cases = [
        "https://HOST0.EXAMPLE.GOV:443/p", "https://h.gov/x", "http://u@h/p",
        "https://[::1]/p", "", "rel/x", "https://h.gov", "ftp://f/x",
        "https://h.gov:8080", "mailto:x@y", "//h/x", "https://host.", "https://@h/x",
    ] + ["".join(rng.choice(pool) for _ in range(rng.randint(0, 30))) for _ in range(5000)]
    for u in cases:
        try:
            ref = (urlsplit(u).hostname or "").lower()
        except ValueError:
            continue  # stdlib rejects (bad port/brackets); kernel behavior unpinned
        assert urlnorm.url_host(u) == ref, repr(u)


def test_doc_meta_fused_udf_matches_component_kernels():
    import pandas as pd

    from searchgov_spider_spark.functions import udfs
    from searchgov_spider_spark.kernels import dates

    urls = [
        "https://host0.example.gov/", "https://host0.example.gov/p7",
        "https://h.gov/a/b/report.PDF", "https://h.gov/dir/", "https://h.gov/x.",
        "https://h.gov/a.b.c?q=1#f", "https://U:p@h.gov:8080/z.txt",
        "http://plain/x;jsessionid=1", "ftp://odd/a.b", "no-scheme/rel.txt", "",
        "https://h.gov/%20enc.tar.gz", "HTTPS://UP.GOV/CaseD.Ext",
    ]
    craw = ["", "2024-01-02", "not a date", "", "January 5, 2023", "", "", "", "", "", "", "", ""]
    chraw = ["2024-02-03", "", "", "also bad", "", "", "", "", "", "", "", "", ""]
    out = udfs.doc_meta.func(pd.Series(urls), pd.Series(craw), pd.Series(chraw))
    for i, u in enumerate(urls):
        row = out.iloc[i]
        if not u:
            assert tuple(row) == ("", "", "", "", "", None, None)
            continue
        stem, suffix, _ = urlnorm.url_base_extension(u)
        assert row["id"] == urlnorm.doc_id(u)
        assert row["basename"] == stem, u
        assert row["extension"] == suffix, u
        assert row["url_path"] == urlnorm.url_path(u), u
        assert row["domain_name"] == urlnorm.domain_name(u), u
        assert row["created_at"] == (dates.parse_dates_safely(craw[i]) if craw[i] else None)
        assert row["changed"] == (dates.parse_dates_safely(chraw[i]) if chraw[i] else None)


def test_salad_matches_random_choice():
    for h in range(3):
        for k in range(50):
            seed = f"{webgen.SEED}:{h}:{k}"
            for words in (webgen._EN_WORDS, webgen._ES_WORDS):
                r1, r2 = random.Random(seed), random.Random(seed)
                assert webgen._salad(r1, list(words), 24) == " ".join(
                    r2.choice(list(words)) for _ in range(24)
                )

def _ref_summarize(text: str, lang: str = "en") -> tuple[str, str]:
    # The pre-r06 explicit derivation: full-text word_frequencies + a second
    # per-sentence tokenize in the scoring loop (helpers.py:116-138 parity).
    freq = textproc.word_frequencies(text, lang)
    sentences = textproc.split_sentences(text)
    scored = [
        (sum(freq.get(t, 0) for t in textproc.tokenize(s)), i, s)
        for i, s in enumerate(sentences)
    ]
    top = sorted(scored, key=lambda x: -x[0])[:3]
    summary = " ".join(s for _, _, s in top)
    keywords = ",".join(
        w for w, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    )
    return summary, keywords


def test_summarize_single_tokenize_fast_path_parity():
    rng = random.Random(42)
    words = [
        "the", "of", "and", "cat", "dog", "run", "host", "page", "el", "la",
        "de", "que", "\xfcber", "caf\xe9", "Σ", "ΑΣ", "don't",
        "x9", "42", "word's",
    ]
    seps = [". ", "! ", "? ", " ", "\t", "\n", ".  ", "?\n", "...", ".Q", "!x "]
    cases = [
        "", " ", ".", "a.b", "A. B. C. D. E.", "word" * 200, ". . . !",
        "Σ test ΑΣ.", "\x00ctl. chars\x01!",
    ]
    for _ in range(4000):
        parts = []
        for _ in range(rng.randrange(0, 40)):
            w = rng.choice(words)
            if rng.random() < 0.3:
                w = w.upper()
            elif rng.random() < 0.3:
                w = w.capitalize()
            parts.append(w)
            parts.append(rng.choice(seps))
        cases.append("".join(parts))
    for text in cases:
        lang = rng.choice(["en", "es", "fr", "zz"])
        assert textproc.summarize_text(text, lang) == _ref_summarize(text, lang), repr(text[:120])
