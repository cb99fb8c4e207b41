"""Sitemap XML kernel + recursive expansion flow tests."""

from searchgov_spider_spark import flows
from searchgov_spider_spark.kernels import sitemapxml

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'

URLSET = f"""<?xml version="1.0" encoding="UTF-8"?>
<urlset {NS}>
  <url><loc>https://h.gov/a</loc><lastmod>2024-01-01</lastmod></url>
  <url><loc>https://h.gov/b</loc></url>
  <url><priority>0.5</priority></url>
</urlset>"""

INDEX = f"""<sitemapindex {NS}>
  <sitemap><loc>https://h.gov/sitemap-a.xml</loc></sitemap>
  <sitemap><loc>https://h.gov/sitemap-b.xml</loc></sitemap>
</sitemapindex>"""


class TestKernel:
    def test_urlset(self):
        p = sitemapxml.parse_sitemap_xml(URLSET)
        assert p.kind == "urlset"
        assert p.page_urls == ["https://h.gov/a", "https://h.gov/b"]
        assert p.child_sitemaps == []

    def test_index(self):
        p = sitemapxml.parse_sitemap_xml(INDEX)
        assert p.kind == "sitemapindex"
        assert p.child_sitemaps == ["https://h.gov/sitemap-a.xml", "https://h.gov/sitemap-b.xml"]

    def test_no_namespace(self):
        p = sitemapxml.parse_sitemap_xml("<urlset><url><loc>https://x.gov/1</loc></url></urlset>")
        assert p.page_urls == ["https://x.gov/1"]

    def test_malformed(self):
        assert sitemapxml.parse_sitemap_xml("<urlset><url>").kind == "invalid"
        assert sitemapxml.parse_sitemap_xml("not xml at all").kind == "invalid"
        assert sitemapxml.parse_sitemap_xml("<html><body>404</body></html>").kind == "invalid"

    def test_recursive_expand_with_cycle(self):
        bodies = {
            "https://h.gov/sitemap.xml": INDEX,
            "https://h.gov/sitemap-a.xml": URLSET,
            # cycle back to the root + one more page
            "https://h.gov/sitemap-b.xml": (
                "<sitemapindex><sitemap><loc>https://h.gov/sitemap.xml</loc></sitemap>"
                "<sitemap><loc>https://h.gov/sitemap-c.xml</loc></sitemap></sitemapindex>"
            ),
            "https://h.gov/sitemap-c.xml": "<urlset><url><loc>https://h.gov/c</loc></url></urlset>",
        }
        out = sitemapxml.expand_sitemaps(bodies, ["https://h.gov/sitemap.xml"])
        assert out["https://h.gov/sitemap.xml"] == {"https://h.gov/a", "https://h.gov/b", "https://h.gov/c"}

    def test_robots_directives(self):
        rules = "User-agent: *\nDisallow: /x\nSitemap: https://h.gov/sm1.xml\nsitemap: https://h.gov/sm2.xml\n"
        assert sitemapxml.sitemaps_from_robots(rules) == ["https://h.gov/sm1.xml", "https://h.gov/sm2.xml"]
        assert sitemapxml.sitemaps_from_robots(None) == []


class TestSparkFlow:
    def test_expand_matches_kernel(self, spark):
        bodies = {
            "https://h.gov/sitemap.xml": INDEX,
            "https://h.gov/sitemap-a.xml": URLSET,
            "https://h.gov/sitemap-b.xml": "<urlset><url><loc>https://h.gov/z</loc></url></urlset>",
        }
        df = spark.createDataFrame(list(bodies.items()), "sitemap_url string, body string")
        got = {
            r["page_url"]
            for r in flows.expand_sitemaps(spark, df, ["https://h.gov/sitemap.xml"]).collect()
        }
        expected = sitemapxml.expand_sitemaps(bodies, ["https://h.gov/sitemap.xml"])["https://h.gov/sitemap.xml"]
        assert got == expected

    def test_missing_child_tolerated(self, spark):
        df = spark.createDataFrame([("https://h.gov/sitemap.xml", INDEX)], "sitemap_url string, body string")
        got = flows.expand_sitemaps(spark, df, ["https://h.gov/sitemap.xml"]).collect()
        assert got == []  # children never fetched -> no pages, no crash


class TestEmbeddingNearDup:
    def test_finds_planted_duplicates(self, spark):
        import numpy as np

        from searchgov_spider_spark.operators import similarity

        rng = np.random.default_rng(11)
        base = rng.standard_normal((40, 16)).astype(np.float32)
        rows = [(i, base[i].tolist()) for i in range(40)]
        # plant near-dups: 100+i = tiny perturbation of i
        for i in range(5):
            rows.append((100 + i, (base[i] + rng.standard_normal(16).astype(np.float32) * 0.01).tolist()))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        pairs = {(r["id_a"], r["id_b"]) for r in
                 similarity.embedding_near_dup_pairs(df, dim=16, threshold=0.95, bits=2).collect()}
        # single-bucket SRP-LSH has ~(1 - theta/pi)^bits recall per pair;
        # with bits=2 and near-identical vectors expect >= 4 of 5 planted
        found = sum((i, 100 + i) in pairs for i in range(5))
        assert found >= 4, pairs
        # unrelated random vectors in 16-d rarely reach cosine 0.95
        false_pairs = [p for p in pairs if not (p[1] - p[0] == 100)]
        assert len(false_pairs) <= 2


class TestSitemapDiscovery:
    """4-method discovery (S8): Spark flow vs pure-Python kernel oracle."""

    def test_flow_matches_kernel(self, spark):
        from searchgov_spider_spark import flows
        from searchgov_spider_spark.kernels.sitemapxml import find_sitemaps
        from searchgov_spider_spark.synth import webgen

        bases, res = webgen.sitemap_discovery_fixture(8)
        bases_df = spark.createDataFrame([(b,) for b in bases], "base_url string")
        res_df = spark.createDataFrame(
            [(u, s, c, b) for u, (s, c, b) in sorted(res.items())],
            "url string, status_code int, content_type string, body string",
        )
        got = {
            (r["base_url"], r["sitemap_url"])
            for r in flows.discover_sitemaps(spark, bases_df, res_df).collect()
        }
        expected = {(b, sm) for b in bases for sm in find_sitemaps(b, res)}
        assert got == expected
        assert len(expected) > 10

    def test_fix_http_replace_all_parity(self, spark):
        """An embedded http:// (e.g. in a query param) is rewritten by the
        reference's str.replace — kernel and Spark flow must agree
        (sitemap_finder.py:82-86)."""
        from searchgov_spider_spark import flows
        from searchgov_spider_spark.kernels.sitemapxml import find_sitemaps

        base = "https://h9.example.gov"
        robots_body = "User-agent: *\nSitemap: http://h9.example.gov/sm.xml?mirror=http://h9.example.gov/alt\n"
        res = {f"{base}/robots.txt": (200, "text/plain", robots_body)}
        expected = find_sitemaps(base, res)
        assert expected == {"https://h9.example.gov/sm.xml?mirror=https://h9.example.gov/alt"}

        bases_df = spark.createDataFrame([(base,)], "base_url string")
        res_df = spark.createDataFrame(
            [(u, s, c, b) for u, (s, c, b) in res.items()],
            "url string, status_code int, content_type string, body string",
        )
        got = {r["sitemap_url"] for r in flows.discover_sitemaps(spark, bases_df, res_df).collect()}
        assert got == expected

    def test_each_method_contributes(self):
        from searchgov_spider_spark.kernels.sitemapxml import find_sitemaps
        from searchgov_spider_spark.synth import webgen

        bases, res = webgen.sitemap_discovery_fixture(8)
        all_found = {sm for b in bases for sm in find_sitemaps(b, res)}
        assert any(s.endswith("/sitemap.xml") for s in all_found)          # method 1
        assert any("sm-robots" in s for s in all_found)                    # method 2 (https-fixed)
        assert all(s.startswith("https://") for s in all_found)
        assert any("linked-sitemap" in s for s in all_found)               # method 3
        assert any("data-sitemap" in s for s in all_found)                 # method 4
        # confirm-rejections: host2's text/html sitemap.xml and plain.xml
        assert "https://host2.example.gov/sitemap.xml" not in all_found
        assert not any(s.endswith("/plain.xml") for s in all_found)
        # relative robots directives are ignored (absolute-only regex)
        assert not any("relative-sitemap" in s for s in all_found)
