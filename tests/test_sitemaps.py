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


class TestSitemapMonitorCadence:
    """Heap-pop scheduling loop (reference sitemap_monitor.py:297-371) with
    an injected clock: check ordering, re-check intervals, delta batching."""

    def _mk(self, url_sets, hours):
        from searchgov_spider_spark.sitemap_schedule import SitemapMonitor, SitemapRecord

        clock = {"t": 1000.0}
        crawls = []

        def fake_clock():
            return clock["t"]

        def fake_sleep(s):
            clock["t"] += s

        calls = {u: 0 for u in url_sets}

        def fetch(u):
            i = min(calls[u], len(url_sets[u]) - 1)
            calls[u] += 1
            return set(url_sets[u][i])

        def crawl(sm, batch, depth):
            crawls.append((fake_clock(), sm, tuple(batch), depth))

        records = [SitemapRecord(u, check_sitemap_hours=hours[u]) for u in url_sets]
        mon = SitemapMonitor(records, fetch, crawl, clock=fake_clock, sleep=fake_sleep)
        return mon, crawls, clock

    def test_check_ordering_and_recheck_intervals(self):
        # fast sitemap re-checks hourly, slow one daily
        url_sets = {
            "https://a.gov/sm.xml": [["https://a.gov/1"], ["https://a.gov/1", "https://a.gov/2"],
                                     ["https://a.gov/1", "https://a.gov/2"]],
            "https://b.gov/sm.xml": [["https://b.gov/1"], ["https://b.gov/1"]],
        }
        mon, crawls, clock = self._mk(url_sets, {"https://a.gov/sm.xml": 1.0, "https://b.gov/sm.xml": 24.0})
        events = mon.run(max_checks=6)
        order = [e.sitemap_url for e in events]
        # both due at t0 (ordered by heap = url tiebreak), then 'a' hourly
        # re-checks all land before 'b's 24h re-check
        assert order == ["https://a.gov/sm.xml", "https://b.gov/sm.xml"] + ["https://a.gov/sm.xml"] * 4
        # re-check interval: each 'a' event fires ~1h after the previous
        a_ts = [e.ts for e in events if e.sitemap_url == "https://a.gov/sm.xml"]
        gaps = [round(b - a) for a, b in zip(a_ts, a_ts[1:])]
        # checks 1 and 2 crawl a delta (one 3s inter-batch sleep each), so
        # the gap after them is 3603; no-change checks reschedule at +3600
        assert gaps == [3603, 3603, 3600, 3600]
        # delta semantics: first check crawls the full set (all new), the
        # second crawls only /2, later no-change checks crawl nothing
        a_crawls = [c for c in crawls if c[1] == "https://a.gov/sm.xml"]
        assert [c[2] for c in a_crawls] == [("https://a.gov/1",), ("https://a.gov/2",)]
        assert all(c[3] == 1 for c in crawls)  # depth_limit=1 per reference

    def test_batching_by_20(self):
        urls = [f"https://c.gov/p{i:03d}" for i in range(45)]
        mon, crawls, _ = self._mk({"https://c.gov/sm.xml": [urls]}, {"https://c.gov/sm.xml": 1.0})
        mon.run(max_checks=1)
        sizes = [len(c[2]) for c in crawls]
        assert sizes == [20, 20, 5]
        # sorted order preserved across batches (itertools.batched(sorted()))
        flat = [u for c in crawls for u in c[2]]
        assert flat == sorted(urls)


class TestSitemapMonitorSparkIntegration:
    """The monitor driving the real Spark path: each check appends a
    snapshot and re-derives the delta via ``flows.sitemap_delta``; each
    delta batch seeds a one-round ``CrawlEngine`` crawl (the reference's
    dedicated depth-1 spider launch, sitemap_monitor.py:343-353)."""

    def test_monitor_drives_delta_flow_and_one_round_crawl(self, spark, tmp_path):
        from searchgov_spider_spark.crawl import CrawlEngine, CrawlPolicy
        from searchgov_spider_spark.sitemap_schedule import SitemapMonitor, SitemapRecord
        from searchgov_spider_spark.synth import webgen
        from searchgov_spider_spark.synth.spark_gen import PAGES_SCHEMA

        n_pages, n_hosts = 120, 2
        pages_df = spark.createDataFrame(
            webgen.pages_pandas(n_pages, n_hosts), schema=PAGES_SCHEMA
        ).persist()
        robots_df = spark.createDataFrame(webgen.robots_pandas(n_hosts))
        host0 = webgen.host_name(0)
        sm_url = f"https://{host0}/sitemap.xml"

        # two successive sitemap versions: v2 adds two pages
        v1 = [webgen.page_url(0, k) for k in (0, 2, 4)]
        v2 = v1 + [webgen.page_url(0, 6), webgen.page_url(0, 8)]
        versions = [URLSET_FROM(v1), URLSET_FROM(v2), URLSET_FROM(v2)]

        clock = {"t": 0.0}
        state = {"calls": 0, "snapshots": [], "crawled": []}

        def fetch(url):
            body = versions[min(state["calls"], len(versions) - 1)]
            state["calls"] += 1
            parsed = sitemapxml.parse_sitemap_xml(body)  # real XML kernel
            urls = set(parsed.page_urls)
            state["snapshots"] += [(url, u, clock["t"]) for u in urls]
            return urls

        def crawl(sm, batch, depth_limit):
            ckpt = str(tmp_path / f"ckpt{len(state['crawled'])}")
            policy = CrawlPolicy(allowed_domains=[host0], depth_limit=depth_limit)
            engine = CrawlEngine(spark, pages_df, robots_df, policy, ckpt,
                                 bloom_shards=2, bloom_bits=1 << 12)
            run = engine.run(list(batch), max_rounds=1)  # one round: seeds only
            docs = sorted(r["url"] for r in run.documents(spark).select("url").collect())
            state["crawled"].append((tuple(batch), tuple(docs)))

        mon = SitemapMonitor(
            [SitemapRecord(sm_url, check_sitemap_hours=1.0)],
            fetch, crawl,
            clock=lambda: clock["t"],
            sleep=lambda s: clock.__setitem__("t", clock["t"] + s),
        )
        events = mon.run(max_checks=2)

        # monitor delta agrees with the distributed sitemap_delta flow over
        # the accumulated snapshot table (latest EXCEPT previous)
        snap_df = spark.createDataFrame(
            state["snapshots"], "sitemap_url string, page_url string, snapshot_ts double"
        )
        flow_delta = {r["page_url"] for r in flows.sitemap_delta(snap_df).collect()}
        assert flow_delta == set(v2) - set(v1)
        assert events[1].n_new == len(flow_delta)

        # each delta batch ran a real one-round crawl: documents == batch
        assert [list(c[0]) for c in state["crawled"]] == [sorted(v1), sorted(set(v2) - set(v1))]
        for batch, docs in state["crawled"]:
            assert docs == tuple(sorted(batch))


def URLSET_FROM(urls):
    rows = "".join(f"<url><loc>{u}</loc></url>" for u in urls)
    return f'<?xml version="1.0"?><urlset {NS}>{rows}</urlset>'
