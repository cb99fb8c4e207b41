"""Round-5 additions: eTLD+1 grouping, canonical clustering, deterministic
epoch shuffle, content-defined chunking — properties the oracle sweep can't
see (partition invariance, shift robustness, edge-case classification)."""

import pytest
from pyspark.sql import functions as F

from searchgov_spider_spark.operators import snapshots, training, urlmine


# ---------------------------------------------------------------------------
# registrable_domains (eTLD+1)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "host,expected",
    [
        ("www.example.gov.uk", "example.gov.uk"),   # two-level suffix + sub
        ("example.gov.uk", "example.gov.uk"),        # two-level suffix bare
        ("gov.uk", "gov.uk"),                        # the suffix itself
        ("a.b.c.example.co.uk", "example.co.uk"),    # deep nesting
        ("www.example.gov", "example.gov"),          # plain gTLD
        ("example.com", "example.com"),              # bare eTLD+1
        ("localhost", "localhost"),                  # single label
        ("deep.sub.example.com", "example.com"),
    ],
)
def test_registrable_domain_rule(spark, host, expected):
    got = (
        spark.createDataFrame([(host,)], "host string")
        .selectExpr(f"{urlmine.registrable_domain_expr('host')} AS d")
        .head()[0]
    )
    assert got == expected, host


def test_registrable_domains_rollup(spark):
    urls = [
        ("https://www.x.gov.uk/a",),
        ("https://x.gov.uk/b",),
        ("https://deep.sub.x.gov.uk/c",),
        ("https://y.example.com/d",),
        ("https://z.example.com:8443/e",),   # port stripped from host
    ]
    out = {
        r["domain"]: r
        for r in urlmine.registrable_domains(
            spark.createDataFrame(urls, "url string")
        ).collect()
    }
    assert out["x.gov.uk"]["n_urls"] == 3
    assert out["x.gov.uk"]["n_hosts"] == 3
    assert out["x.gov.uk"]["max_sub_depth"] == 2
    assert out["example.com"]["n_urls"] == 2
    assert out["example.com"]["n_hosts"] == 2
    assert out["example.com"]["max_sub_depth"] == 1


# ---------------------------------------------------------------------------
# canonical_clusters
# ---------------------------------------------------------------------------

def test_canonical_clusters_attribute_orders_and_relative(spark):
    pages = [
        # absolute, rel-first
        ("https://a.gov/p/1?x=1",
         '<link rel="canonical" href="https://a.gov/p/1">'),
        # relative, href-first
        ("https://a.gov/p/1?x=2",
         '<link href="/p/1" rel="canonical">'),
        # the canonical page itself, no tag -> self-canonical
        ("https://a.gov/p/1", "<html><body>hi</body></html>"),
        # unrelated self-canonical singleton
        ("https://b.gov/q", "<p>no link</p>"),
    ]
    out = {
        r["canonical_url"]: r
        for r in urlmine.canonical_clusters(
            spark.createDataFrame(pages, "url string, html string")
        ).collect()
    }
    assert len(out) == 2
    c = out["https://a.gov/p/1"]
    assert c["n_pages"] == 3
    assert c["rep_url"] == "https://a.gov/p/1"
    assert c["has_canonical_page"] is True
    s = out["https://b.gov/q"]
    assert s["n_pages"] == 1 and s["has_canonical_page"] is True


def test_canonical_clusters_uncrawled_target(spark):
    pages = [("https://a.gov/old", '<link rel="canonical" href="https://a.gov/new">')]
    row = urlmine.canonical_clusters(
        spark.createDataFrame(pages, "url string, html string")
    ).head()
    assert row["canonical_url"] == "https://a.gov/new"
    assert row["has_canonical_page"] is False


# ---------------------------------------------------------------------------
# epoch_shards
# ---------------------------------------------------------------------------

def test_epoch_shards_partition_invariance(spark):
    docs = spark.range(500).withColumnRenamed("id", "doc_id")
    a = training.epoch_shards(docs.repartition(1), n_shards=8, seed="e0")
    b = training.epoch_shards(docs.repartition(13), n_shards=8, seed="e0")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_epoch_shards_contract(spark):
    docs = spark.range(400).withColumnRenamed("id", "doc_id")
    rows = training.epoch_shards(docs, n_shards=8, seed="e1").collect()
    assert len(rows) == 400
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], []).append(r["pos"])
    # every shard's positions are exactly 1..len (a permutation), shards 0..7
    assert set(by_shard) <= set(range(8))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # a different seed is a different permutation
    rows2 = training.epoch_shards(docs, n_shards=8, seed="e2").collect()
    assert {(r["doc_id"], r["shard_id"], r["pos"]) for r in rows} != {
        (r["doc_id"], r["shard_id"], r["pos"]) for r in rows2
    }


# ---------------------------------------------------------------------------
# cdc_chunks / cdc_delta
# ---------------------------------------------------------------------------

TEXT = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and the mouse runs through the tall grass field"
)


def test_cdc_chunks_cover_and_partition_invariance(spark):
    docs = spark.createDataFrame([(1, TEXT), (2, "one two"), (3, "")],
                                 "doc_id long, text string")
    rows = snapshots.cdc_chunks(docs).collect()
    # doc 3 has no tokens -> absent; chunk token counts cover each doc exactly
    per_doc = {}
    for r in rows:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n_tokens"]
    assert per_doc == {1: len(TEXT.split()), 2: 2}
    rows2 = snapshots.cdc_chunks(docs.repartition(7)).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_cdc_shift_robustness_beats_fixed_stride(spark):
    """Prepending one token must leave the tail chunks' hashes intact —
    the property fixed-stride chunking cannot have."""
    v1 = spark.createDataFrame([(1, TEXT)], "doc_id long, text string")
    v2 = spark.createDataFrame([(1, "prefix " + TEXT)], "doc_id long, text string")
    c1 = snapshots.cdc_chunks(v1)
    c2 = snapshots.cdc_chunks(v2)
    d = snapshots.cdc_delta(c1, c2).head()
    assert d["n_shared"] > 0, "CDC must preserve post-boundary chunks"
    assert d["reuse_ratio"] > 0.5
    # identical content -> full reuse
    ident = snapshots.cdc_delta(c1, snapshots.cdc_chunks(v1)).head()
    assert ident["reuse_ratio"] == 1.0 and ident["n_shared"] == ident["n_chunks_new"]


def test_cdc_delta_zero_shuffle_chunking_plan(spark):
    """cdc_chunks itself must be a pure map: no Exchange in its plan."""
    docs = spark.createDataFrame([(1, TEXT)], "doc_id long, text string")
    plan = snapshots.cdc_chunks(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
