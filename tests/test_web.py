"""Unit pins for the web-corpus URL tier (extensions/web.py): every
canonicalization rule on a hand-built fixture, plus dedup/rollup
semantics. The sf-scale oracle parity lives in test_oracle_parity
(url_canonical_dedup / domain_url_stats)."""

from __future__ import annotations

from pyspark.sql import functions as F

from market_flow_spark.extensions import web


def _canon(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rows = df.select(web.canonical_url(F.col("url")).alias("c")).collect()
    return [r["c"] for r in rows]


def test_canonicalization_rules(spark):
    cases = {
        # case + www + default port + '//' run + tracking + sort + fragment
        "HTTP://WWW.Example.COM:80/a//b/?utm_source=x&z=1&a=2#frag":
            "http://example.com/a/b?a=2&z=1",
        # empty path -> '/'
        "https://example.com": "https://example.com/",
        # query that is ALL tracking params disappears entirely
        "https://example.com/?ref=abc&utm_medium=mail":
            "https://example.com/",
        # non-default port is preserved; trailing slash stripped
        "https://sub.shop.co:8080/x/": "https://sub.shop.co:8080/x",
        # path case preserved, host case folded
        "https://EXAMPLE.com/CaseSensitive/Path":
            "https://example.com/CaseSensitive/Path",
        # :443 stripped only as a suffix port, not inside the path
        "https://example.com:443/a:443": "https://example.com/a:443",
        # non-absolute input: lowercased/trimmed passthrough
        "  Not A Url  ": "not a url",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values())


def test_idempotent(spark):
    """Canonicalizing a canonical URL is a no-op (fixed point)."""
    urls = [
        "HTTP://WWW.Example.COM:80/a//b/?utm_source=x&z=1&a=2#frag",
        "https://example.com",
        "https://sub.shop.co:8080/x/",
    ]
    once = _canon(spark, urls)
    twice = _canon(spark, once)
    assert once == twice


def test_url_host_and_domain(spark):
    df = spark.createDataFrame(
        [("https://WWW.a.b.Shop.COM:443/x?y=1#z",)], ["url"]
    )
    row = df.select(
        web.url_host(F.col("url")).alias("h"),
        web.url_domain(F.col("url")).alias("d"),
        web.url_scheme(F.col("url")).alias("s"),
    ).collect()[0]
    assert row["h"] == "a.b.shop.com"
    assert row["d"] == "shop.com"
    assert row["s"] == "https"


def test_url_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [
            (1, "https://example.com/a?utm_source=x"),
            (2, "HTTPS://WWW.EXAMPLE.COM/a"),
            (3, "https://example.com/a/"),
            (4, "https://example.com/b"),
        ],
        ["doc_id", "url"],
    )
    out = {
        r["canonical_url"]: (r["keep_doc_id"], r["n_dups"])
        for r in web.url_dedup(df).collect()
    }
    assert out == {
        "https://example.com/a": (1, 3),
        "https://example.com/b": (4, 1),
    }


def test_domain_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.shop.com/x"),
            (2, "https://b.shop.com/x"),
            (3, "https://a.shop.com/x/"),  # same canonical as 1
            (4, "https://other.net/y"),
        ],
        ["doc_id", "url"],
    )
    out = {r["domain"]: r.asDict() for r in web.domain_stats(df).collect()}
    shop = out["shop.com"]
    assert (shop["n_pages"], shop["n_hosts"], shop["n_canonical"]) == (3, 2, 2)
    assert abs(shop["dup_ratio"] - 1.5) < 1e-9
    assert out["other.net"]["n_pages"] == 1


def test_url_dedup_against_index(spark):
    corpus = spark.createDataFrame(
        [(1, "https://example.com/a"), (2, "https://example.com/b")],
        ["doc_id", "url"],
    )
    idx = web.url_index(corpus)
    batch = spark.createDataFrame(
        [
            (10, "HTTPS://WWW.example.com/a/"),   # already indexed -> drop
            (11, "https://example.com/c?utm_source=x"),  # fresh
            (12, "https://example.com/c"),        # batch-internal dup of 11
        ],
        ["doc_id", "url"],
    )
    out = {
        r["canonical_url"]: (r["keep_doc_id"], r["n_dups"])
        for r in web.url_dedup_against(batch, idx).collect()
    }
    assert out == {"https://example.com/c": (11, 2)}


def test_incremental_matches_batch_union(spark):
    """Index + incremental keeper set == full-rebuild keeper canonical set
    (the equivalence that makes nightly incremental runs honest)."""
    corpus = spark.createDataFrame(
        [(i, f"https://example.com/p{i % 3}") for i in range(6)],
        ["doc_id", "url"],
    )
    batch = spark.createDataFrame(
        [(100 + i, f"https://example.com/p{i % 5}") for i in range(5)],
        ["doc_id", "url"],
    )
    incr = {
        r["canonical_url"]
        for r in web.url_dedup_against(batch, web.url_index(corpus)).collect()
    }
    full = {
        r["canonical_url"]
        for r in web.url_dedup(corpus.union(batch)).collect()
    }
    corpus_canon = {
        r["canonical_url"] for r in web.url_index(corpus).collect()
    }
    assert incr == full - corpus_canon


def test_canonical_idempotent_grid(spark):
    """Idempotence over a 288-combination grid of scheme x host x path x
    query x fragment shapes — canonical_url is a fixed point on its own
    output (single Spark job, per the property-test convention)."""
    schemes = ["http://", "HTTPS://", ""]
    hosts = ["WWW.Example.COM", "example.com:443", "a.B.shop.com:8080"]
    paths = ["", "/", "/a//b/", "/CaseS/p"]
    queries = ["", "?utm_source=x", "?z=1&a=2&ref=r", "?b=2&a=1"]
    frags = ["", "#f"]
    urls = [
        s + h + p + q + f
        for s in schemes
        for h in hosts
        for p in paths
        for q in queries
        for f in frags
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    out = df.select(
        web.canonical_url(F.col("url")).alias("c1")
    ).select(
        "c1", web.canonical_url(F.col("c1")).alias("c2")
    )
    bad = out.filter(F.col("c1") != F.col("c2")).collect()
    assert not bad, bad[:5]


def test_url_index_parquet_round_trip(spark, tmp_path):
    """The persisted-index flow: write url_index to parquet, reload, and
    get the identical incremental keeper set (the nightly-crawl contract,
    mirroring the persisted MinHash-LSH index test)."""
    corpus = spark.createDataFrame(
        [(i, f"https://example.com/p{i % 4}") for i in range(8)],
        ["doc_id", "url"],
    )
    batch = spark.createDataFrame(
        [(100 + i, f"https://example.com/p{i % 6}") for i in range(6)],
        ["doc_id", "url"],
    )
    path = str(tmp_path / "url_index")
    web.url_index(corpus).write.parquet(path)
    reloaded = spark.read.parquet(path)
    live = {
        tuple(r)
        for r in web.url_dedup_against(batch, web.url_index(corpus)).collect()
    }
    persisted = {
        tuple(r) for r in web.url_dedup_against(batch, reloaded).collect()
    }
    assert live == persisted and persisted
