"""URL canonicalization rule tests — edge cases beyond the synthesized
corpus (the registered query's hash covers the synth surface)."""

from flink_real_time_data_warehouse_spark.datapipe.urls import canonicalize_urls


def _canon(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    return {r["doc_id"]: r.asDict() for r in canonicalize_urls(df).collect()}


def test_url_canonicalization_rules(spark):
    rows = _canon(spark, [
        "HTTPS://Example.COM:443/Path?b=2&a=1#frag",      # default https port
        "https://example.com:80/x",                        # :80 on https KEPT
        "http://example.com:8080/x?utm_source=a&utm_medium=b",  # all tracking
        "http://EXAMPLE.com",                              # empty path
        "http://localhost/x?z=1",                          # no-dot host
        "http://www.a.b.co.uk:80/",                        # multi-label suffix
        "http://sub.deep.site.org/KeepCase/Path",          # path case kept
    ])
    assert rows[0]["url_canonical"] == "https://example.com/Path?a=1&b=2"
    assert rows[0]["registrable_domain"] == "example.com"
    assert rows[0]["has_tracking"] == 0

    assert rows[1]["url_canonical"] == "https://example.com:80/x"

    # every param was tracking: the '?' disappears; has_tracking flags it
    assert rows[2]["url_canonical"] == "http://example.com:8080/x"
    assert rows[2]["has_tracking"] == 1

    assert rows[3]["url_canonical"] == "http://example.com/"

    # a host with no dot is its own registrable domain
    assert rows[4]["registrable_domain"] == "localhost"

    assert rows[5]["host"] == "www.a.b.co.uk"
    assert rows[5]["registrable_domain"] == "b.co.uk"
    assert rows[5]["url_canonical"] == "http://www.a.b.co.uk/"

    assert rows[6]["registrable_domain"] == "site.org"
    assert rows[6]["url_canonical"].endswith("/KeepCase/Path")


def test_c4_rules_hand_built(spark):
    """C4 rule semantics the synthesized corpus can't exercise:
    javascript lines and '{' pages. The punctuation draws only ADD
    characters around tokens, so a '{' or 'javascript' token survives
    synthesis whatever the doc_id — these assertions are draw-proof."""
    from flink_real_time_data_warehouse_spark.datapipe.quality import c4_clean

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base + " { " + base),            # code page: always dropped
            (3, base + " javascript " + base),    # js lines dropped, page may live
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in c4_clean(df, "doc_id", "text").collect()}
    for row in out.values():
        assert row["n_lines"] == row["n_kept"] + row["n_dropped"]
        if row["n_kept"] < 3:
            assert row["keep_page"] == 0
    assert out[2]["keep_page"] == 0
    assert "javascript" not in out[3]["clean_text"]


def test_url_dedup_first_wins(spark):
    """Copies of a page under scheme/www/port/param variations collapse
    to one keeper (smallest id); distinct paths stay distinct."""
    from flink_real_time_data_warehouse_spark.datapipe.urls import url_dedup

    df = spark.createDataFrame(
        [
            (10, "http://example.com/a"),
            (11, "HTTPS://WWW.Example.COM:443/a?utm_source=x"),
            (12, "http://sub.example.com:80/a#frag"),
            (20, "http://example.com/b"),
        ],
        "doc_id long, url string",
    )
    rows = {r["doc_id"]: r.asDict() for r in url_dedup(df, "doc_id").collect()}
    assert rows[10]["is_dup"] == 0 and rows[10]["keeper_id"] == 10
    assert rows[11]["is_dup"] == 1 and rows[11]["keeper_id"] == 10
    assert rows[12]["is_dup"] == 1 and rows[12]["n_copies"] == 3
    assert rows[20]["is_dup"] == 0 and rows[20]["n_copies"] == 1


def test_domain_pagerank_mass_and_ordering(spark):
    """PageRank invariants on the fixture graph: total rank mass stays
    at/below 1e6 ppm (truncating divs and dropped dangling mass only
    LOSE mass, never create it) and above the no-link floor (every node
    holds at least the base); a node's rank grows with its weighted
    in-degree (top-in-degree node ranks above the minimum)."""
    from pyspark.sql import functions as F

    from flink_real_time_data_warehouse_spark.datapipe.urls import (
        domain_pagerank,
        synth_domain_links,
    )
    from flink_real_time_data_warehouse_spark.tables import table

    from .conftest import TEST_SF_DIR

    docs = table(spark, TEST_SF_DIR, "documents").select("doc_id")
    pr = domain_pagerank(docs)
    rows = {r["domain_sid"]: r for r in pr.collect()}
    n = len(rows)
    total = sum(r["rank_ppm"] for r in rows.values())
    base = (1000 - 850) * 1_000_000 // (1000 * n)
    assert total <= 1_000_000
    assert all(r["rank_ppm"] >= base for r in rows.values())
    # mass lost to truncation/dangling is bounded: each node's floor is
    # the base, so the total can't fall below N * base
    assert total >= n * base

    indeg = {
        r["dst"]: r["tot"]
        for r in synth_domain_links(docs)
        .groupBy("dst").agg(F.sum("w").alias("tot")).collect()
    }
    top = max(indeg, key=lambda d: indeg[d])
    lo = min(rows.values(), key=lambda r: r["rank_ppm"])["rank_ppm"]
    assert rows[top]["rank_ppm"] > lo
