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
