"""URL canonicalization + registrable-domain extraction — the URL stage
every web-corpus pipeline runs before dedup (CCNet/RefinedWeb/Dolma
filter and dedupe BY URL before touching text; Common Crawl URLs arrive
messy: mixed-case schemes/hosts, default ports, tracking params,
fragments, rotating query order).

Canonicalization rules (RFC 3986 normalization + the usual crawl
conventions), applied by column rules to the RAW string — the oracle
replays the *synthesis formulas* instead, so a rule bug on either side
breaks the hash:
  - scheme and host lowercased,
  - default port stripped (80 for http, 443 for https; others kept),
  - empty path -> "/" (path case preserved),
  - query params: tracking params (utm_*) dropped, the rest sorted
    lexicographically, "?" dropped when nothing survives,
  - fragment dropped.
Registrable domain: host minus a leading "www.", cut to the last two
labels — or three when the host ends in a multi-label public suffix
(a small vendored suffix set; the full PSL is a data file, same shape).

Scale: pure scan-side projections, zero shuffle, zero Python; the
per-domain rollup shuffles once on the domain key (hash agg with
map-side partials — skew rides AQE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: multi-label public suffixes the registrable-domain cut knows; the
#: real Public Suffix List is ~9k entries of exactly this shape.
MULTI_SUFFIXES = ("co.uk", "ac.uk", "com.cn", "com.br", "co.jp")

#: query-param prefixes treated as tracking noise
TRACKING_PREFIXES = ("utm_",)


def synth_urls(docs: DataFrame) -> DataFrame:
    """One deterministically-messy URL per document (replayable by a SQL
    oracle):

      scheme  = ('HTTP','https','HTTPS')[doc_id % 3]
      host    = ['WWW.' if doc_id % 2 = 0] || 'Sub' || doc_id % 7 ||
                '.Site' || doc_id % 50 || '.' ||
                ('com','co.uk','org')[(doc_id % 5) % 3]
      port    = ':80' if doc_id % 5 = 0 else ':8080' if doc_id % 7 = 0
      path    = '' if doc_id % 4 = 0 else '/A/b' || doc_id % 10
      query   = 'id=' || doc_id % 100 and 'a=1', plus 'utm_source=feed'
                when doc_id % 3 != 1, order rotating with doc_id parity
      fragment '#sec' when doc_id % 4 = 0
    """
    did = F.col("doc_id")
    scheme = F.element_at(
        F.array(F.lit("HTTP"), F.lit("https"), F.lit("HTTPS")),
        (did % 3 + 1).cast("int"),
    )
    tld = F.element_at(
        F.array(F.lit("com"), F.lit("co.uk"), F.lit("org")),
        ((did % 5) % 3 + 1).cast("int"),
    )
    host = F.concat(
        F.when(did % 2 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("Sub"), (did % 7).cast("string"),
        F.lit(".Site"), (did % 50).cast("string"),
        F.lit("."), tld,
    )
    port = (
        F.when(did % 5 == 0, F.lit(":80"))
        .when(did % 7 == 0, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = F.when(did % 4 == 0, F.lit("")).otherwise(
        F.concat(F.lit("/A/b"), (did % 10).cast("string"))
    )
    p_id = F.concat(F.lit("id="), (did % 100).cast("string"))
    p_a = F.lit("a=1")
    p_utm = F.lit("utm_source=feed")
    has_utm = did % 3 != 1
    query = F.when(
        has_utm,
        F.when(did % 2 == 0, F.concat(p_utm, F.lit("&"), p_id, F.lit("&"), p_a))
        .otherwise(F.concat(p_id, F.lit("&"), p_a, F.lit("&"), p_utm)),
    ).otherwise(
        F.when(did % 2 == 0, F.concat(p_id, F.lit("&"), p_a))
        .otherwise(F.concat(p_a, F.lit("&"), p_id))
    )
    frag = F.when(did % 4 == 0, F.lit("#sec")).otherwise(F.lit(""))
    return docs.withColumn(
        "url",
        F.concat(scheme, F.lit("://"), host, port, path, F.lit("?"), query, frag),
    )


def registrable_domain(host: Column) -> Column:
    """Registrable domain of a lowercase host: strip a leading 'www.',
    keep the last two labels, or three when the tail matches a known
    multi-label public suffix."""
    h = F.regexp_replace(host, r"^www\.", "")
    out = F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)
    for suf in MULTI_SUFFIXES:
        pat = r"([^.]+\." + suf.replace(".", r"\.") + r")$"
        out = F.when(h.endswith("." + suf), F.regexp_extract(h, pat, 1)).otherwise(out)
    return F.when(out == "", h).otherwise(out)


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Apply the canonicalization rules to a raw URL column; adds
    scheme, host, registrable_domain, url_canonical, has_tracking."""
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    auth = F.regexp_extract(u, r"^[^:]+://([^/?#]*)", 1)
    host = F.lower(F.regexp_extract(auth, r"^([^:]+)", 1))
    port = F.regexp_extract(auth, r":([0-9]+)$", 1)
    path = F.regexp_extract(u, r"^[^:]+://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)

    def _is_tracking(x: Column) -> Column:
        cond = x.startswith(TRACKING_PREFIXES[0])
        for pfx in TRACKING_PREFIXES[1:]:
            cond = cond | x.startswith(pfx)
        return cond

    keep = F.filter(F.split(query, "&"), lambda x: (x != "") & ~_is_tracking(x))
    qc = F.concat_ws("&", F.array_sort(keep))
    port_keep = (
        F.when(port == "", F.lit(""))
        .when((scheme == "http") & (port == "80"), F.lit(""))
        .when((scheme == "https") & (port == "443"), F.lit(""))
        .otherwise(F.concat(F.lit(":"), port))
    )
    path_norm = F.when(path == "", F.lit("/")).otherwise(path)
    url_canonical = F.concat(
        scheme, F.lit("://"), host, port_keep, path_norm,
        F.when(qc != "", F.concat(F.lit("?"), qc)).otherwise(F.lit("")),
    )
    has_tracking = F.exists(F.split(query, "&"), _is_tracking)
    return df.select(
        "*",
        scheme.alias("scheme"),
        host.alias("host"),
        registrable_domain(host).alias("registrable_domain"),
        url_canonical.alias("url_canonical"),
        has_tracking.cast("int").cast("long").alias("has_tracking"),
    )
