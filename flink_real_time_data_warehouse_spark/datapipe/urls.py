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


def with_registrable_domain(
    df: DataFrame, host_col: str, out_col: str
) -> DataFrame:
    """Stage the registrable-domain cut of a lowercase host column:
    strip a leading 'www.', keep the last two labels, or three when the
    tail matches a known multi-label public suffix.

    Built as three staged withColumns (stripped host, suffix-cut chain,
    empty-fallback) because the chain references the stripped host ~2×
    per suffix and the fallback references the chain twice — as ONE
    inline expression the www-strip regex re-expands ~20×, which (fused
    across a self-join in url_dedup) overran janino's constant pool and
    killed whole-stage codegen. Staged, every regex compiles once."""
    df = df.withColumn("_rdh", F.regexp_replace(F.col(host_col), r"^www\.", ""))
    h = F.col("_rdh")
    out = F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)
    for suf in MULTI_SUFFIXES:
        pat = r"([^.]+\." + suf.replace(".", r"\.") + r")$"
        out = F.when(h.endswith("." + suf), F.regexp_extract(h, pat, 1)).otherwise(out)
    df = df.withColumn("_rdg", out)
    return df.withColumn(
        out_col, F.when(F.col("_rdg") == "", h).otherwise(F.col("_rdg"))
    )


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Apply the canonicalization rules to a raw URL column; adds
    scheme, host, registrable_domain, path, url_canonical, has_tracking.

    STRUCTURE NOTE: every component (authority, host, port, path, query
    and the suffix-cut chain) is a staged withColumn, not an inline
    expression — host alone is referenced ~12 times by the suffix cut
    and assembly, and when a caller fuses this plan onto BOTH sides of
    a self-join (url_dedup), inline trees re-expand multiplicatively
    until janino's constant pool / 64 KB method limits kill whole-stage
    codegen. Staged aliases compile each regex exactly once (the
    CollapseProject multiply-referenced rule)."""
    u = F.col(url_col)
    df = df.withColumn(
        "_scheme", F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    )
    df = df.withColumn("_auth", F.regexp_extract(u, r"^[^:]+://([^/?#]*)", 1))
    df = df.withColumn(
        "_host", F.lower(F.regexp_extract(F.col("_auth"), r"^([^:]+)", 1))
    )
    df = df.withColumn("_port", F.regexp_extract(F.col("_auth"), r":([0-9]+)$", 1))
    df = df.withColumn(
        "_path", F.regexp_extract(u, r"^[^:]+://[^/?#]*([^?#]*)", 1)
    )
    df = df.withColumn("_query", F.regexp_extract(u, r"\?([^#]*)", 1))
    df = df.withColumn("_params", F.split(F.col("_query"), "&"))
    scheme, host, port = F.col("_scheme"), F.col("_host"), F.col("_port")

    def _is_tracking(x: Column) -> Column:
        cond = x.startswith(TRACKING_PREFIXES[0])
        for pfx in TRACKING_PREFIXES[1:]:
            cond = cond | x.startswith(pfx)
        return cond

    keep = F.filter(F.col("_params"), lambda x: (x != "") & ~_is_tracking(x))
    df = df.withColumn("_qc", F.concat_ws("&", F.array_sort(keep)))
    qc = F.col("_qc")
    port_keep = (
        F.when(port == "", F.lit(""))
        .when((scheme == "http") & (port == "80"), F.lit(""))
        .when((scheme == "https") & (port == "443"), F.lit(""))
        .otherwise(F.concat(F.lit(":"), port))
    )
    df = df.withColumn(
        "_pathn", F.when(F.col("_path") == "", F.lit("/")).otherwise(F.col("_path"))
    )
    url_canonical = F.concat(
        scheme, F.lit("://"), host, port_keep, F.col("_pathn"),
        F.when(qc != "", F.concat(F.lit("?"), qc)).otherwise(F.lit("")),
    )
    has_tracking = F.exists(F.col("_params"), _is_tracking)
    df = with_registrable_domain(df, "_host", "_rd")
    keep_cols = [c for c in df.columns if not c.startswith("_")]
    return df.select(
        *keep_cols,
        scheme.alias("scheme"),
        host.alias("host"),
        F.col("_rd").alias("registrable_domain"),
        F.col("_pathn").alias("path"),
        url_canonical.alias("url_canonical"),
        has_tracking.cast("int").cast("long").alias("has_tracking"),
    )


def url_dedup(df: DataFrame, id_col: str, url_col: str = "url") -> DataFrame:
    """URL-level exact dedup at the coarse key crawl pipelines actually
    use (Dolma's URL dedup normalizes away scheme, subdomains, ports,
    params and fragments): key = registrable_domain || canonical path.
    First occurrence (smallest id) is the keeper; every other copy is
    flagged. Returns (id, url_key, keeper_id, n_copies, is_dup).

    Scale: groupBy(key).agg(min,count) — map-side partial aggregation
    combines the billion-copy hot URL before it shuffles — then one
    equi-join back on the key (AQE skew split governs hot keys; a
    window over the key would put every copy of a hot URL in ONE
    partition with no partial step — the dedup_lines lesson)."""
    c = canonicalize_urls(df, url_col)
    # coalesce-with-literal makes the key statically NON-NULLABLE: else
    # Catalyst infers isnotnull(url_key) for the equi-join and pushes it
    # to the scan with every staged alias INLINED — a single Filter
    # expression ~12 copies of the whole canonicalize chain deep, which
    # overran janino's 64 KB limit and dropped both join-side stages to
    # the interpreter. (The key is never null anyway: concat of non-null
    # rule outputs.)
    keyed = c.select(
        F.col(id_col),
        F.coalesce(
            F.concat(F.col("registrable_domain"), F.col("path")), F.lit("")
        ).alias("url_key"),
    )
    g = keyed.groupBy("url_key").agg(
        F.min(id_col).alias("keeper_id"),
        F.count("*").cast("long").alias("n_copies"),
    )
    return keyed.join(g, "url_key").select(
        id_col,
        "url_key",
        "keeper_id",
        "n_copies",
        (F.col(id_col) != F.col("keeper_id")).cast("int").cast("long").alias("is_dup"),
    )


#: categories in the vendored blocklist fixture (the real UT1/Dolma
#: blocklists are ~4M domain rows of exactly this shape — domain ->
#: category; the mechanism here is the real one, the list is a fixture)
BLOCKLIST_CATEGORIES = ("adult", "gambling", "malware")


def blocklist_fixture(spark) -> DataFrame:
    """Deterministic blocklist fixture over the synthetic domain space:
    every site id ≡ 3 (mod 7) is listed, category rotating by id % 3,
    across all three TLDs."""
    rows = []
    for sid in range(50):
        if sid % 7 == 3:
            cat = BLOCKLIST_CATEGORIES[sid % 3]
            for tld in ("com", "co.uk", "org"):
                rows.append((f"site{sid}.{tld}", cat))
    return spark.createDataFrame(rows, "domain string, category string")


def domain_blocklist_filter(
    df: DataFrame, id_col: str, blocklist: DataFrame, url_col: str = "url"
) -> DataFrame:
    """URL-stage blocklist filtering (RefinedWeb's UT1 stage, Dolma's
    domain filter): canonicalize, cut the registrable domain, and flag
    documents whose domain is listed. Returns
    (id, registrable_domain, blocked, category).

    Scale: the blocklist is a few million (domain, category) rows —
    broadcast it and the probe is a map-side hash join on the scan;
    at 100 TB nothing shuffles but the blocklist bytes."""
    c = canonicalize_urls(df, url_col).select(
        F.col(id_col), "registrable_domain"
    )
    bl = F.broadcast(
        blocklist.select(
            F.col("domain").alias("registrable_domain"), "category"
        )
    )
    return c.join(bl, "registrable_domain", "left").select(
        id_col,
        "registrable_domain",
        F.col("category").isNotNull().cast("int").cast("long").alias("blocked"),
        "category",
    )


# --- domain-graph PageRank (Page et al. 1999; Common Crawl publishes
# exactly this as its domain-level ranking, and curation pipelines use
# it as a quality prior — RefinedWeb/Dolma weight or filter documents by
# source-domain rank). The iterative-graph member of the operator
# inventory, next to Lloyd's k-means and connected components. ---

#: damping factor in milli (the paper's 0.85)
PAGERANK_ALPHA_MILLI = 850
#: fixed power iterations (unrolled in the oracle like Lloyd's)
PAGERANK_ITERS = 5


def synth_domain_links(docs: DataFrame) -> DataFrame:
    """One deterministic link per document over the 50-site id space the
    URL family synthesizes ('site{doc_id % 50}'): src = doc_id % 50,
    dst = an md5 draw of the doc id mod 50 (the sampling family's coin —
    a closed-form dst like (7·doc_id+3) % 50 is CONSTANT per src residue
    class and collapses the graph to a permutation, where PageRank is
    provably uniform; the hash draw gives the irregular in-degree a real
    link graph has). Self-loops dropped; multi-edges keep their
    multiplicity as the edge weight. Replayable by a SQL oracle."""
    from .curation import hash_bucket

    did = F.col("doc_id")
    e = docs.select(
        (did % 50).cast("long").alias("src"),
        hash_bucket(did, 50, "link").cast("long").alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    return e.groupBy("src", "dst").agg(F.count("*").cast("long").alias("w"))


def domain_pagerank(
    docs: DataFrame,
    alpha_milli: int = PAGERANK_ALPHA_MILLI,
    iters: int = PAGERANK_ITERS,
) -> DataFrame:
    """PageRank over the synthesized domain link graph, integer-exact:
    ranks live in ppm, each power iteration computes per-edge flow
    w·r(src) div outdeg(src) (truncating div — deterministic in any
    engine) and r'(d) = base + alpha·(inflow sum) div 1000 with
    base = (1000 - alpha)·10^6 div (1000·N). Dangling mass is dropped
    (the sink variant) — a definition, not an approximation, replayed
    identically by the oracle's unrolled iteration CTEs.

    Scale shape: the real distributed PageRank — edges are the big
    table, scanned once per iteration with a join on src against the
    node-sized rank table (broadcast when nodes fit, AQE otherwise) and
    a map-side-combining groupBy(dst); lineage stays linear in the
    fixed iteration count. Returns (domain_sid, out_weight, rank_ppm)
    for every node."""
    edges = synth_domain_links(docs)
    outdeg = edges.groupBy("src").agg(F.sum("w").cast("long").alias("outdeg"))
    nodes = (
        edges.select(F.col("src").alias("domain_sid"))
        .unionByName(edges.select(F.col("dst").alias("domain_sid")))
        .distinct()
    )
    n_nodes = nodes.agg(F.count("*").cast("long").alias("n"))
    base_expr = f"(1000 - {alpha_milli}) * 1000000 div (1000 * n)"
    init_expr = "1000000 div n"

    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "domain_sid", F.expr(init_expr).cast("long").alias("rank_ppm"), "n"
    )
    ew = edges.join(outdeg, "src")
    for _ in range(iters):
        inflow = (
            ew.join(
                ranks.select(F.col("domain_sid").alias("src"), "rank_ppm"),
                "src",
            )
            .select(
                F.col("dst").alias("domain_sid"),
                F.expr("w * rank_ppm div outdeg").alias("_flow"),
            )
            .groupBy("domain_sid")
            .agg(F.sum("_flow").cast("long").alias("_in"))
        )
        ranks = (
            ranks.select("domain_sid", "n")
            .join(inflow, "domain_sid", "left")
            .select(
                "domain_sid",
                (
                    F.expr(base_expr)
                    + F.expr(
                        f"{alpha_milli} * coalesce(_in, 0) div 1000"
                    )
                ).cast("long").alias("rank_ppm"),
                "n",
            )
        )
    return (
        ranks.select("domain_sid", "rank_ppm")
        .join(
            outdeg.select(F.col("src").alias("domain_sid"),
                          F.col("outdeg").alias("out_weight")),
            "domain_sid",
            "left",
        )
        .select(
            "domain_sid",
            F.coalesce(F.col("out_weight"), F.lit(0)).cast("long")
            .alias("out_weight"),
            "rank_ppm",
        )
    )
