#!/usr/bin/env python3
"""Dump formatted physical plans for representative headline queries into
PLANS.md — the .explain("formatted") evidence behind the plan-shape
claims in PARITY.md (broadcasts gated, filters pushed, no cartesians,
WindowGroupLimit top-k, DPP on the IVF lists, decorrelated subqueries).

Usage: python scripts/dump_plans.py [name ...]   (default: the SHOWCASE set)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"

# One representative per plan family; each line says what to look for.
SHOWCASE = {
    "q1_pricing_summary": "partial+final hash agg, scan-level filter pushdown",
    "local_supplier_volume": "one fact-fact shuffle; dims broadcast; region predicate prunes through the join chain",
    "top_parts_per_nation": "per-group top-N plans as WindowGroupLimit, not a global sort",
    "small_qty_revenue": "correlated scalar subquery decorrelated into aggregate + equi-join (no Subquery nodes)",
    "small_qty_revenue_shaped": "hand-shaped Q17: brand-filtered partkeys broadcast-semi-joined BELOW the per-partkey bound aggregate — the agg input is pruned, unlike the declared plan's key-complete rewrite",
    "nation_revenue_share": "global scalar subquery in HAVING planned as one independent aggregate feeding the group filter",
    "product_stats": "two-level distinct (no Expand), broadcast dim join AFTER the aggregate",
    "order_wide": "interval join as range predicate on one shuffle; dim enrich broadcast",
    "dedup_minhash_lsh": "banded LSH candidate join — hash-partitioned on (band, hash), never all-pairs",
    "dedup_incremental_indexed": "probe direction: batch keys broadcast INTO the stored index, index never shuffled",
    "semantic_dedup": "cluster-scoped self-join on cid; tiny count/centroid broadcasts; corpus scanned exactly twice",
    "ann_ivf_quantized_topk": "lists scan reads int8 code columns only (pruned), DPP skips unprobed cid partitions",
    "train_split": "pure per-row expression — zero Exchange anywhere",
    "txlog_snapshot_read": "snapshot read = plain parquet scan over committed files + one hash agg",
    "semantic_dedup_capped": "capped twin: the self-join keys on (cid, sub) — the hot-cluster band is a JOIN KEY, bounding any one cluster's pair cost at cap per band",
    "txlog_dv_delete_read": "deletion-vector read: parquet scan + BROADCAST anti-join of the tiny position sidecar on (file, row_index) — zero rewrites anywhere in the lineage",
    "dedup_exact_substring": "suffix sort decomposed into prefix-bucket windows: the corpus pass ships 8-byte seed hashes, candidate positions broadcast back per doc, 48-token suffixes explode ONLY for multi-occupant buckets, ONE Exchange on bucket, lag/lead LCP in-window — no self-join of the suffix set, no cartesian",
    "bpe_tokenize": "vocabulary-sized encoding: the ten merge folds run over DISTINCT words only; occurrences join back by word and aggregate per doc — the corpus never re-shuffles through the encoder",
    "multimodal_dimensions_av": "JPEG segment walk / MP3 syncsafe skip as staged projections: every byte read compiles once, zero Python, ONE WholeStageCodegen stage",
    "wordpiece_tokenize": "substring candidates x ~2k-piece vocab joins BROADCAST; the greedy munch fold is an in-expression aggregate over DISTINCT words only",
    "unigram_tokenize": "Viterbi DP rides the same broadcast-cost-table shape; the per-word cost array lives in one aggregate fold, never a shuffle",
    "lm_surprisal_bigram": "reference-subset training aggregates feed zipf-keyed count joins left to AQE; the 1-row total broadcast cross-joins",
    "span_corrupt": "objective prep is scan + project: the greedy span fold and sentinel strings build in-expression — zero extra Exchange",
    "text_normalize": "dirt synthesis + normalization is one whole-stage Project over the scan — zero shuffle, zero Python",
    "multimodal_dimensions_mp4": "ISO-BMFF box-tree walk (three staged bounded scans, two nesting levels) fuses into ONE WholeStageCodegen stage — zero Exchange, zero Python",
    "multimodal_dimensions_tiff": "endianness-switching IFD walk: every u16/u32 read is per-row conditional on the II/MM flag, still one codegen stage, zero shuffle",
    "multimodal_dimensions_webp": "three sub-format bit-packings (incl. the VP8L 14-bit bitfields in one u32) dispatch in a single Project over the scan",
    "compression_frame_info": "zstd descriptor-driven layout: field offsets AND widths branch on the descriptor byte — one codegen stage, no walk, no shuffle",
    "bytelevel_bpe_tokenize": "byte-level encode over DISTINCT words (LUT indexing + ten merge folds); positioned occurrences reassemble per doc in one aggregate — no window, no global sort",
    "lm_surprisal_trigram": "three count tables (uni/bi/tri) trained once; scoring joins zipf keys left to AQE; the 1-row total broadcast cross-joins",
    "mojibake_repair": "accent injection, latin-1 round-trip, signature detection and guarded repair in one whole-stage Project — zero shuffle, zero Python",
    "gopher_quality": "all seven published rules as integer arithmetic in one Project on the scan — zero Exchange",
    "langid_ngram": "trigram training one explode+agg; scoring joins the count table with the 5-row totals on a broadcast; argmin via min_by aggregate, no corpus window",
    "content_defined_chunks": "candidate cuts via filtered sequence, greedy spacing via aggregate fold, chunk explode map-side — zero Exchange end to end",
    "tfrecord_varint_decode": "varint field walk: stride = bytes just decoded, nested message walked the same way — one codegen stage, zero Python, zero shuffle",
    # round-10 continuation session
    "flac_stream_info": "cross-byte bit groups read as two u32 halves and shifted apart — one codegen stage, zero shuffle",
    "parquet_footer_info": "tail-anchored thrift walk: staged varint positions computed once each, zigzag decode in-expression — one codegen stage",
    "ogg_page_info": "lacing-table reduce: higher-order aggregate over sequence(1,N) is CodegenFallback, so exactly TWO codegen stages (pinned) — still zero Python, zero Exchange",
    "ebml_track_info": "four nesting levels of width-prefix vints as staged projections — one codegen stage, zero shuffle",
    "avro_header_info": "bounded unrolled map walk (3 steps, strides all data) — one codegen stage, zero shuffle",
    "sentence_segment": "punctuation synthesis + guarded split + posexplode: Generate over the scan projection, zero Exchange",
    "line_dedup": "first-occurrence via groupBy(line) partial agg (map-side combine on hot lines) + one equi-join back + one doc rollup — two shuffles total, no window over the line key",
    "perplexity_buckets": "surprisal joins left to AQE; one window per language partition for the tercile rank",
    "html_extract": "script drop + tag strip + pulls in one per-row projection over the scan — zero Exchange",
    "sft_format": "template render + mask arithmetic: pure scan + project, zero shuffle",
    "contrastive_pairs": "one lead() window partitioned by doc over the segmentation explode — no joins, no global sort",
    "tokenizer_fertility": "the bpe_tokenize lineage plus one per-language hash agg — no new corpus scan",
    # round-10 second continuation session
    "warc_records": "text-protocol framing walk (Content-Length-chained members) as staged projections; the record explode is the only stage split — zero Exchange, zero Python",
    "url_canonicalize": "every URL component a staged alias so each regex compiles once — scan + project, zero Exchange",
    "domain_stats": "one hash agg on the registrable-domain key (map-side partials); distinct-lang via the two-phase rewrite, no Expand blowup",
    "c4_clean": "sentence split + line rules as per-row ARRAY arithmetic (filter/size/array_join) — zero explode, zero join, zero Exchange",
    "domain_mixture_weights": "one corpus hash agg; integer-ppm ratio math on the tiny per-source table; totals on a broadcast one-row join",
    "dedup_editdist": "banded LSH candidates (never all-pairs); levenshtein verification on bounded 128-char prefixes fetched by two point-joins",
    "safetensors_header_info": "u64-LE framing checks + native from_json map parse + higher-order array folds for tensor math — zero Exchange, zero Python",
    "dedup_url": "coalesce-non-nullable join key suppresses the inferred-isnotnull pushdown that inlined the whole canonicalize chain; partial agg + one equi-join back",
    "markdown_extract": "fenced-block drop + link/bold/code unwrap + heading strip in one projection over the scan — zero Exchange",
    "decontaminate_bloom": "two broadcast Bloom-position joins on LONG keys + one broadcast exact probe, corpus shingles scanned once; broadcast side bounded by the bit space",
    "zip_central_dir": "backward EOCD discovery (bounded comment scan) + forward variable-stride entry walk as staged projections — zero Exchange before the member explode",
    "domain_blocklist_filter": "blocklist broadcasts; the probe is a map-side hash join on the scan — nothing shuffles but the blocklist bytes",
    "filter_funnel": "ONE scan, ONE shuffle, ZERO joins: all three stage flags fused into one Project; the survivor-scoped keeper is a digest-group property (max(surv) per digest), so every stage count partial-aggregates map-side in one hot-key-safe groupBy before a 1-row rollup",
    "bm25_topk": "postings pruned by a broadcast query-term semi-join before df/length/scoring; top-k per query is WindowGroupLimit",
    "matryoshka_recall": "ONE brute-force cross join scores every prefix dim per pair (in-plan unpivot, full-dim truth is marker 0); one exchange ranks all (query,dim) groups; overlap is a k-row (query,neighbor) equi-join — no cache, fully lazy",
    "ann_recall_eval": "the two graded searches + one equi-join of k-row sides + a left join back to the query list",
    "lsh_recall_eval": "exact-Jaccard truth (df-capped shingle joins) LEFT JOIN banded candidates + one global rollup",
    "classifier_eval": "zero-shuffle scoring Project + one label join + one global confusion rollup",
    # round 11
    "tar_members": "512-byte block walk with octal-text fields + self-referential checksum (hex-pair higher-order aggregates) — ONE scan, zero Exchange, zero Python before the member explode",
    "rrf_fusion_topk": "two k-per-query candidate lists meet in ONE union -> map-side hash agg -> WindowGroupLimit; no corpus join, the only nested loops are the systems' own broadcast cosine probes",
    "lm_surprisal_kn": "uni/bigram + continuation + history count tables trained once; discount constants ride a 1-row broadcast; scoring joins zipf keys left to AQE (the SB family shape)",
    "mrr_self_retrieval": "a filter + one rollup on the graded bm25 candidate list — nothing touches the corpus beyond the system under evaluation",
    "webdataset_samples": "sample assembly = one map-side-combining groupBy on (shard, sample_key) over the member rows; sample members are contiguous in their shard",
    "lm_surprisal_mkn": "count-of-counts discounts ride the same 1-row broadcast as plain KN; one extra aggregate column set on the history table, scoring joins unchanged",
    "domain_pagerank": "five power iterations, each one edges-to-ranks join (node-sized side broadcasts) + map-side-combining groupBy(dst); lineage linear in the iteration count",
    "classifier_select_topk": "zero-shuffle scoring Project + ONE window partitioned by source for the rank gate — no global sort",
    # round 12
    "tokenizer_fertility_indexed": "encode-only lineage: the stored BpeIndex merge table inlines as literals, ZERO training jobs — distinct-word folds + occurrence join + per-language rollup",
    "image_phash_dedup": "PGM header walk + 64 dHash comparisons in one codegen Project; pairs via the pigeonhole chunk equi-join (never all-pairs, no cartesian)",
    "sample_alignment_gate": "sample assembly groupBy + broadcast embedding lookups + zero-shuffle quantized-cosine gate Project + map-side per-shard rollup — exactly two hash exchanges end to end",
}


def main() -> None:
    from pyspark.sql import SparkSession

    from flink_real_time_data_warehouse_spark.queries import registry

    names = sys.argv[1:] or list(SHOWCASE)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry()
    out = [
        "# PLANS — formatted physical plans of representative headliners",
        "",
        f"Generated by `scripts/dump_plans.py` at sf0.01 ({SF_DIR}).",
        "Initial (pre-AQE) plans; AQE may further coalesce partitions and",
        "convert eligible joins at runtime. Each section notes what the",
        "plan is expected to show.",
        "",
    ]
    for name in names:
        df = qs[name].spark(spark, SF_DIR)
        jdf = df._jdf
        plan = df._sc._jvm.PythonSQLUtils.explainString(jdf.queryExecution(), "formatted")
        out.append(f"## {name}")
        out.append("")
        if name in SHOWCASE:
            out.append(f"*Expected: {SHOWCASE[name]}.*")
            out.append("")
        out.append("```")
        # escape control bytes (NUL separators, BEL sentinels in string
        # literals of the byte-walk plans) so the file stays greppable text
        out.append(
            "".join(
                c if c == "\n" or c == "\t" or ord(c) >= 32 else f"\\x{ord(c):02x}"
                for c in plan.rstrip()
            )
        )
        out.append("```")
        out.append("")
        print(f"{name}: ok", file=sys.stderr)
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md", file=sys.stderr)


if __name__ == "__main__":
    main()
