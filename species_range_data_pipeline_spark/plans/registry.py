"""Aggregates every plan module's QUERIES/ORACLES for the driver contract."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MODULE_NAMES = [
    "relational",
    "tpch_extra",
    "advanced",
    "stats",
    "mining",
    "quality",
    "scalar",
    "text",
    "bpe",
    "packing",
    "retrieval",
    "vectors",
    "events",
    "media",
    "geo",
    "graph",
]

# The driver's correctness gate samples the FIRST 50 queries in dict
# iteration order.  The window is curated here and ROTATES each round
# (VERDICT r5 #1): driver-green evidence accumulates across rounds toward
# all registered queries, so already-green slots are swapped for queries
# that have never had a driver row.  Invariants (pinned by
# tests/test_registry.py): exactly 50 names, every plan module (all 16)
# represented, every name resolves, every name oracle-backed.
#
# From round 13 the window is GENERATED, not hand-curated (VERDICT r12
# next #7): ``python scripts/build_next_window.py`` computes it from the
# committed CORRECTNESS_r*.json union (flagship sentinel first, then
# never-windowed queries, then stalest-first fill, then a module-coverage
# fix-up), and tests/test_registry.py::test_priority_matches_window_builder
# pins this block to the script's output for the committed artifacts.
# _WINDOW_BUILT_FROM records the newest artifact round consumed; the test
# also asserts it equals the newest committed round, so a new round's
# session MUST regenerate this block (run the script, paste its output
# here, done) before the suite goes green.
#
# Round-14 window (tenth rotation; built from CORRECTNESS_r01..r13):
# first driver rows for the newly-registered production lanes
# retrieval_mmr_diversify_ivf (the 100-TB MMR candidate head) and
# dedup_incremental_minhash_manifest (signatures from the manifest
# store), then the ENTIRE r9-era tranche (VERDICT r13 next #4 — after
# this round the freshness floor moves to r10), then the stalest
# r10-era rows (module fillers resolved within them).
_WINDOW_BUILT_FROM = 13  # newest CORRECTNESS artifact consumed
_PRIORITY = [
    "flagship_threshold_rollup",  # r13 (relational)
    "dedup_incremental_minhash_manifest",  # FIRST driver row (text)
    "retrieval_mmr_diversify_ivf",  # FIRST driver row (retrieval)
    "agg_count_if_bool",  # r9 (stats)
    "agg_string_concat",  # r9 (stats)
    "corpus_pipeline_summary",  # r9 (packing)
    "corr_measures",  # r9 (mining)
    "sketch_quantile_bottomk",  # r9 (stats)
    "stream_tumbling_counts",  # r9 (events)
    "text_bigram_lm",  # r9 (text)
    "text_chunk_udtf",  # r9 (text)
    "text_compression_ratio",  # r9 (quality)
    "text_perplexity",  # r9 (text)
    "text_pii_scrub",  # r9 (quality)
    "text_quality_classifier",  # r9 (text)
    "text_repetition",  # r9 (text)
    "window_udaf_ewma",  # r9 (events)
    "multimodal_ahash_dups",  # r11 (media)
    "bpe_train_merges",  # r12 (bpe)
    "agg_salted_twophase",  # r10 (advanced)
    "ann_ivf_topk",  # r10 (vectors)
    "array_map_funcs",  # r10 (advanced)
    "dataset_mixture",  # r10 (packing)
    "dedup_clusters",  # r10 (graph)
    "dedup_exact",  # r10 (text)
    "dedup_keep_best",  # r10 (quality)
    "filename_parse",  # r10 (scalar)
    "geo_container_roundtrip",  # r10 (geo)
    "geo_range_overlap_bands",  # r10 (geo)
    "geo_shapefile_roundtrip",  # r10 (geo)
    "join_full_outer",  # r10 (relational)
    "join_semi",  # r10 (relational)
    "join_skew_salted",  # r10 (advanced)
    "q10_returned_revenue",  # r10 (advanced)
    "q12_late_priority_lines",  # r10 (tpch_extra)
    "q13_customer_distribution",  # r10 (tpch_extra)
    "q15_top_supplier",  # r10 (tpch_extra)
    "q16_supplier_part_relationship",  # r10 (tpch_extra)
    "q17_small_quantity_revenue",  # r10 (tpch_extra)
    "q20_excess_shipments",  # r10 (tpch_extra)
    "q22_dormant_customers",  # r10 (tpch_extra)
    "q3_shipping_priority",  # r10 (relational)
    "q5_region_volume",  # r10 (relational)
    "q6_revenue_delta",  # r10 (advanced)
    "q8_market_share",  # r10 (tpch_extra)
    "scd2_customer_history",  # r10 (mining)
    "scrape_pipeline_live",  # r10 (relational)
    "setop_except",  # r10 (relational)
    "setop_intersect",  # r10 (relational)
    "sort_limit_topk",  # r10 (relational)
]

# Queries whose oracles are pure VALUES restatements of expected OUTPUT
# (no fixture-table computation beyond the scale-key count) — i.e. rows
# captured from the engine's own verified output (the r6/r7 graduation
# of the rows-only set).  The driver hash-check on these detects
# drift/nondeterminism, NOT independent correctness — that burden stays
# on the per-query golden tests (numpy kmeans/PCA, pure-Python BPE/FFD,
# zlib compression, HLL/CMS/bottom-k error bounds, planted-pair media
# fixtures).  tests/test_registry.py maps every name here to its golden
# and asserts both directions (no untagged self-pin, no tag without a
# golden).  Everything NOT listed is a cross-engine DuckDB restatement
# of the computation itself.
SELF_PINNED = frozenset({
    "bpe_encode_tokens",
    "bpe_train_merges",
    "doc_pack_ffd",
    "emb_dedup_components_lsh",
    "emb_kmeans",
    "emb_near_dup_lsh",
    "emb_pca_project",
    "emb_pq_topk",
    "multimodal_ahash_dups",
    "multimodal_decode_stats",
    "sketch_cms_brand_counts",
    "sketch_hll_distinct",
    "sketch_quantile_bottomk",
    "subtitle_cue_stats",
    "text_compression_ratio",
})


def _modules():
    import importlib

    mods = []
    for name in _MODULE_NAMES:
        try:
            mods.append(importlib.import_module(f"{__package__}.{name}"))
        except ModuleNotFoundError:
            continue  # module not built yet; registry stays partial
    return mods


def _prioritize(d: dict) -> dict:
    """Reorder so _PRIORITY keys lead (in that order), rest keep module order."""
    head = {k: d[k] for k in _PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r}")
            queries[name] = fn
    return _prioritize(queries)


def all_oracles() -> dict[str, str]:
    oracles: dict[str, str] = {}
    for mod in _modules():
        oracles.update(getattr(mod, "ORACLES", {}))
    return _prioritize(oracles)
