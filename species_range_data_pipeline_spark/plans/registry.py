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
# Round-13 window (ninth rotation; built from CORRECTNESS_r01..r12):
# first driver rows for the r12-built dedup_lsh_bucket_stats and
# dedup_incremental_minhash (after which driver coverage is 201/201
# all-time), then the r7-era trio, the r8-era tranche, module fillers
# (media/tpch_extra/bpe/retrieval had no r9-or-staler row), and the
# stalest r9-era rows.
_WINDOW_BUILT_FROM = 12  # newest CORRECTNESS artifact consumed
_PRIORITY = [
    "flagship_threshold_rollup",  # r12 (relational)
    "dataset_shuffle_shards",  # FIRST driver row (packing)
    "dedup_incremental_minhash",  # FIRST driver row (text)
    "dedup_lsh_bucket_stats",  # FIRST driver row (text)
    "retrieval_mmr_diversify",  # FIRST driver row (retrieval)
    "text_decontaminate_purge",  # FIRST driver row (text)
    "text_normalize_unicode",  # FIRST driver row (text)
    "text_winnow_fingerprint",  # r7 (text)
    "text_word_topk",  # r7 (text)
    "xml_roundtrip_parse",  # r7 (scalar)
    "doc_pack_ffd",  # r8 (packing)
    "emb_kmeans",  # r8 (vectors)
    "emb_pca_project",  # r8 (vectors)
    "geo_point_in_polygon",  # r8 (geo)
    "map_funcs",  # r8 (scalar)
    "sketch_cms_brand_counts",  # r8 (stats)
    "sketch_hll_distinct",  # r8 (stats)
    "sample_hash_bucket",  # r9 (advanced)
    "subtitle_cue_stats",  # r10 (media)
    "q11_important_balance",  # r10 (tpch_extra)
    "bpe_encode_tokens",  # r11 (bpe)
    "cosine_topk",  # r9 (vectors)
    "curation_domain_cap",  # r9 (quality)
    "curation_token_budget",  # r9 (quality)
    "dataset_interleave_epochs",  # r9 (packing)
    "dedup_clusters_star",  # r9 (graph)
    "dedup_minhash_lsh",  # r9 (text)
    "dedup_paragraphs",  # r9 (text)
    "dedup_repeated_ngrams",  # r9 (text)
    "dedup_simhash",  # r9 (text)
    "dedup_substring_cut",  # r9 (text)
    "dq_outliers_iqr",  # r9 (quality)
    "emb_label_centroids",  # r9 (vectors)
    "emb_near_dup",  # r9 (vectors)
    "emb_near_dup_lsh",  # r9 (vectors)
    "emb_pq_topk",  # r9 (vectors)
    "emb_quantize_topk",  # r9 (vectors)
    "error_routing",  # r9 (scalar)
    "ev_pattern_consecutive",  # r9 (mining)
    "ev_time_weighted_avg",  # r9 (events)
    "geo_dissolve_area_m2",  # r9 (geo)
    "geo_range_overlap",  # r9 (geo)
    "graph_pagerank",  # r9 (graph)
    "hier_rollup_sql",  # r9 (graph)
    "join_anti_idempotent",  # r9 (relational)
    "json_udtf_dynamic",  # r9 (scalar)
    "null_cond_funcs",  # r9 (scalar)
    "profile_orders",  # r9 (quality)
    "q1_pricing_summary",  # r9 (relational)
    "sample_balanced_classes",  # r9 (quality)
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
