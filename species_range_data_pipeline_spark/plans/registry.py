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
# Round-17 window (thirteenth rotation; built from CORRECTNESS_r01..r16):
# first driver rows for the six r17 lakehouse-interop lanes —
# iceberg_read_deletes (v2 position deletes), delta_read_dv (deletion
# vectors), delta_read_changes + iceberg_read_changes (foreign-layout
# CDF twins), stream_delta_tail + stream_iceberg_tail (foreign-layout
# streaming sources) — then the ENTIRE r12-era tranche
# (VERDICT r16 next #1 — 17 queries incl. stream_tcp_restart; after
# this round the freshness floor moves to r13), then the stalest r13
# rows with module fillers resolved within them.
_WINDOW_BUILT_FROM = 16  # newest CORRECTNESS artifact consumed
_PRIORITY = [
    "flagship_threshold_rollup",  # r16 (relational)
    "delta_read_changes",  # FIRST driver row (stats)
    "delta_read_dv",  # FIRST driver row (stats)
    "iceberg_read_changes",  # FIRST driver row (stats)
    "iceberg_read_deletes",  # FIRST driver row (stats)
    "stream_delta_tail",  # FIRST driver row (events)
    "stream_iceberg_tail",  # FIRST driver row (events)
    "ab_test_conversion",  # r12 (stats)
    "agg_bitmap_distinct",  # r12 (stats)
    "agg_listagg",  # r12 (advanced)
    "q7_nation_volume",  # r12 (advanced)
    "regexp_group_funcs",  # r12 (scalar)
    "sample_weighted",  # r12 (quality)
    "setop_except_all",  # r12 (relational)
    "setop_intersect_all",  # r12 (relational)
    "str_funcs",  # r12 (scalar)
    "stream_tcp_restart",  # r12 (events)
    "text_fingerprint",  # r12 (text)
    "text_quality",  # r12 (text)
    "text_tfidf_topk",  # r12 (text)
    "text_token_count",  # r12 (text)
    "text_token_count_bpe",  # r12 (text)
    "unpivot_measures",  # r12 (advanced)
    "window_percent_dist",  # r12 (stats)
    "retrieval_mmr_diversify",  # r13 (retrieval)
    "q11_important_balance",  # r13 (tpch_extra)
    "multimodal_ahash_dups",  # r14 (media)
    "bpe_encode_tokens",  # r15 (bpe)
    "dataset_shuffle_shards",  # r13 (packing)
    "dedup_clusters_star",  # r13 (graph)
    "dedup_incremental_minhash",  # r13 (text)
    "dedup_lsh_bucket_stats",  # r13 (text)
    "dedup_minhash_lsh",  # r13 (text)
    "dedup_paragraphs",  # r13 (text)
    "dedup_repeated_ngrams",  # r13 (text)
    "dedup_simhash",  # r13 (text)
    "dedup_substring_cut",  # r13 (text)
    "doc_pack_ffd",  # r13 (packing)
    "dq_outliers_iqr",  # r13 (quality)
    "emb_kmeans",  # r13 (vectors)
    "emb_label_centroids",  # r13 (vectors)
    "emb_near_dup",  # r13 (vectors)
    "emb_near_dup_lsh",  # r13 (vectors)
    "emb_pca_project",  # r13 (vectors)
    "emb_pq_topk",  # r13 (vectors)
    "emb_quantize_topk",  # r13 (vectors)
    "error_routing",  # r13 (scalar)
    "ev_pattern_consecutive",  # r13 (mining)
    "ev_time_weighted_avg",  # r13 (events)
    "geo_dissolve_area_m2",  # r13 (geo)
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
