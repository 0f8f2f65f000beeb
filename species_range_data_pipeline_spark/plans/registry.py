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
# Round-15 window (eleventh rotation; built from CORRECTNESS_r01..r14):
# first driver rows for the newly-registered retrieval_mmr_auto (the
# size-dispatched MMR lane, VERDICT r14 next #3) and
# text_decontaminate_purge_external (the purge lane's production
# signature, VERDICT r14 next #2), then the ENTIRE r10-era tranche
# (VERDICT r14 next #1 — 14 queries incl. 6 streaming lanes; after
# this round the freshness floor moves to r11), then the stalest
# r11/r12 rows with module fillers resolved within them (media/bpe
# fix-ups at r12/r13).
_WINDOW_BUILT_FROM = 14  # newest CORRECTNESS artifact consumed
_PRIORITY = [
    "flagship_threshold_rollup",  # r14 (relational)
    "retrieval_mmr_auto",  # FIRST driver row (retrieval)
    "text_decontaminate_purge_external",  # FIRST driver row (text)
    "agg_entropy_gini",  # r10 (stats)
    "agg_rollup",  # r10 (relational)
    "stream_dedup_replayed",  # r10 (events)
    "stream_interval_join",  # r10 (events)
    "stream_manifest_tail",  # r10 (events)
    "stream_ohlc_flush",  # r10 (events)
    "stream_session_flush",  # r10 (events)
    "stream_stateful_totals",  # r10 (events)
    "subq_above_nation_avg",  # r10 (advanced)
    "subq_exists_late_lines",  # r10 (advanced)
    "warc_ingest_roundtrip",  # r10 (text)
    "webdataset_roundtrip",  # r10 (text)
    "window_anomaly_zscore",  # r10 (advanced)
    "window_rank_dense",  # r10 (relational)
    "multimodal_decode_stats",  # r12 (media)
    "bpe_encode_tokens",  # r13 (bpe)
    "agg_distinct",  # r11 (relational)
    "agg_grouping_sets",  # r11 (advanced)
    "agg_having",  # r11 (relational)
    "agg_percentiles",  # r11 (advanced)
    "cdf_row_changes",  # r11 (stats)
    "doc_pack_sequences",  # r11 (packing)
    "doc_quality_funnel",  # r11 (quality)
    "emb_dedup_components",  # r11 (vectors)
    "ev_funnel",  # r11 (advanced)
    "ev_retention_cohorts",  # r11 (events)
    "ev_sessionization",  # r11 (events)
    "ev_tumbling",  # r11 (events)
    "geo_dissolve_area",  # r11 (geo)
    "geo_polygonize_components",  # r11 (geo)
    "geo_spatial_join_bin",  # r11 (geo)
    "graph_triangles",  # r11 (graph)
    "join_asof",  # r11 (advanced)
    "join_interval_overlap",  # r11 (relational)
    "join_lateral_topk",  # r11 (relational)
    "join_left_counts",  # r11 (relational)
    "join_range_bands",  # r11 (advanced)
    "json_funcs",  # r11 (scalar)
    "merge_upsert",  # r11 (stats)
    "pivot_wide_status",  # r11 (advanced)
    "q21_suppliers_kept_waiting",  # r11 (tpch_extra)
    "q2_top_supplier_per_nation",  # r11 (tpch_extra)
    "q9_product_type_profit",  # r11 (tpch_extra)
    "sample_stratified",  # r11 (quality)
    "setop_union_distinct",  # r11 (relational)
    "sky_pareto_front",  # r11 (mining)
    "sort_nulls_ordering",  # r11 (relational)
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
