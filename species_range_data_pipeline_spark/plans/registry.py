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
# Round-11 window (seventh rotation, VERDICT r10 next #1/#3): clear the
# r4/r5 staleness backlog.  After r10 the stalest driver rows were 16
# r4-era + 30 r5-era; this window takes 44 of those 46 (every r5 row,
# and 14 of the 16 r4 rows), plus stream_tcp_counts (FIRST driver row
# for sources/tcp_lines.py — the replayable TCP socket source driven
# against a live in-process feeder, VERDICT #3), the flagship sentinel,
# and the 4 per-module coverage fillers the invariant requires
# (bpe_encode_tokens r9, retrieval_rrf_fusion r10 — also the round's
# perf A/B watch query, so a fresh driver timing lands beside the A/B,
# multimodal_ahash_dups r9, graph_triangles r6 — the registry's single
# stalest non-r4/r5 row).  The two r4 rows that did not fit are
# setop_except_all and setop_intersect_all, the ALL-semantics twins of
# setop_except / setop_intersect which both went driver-green in r10 —
# the narrowest evidence gap available; they lead the r12 window.
#
# Round-12 window (planned, VERDICT r10 next #7): setop_except_all,
# setop_intersect_all, then the r6-era remainder (35 rows after
# graph_triangles lands here): ab_test_conversion, agg_bitmap_distinct,
# agg_listagg, agg_minmax_by, agg_stats, basket_brand_pairs, date_funcs,
# dedup_ngram_jaccard, doc_pack_sequences_sharded, dq_checks, emb_norms,
# ev_gapfill, ev_ohlc_bars, ev_sliding, geo_haversine_nearest,
# geo_raster_regrid, geo_reproject_points, hier_rollup,
# hist_price_buckets, join_nullsafe, layout_zorder, math_funcs,
# mv_incremental_refresh, q14_promo_share, q18_large_orders,
# q19_disjunctive_predicates, q7_nation_volume, regexp_group_funcs,
# sample_weighted, str_funcs, text_quality, text_tfidf_topk,
# text_token_count, unpivot_measures, window_percent_dist — 37 slots,
# leaving 13 for the flagship sentinel, coverage fillers, and the
# r11-built stream_tcp_restart (checkpoint-restart replay lane, first
# driver row owed).  That finishes the freshness rotation: after r12 no
# row's newest driver evidence predates r7.
#
# Swapped out: the r10 window's 50 hash-green rows (kernels untouched).
_PRIORITY = [
    # flagship sentinel (driver-green r5-r10; also the entry() smoke)
    "flagship_threshold_rollup",
    # FIRST driver row: replayable TCP line source, live feeder end-to-end
    "stream_tcp_counts",
    # --- per-module coverage fillers ---
    "bpe_encode_tokens",       # bpe, r9
    "retrieval_rrf_fusion",    # retrieval (module's only query), r10; perf A/B watch
    "multimodal_ahash_dups",   # media, r9
    "graph_triangles",         # graph, r6 (stalest non-r4/r5 row)
    # --- r4-era rows (14 of 16; the setop _all twins lead r12) ---
    "agg_approx_distinct",
    "agg_distinct",
    "agg_grouping_sets",
    "agg_having",
    "agg_percentiles",
    "join_left_counts",
    "join_range_bands",
    "sort_nulls_ordering",
    "window_lag_delta",
    "window_ntile_buckets",
    "window_rolling_median",
    "window_running_total",
    "window_trailing_range",
    "window_value_frames",
    # --- r5-era rows (all 30) ---
    "agg_cube",
    "cdf_row_changes",
    "doc_pack_sequences",
    "doc_quality_funnel",
    "emb_dedup_components",
    "ev_funnel",
    "ev_retention_cohorts",
    "ev_sessionization",
    "ev_tumbling",
    "geo_dissolve_area",
    "geo_polygonize_components",
    "geo_spatial_join_bin",
    "join_asof",
    "join_interval_overlap",
    "join_lateral_topk",
    "json_funcs",
    "merge_upsert",
    "pivot_wide_status",
    "q21_suppliers_kept_waiting",
    "q2_top_supplier_per_nation",
    "q9_product_type_profit",
    "sample_stratified",
    "setop_union_distinct",
    "sky_pareto_front",
    "str_fuzzy_match",
    "text_bm25_topk",
    "text_decontaminate",
    "text_langid",
    "text_pii_redact",
    "window_topk_per_group",
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
