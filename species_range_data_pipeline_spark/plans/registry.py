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
_WINDOW_BUILT_FROM = 15  # newest CORRECTNESS artifact consumed
_PRIORITY = [
    "flagship_threshold_rollup",  # r15 (relational)
    "delta_read_snapshot",  # FIRST driver row (stats)
    "iceberg_read_snapshot",  # FIRST driver row (stats)
    "agg_approx_distinct",  # r11 (advanced)
    "agg_cube",  # r11 (advanced)
    "str_fuzzy_match",  # r11 (scalar)
    "stream_tcp_counts",  # r11 (events)
    "text_bm25_topk",  # r11 (text)
    "text_decontaminate",  # r11 (text)
    "text_langid",  # r11 (text)
    "text_pii_redact",  # r11 (text)
    "window_lag_delta",  # r11 (relational)
    "window_ntile_buckets",  # r11 (advanced)
    "window_rolling_median",  # r11 (advanced)
    "window_running_total",  # r11 (relational)
    "window_topk_per_group",  # r11 (relational)
    "window_trailing_range",  # r11 (advanced)
    "window_value_frames",  # r11 (advanced)
    "retrieval_rrf_fusion",  # r12 (retrieval)
    "subtitle_cue_stats",  # r13 (media)
    "bpe_train_merges",  # r14 (bpe)
    "agg_minmax_by",  # r12 (stats)
    "agg_stats",  # r12 (stats)
    "basket_brand_pairs",  # r12 (mining)
    "date_funcs",  # r12 (scalar)
    "dedup_ngram_jaccard",  # r12 (text)
    "doc_pack_sequences_sharded",  # r12 (packing)
    "dq_checks",  # r12 (quality)
    "emb_dedup_components_lsh",  # r12 (vectors)
    "emb_near_dup_bruteforce",  # r12 (vectors)
    "emb_norms",  # r12 (vectors)
    "ev_gapfill",  # r12 (events)
    "ev_ohlc_bars",  # r12 (events)
    "ev_rollup_two_level",  # r12 (events)
    "ev_sliding",  # r12 (events)
    "ev_type_pivot",  # r12 (events)
    "geo_haversine_nearest",  # r12 (geo)
    "geo_raster_regrid",  # r12 (geo)
    "geo_reproject_points",  # r12 (geo)
    "hier_rollup",  # r12 (graph)
    "hist_price_buckets",  # r12 (mining)
    "join_nullsafe",  # r12 (advanced)
    "json_variant_funcs",  # r12 (scalar)
    "layout_zorder",  # r12 (mining)
    "math_funcs",  # r12 (scalar)
    "mv_incremental_refresh",  # r12 (stats)
    "q14_promo_share",  # r12 (advanced)
    "q18_large_orders",  # r12 (advanced)
    "q19_disjunctive_predicates",  # r12 (advanced)
    "q4_order_priority",  # r12 (tpch_extra)
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
