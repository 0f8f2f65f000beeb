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
# Round-6 window: flagship + 4 sentinels + the 3 queries whose oracles
# were upgraded from rows-only to VALUES this round + 1 module rep each
# for tpch_extra/retrieval (fully driver-seen families) + 40 queries with
# NO driver row in rounds 1-5 (cross-checked against CORRECTNESS_r0*.json).
_PRIORITY = [
    # sentinels (driver-green in r5; regression canaries)
    "flagship_threshold_rollup",
    "q1_pricing_summary",
    "join_anti_idempotent",  # D1 back in evidence (VERDICT r5 #5)
    "dedup_minhash_lsh",
    "cosine_topk",
    # rows-only -> VALUES-oracle upgrades (flip to hash-green this round)
    "bpe_encode_tokens",
    "emb_pq_topk",
    "multimodal_decode_stats",
    # module reps: every query in these families already driver-seen
    "q4_order_priority",
    "retrieval_rrf_fusion",
    # --- first driver rows below this line ---
    # advanced
    "q7_nation_volume",
    "q14_promo_share",
    "q18_large_orders",
    "q19_disjunctive_predicates",
    "unpivot_measures",
    "join_nullsafe",
    "agg_listagg",
    # stats
    "agg_bitmap_distinct",
    "window_percent_dist",
    "mv_incremental_refresh",
    "agg_stats",
    "agg_minmax_by",
    "ab_test_conversion",
    # mining
    "layout_zorder",
    "hist_price_buckets",
    "basket_brand_pairs",
    # quality
    "dq_checks",
    "sample_weighted",
    # scalar
    "str_funcs",
    "date_funcs",
    "math_funcs",
    "regexp_group_funcs",
    # text / dedup
    "text_quality",
    "text_token_count",
    "text_tfidf_topk",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    # packing
    "dataset_interleave_epochs",
    "doc_pack_sequences_sharded",
    # vectors
    "emb_norms",
    "emb_label_centroids",
    # events
    "ev_sliding",
    "ev_ohlc_bars",
    "ev_gapfill",
    # geo (reproject is new this round: driver-visible from day one)
    "geo_raster_regrid",
    "geo_haversine_nearest",
    "geo_reproject_points",
    # graph
    "hier_rollup",
    "dedup_clusters",
    "graph_triangles",
]


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
