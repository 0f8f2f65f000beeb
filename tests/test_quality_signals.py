"""Quality-signal operators without a SQL oracle: the zlib
compression-ratio kernel is pinned by information-theoretic invariants
and a direct stdlib recomputation."""

from __future__ import annotations

import zlib

import pytest

from species_range_data_pipeline_spark.plans.quality import (
    text_compression_ratio,
)

from .conftest import SF_CORRECT


def test_compression_ratio_matches_direct_zlib(spark):
    rows = {r.lang: r for r in text_compression_ratio(spark, SF_CORRECT).collect()}
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").collect()
    by_lang: dict[str, list[float]] = {}
    for d in docs:
        b = d.text.encode("utf-8")
        by_lang.setdefault(d.lang, []).append(
            round(len(zlib.compress(b, 6)) / max(1, len(b)), 6)
        )
    assert set(rows) == set(by_lang)
    for lang, ratios in by_lang.items():
        assert rows[lang].n_docs == len(ratios)
        assert rows[lang].avg_ratio == pytest.approx(
            round(sum(ratios) / len(ratios), 4), abs=1e-4
        )
        assert rows[lang].min_ratio == pytest.approx(min(ratios), abs=1e-4)
        assert rows[lang].max_ratio == pytest.approx(max(ratios), abs=1e-4)


def test_ratio_orders_repetitive_below_random(spark):
    """The signal must separate what it exists to separate."""
    from species_range_data_pipeline_spark.plans import quality  # noqa: F401
    import numpy as np

    rng = np.random.RandomState(0)
    rep = ("lorem ipsum " * 200).encode()
    rnd = bytes(rng.randint(32, 127, len(rep), dtype=np.uint8))
    r_rep = len(zlib.compress(rep, 6)) / len(rep)
    r_rnd = len(zlib.compress(rnd, 6)) / len(rnd)
    assert r_rep < 0.05 < 0.5 < r_rnd


def test_funnel_pass_equals_shared_predicate(spark):
    """doc_quality_funnel's 'pass' bucket must agree with the shared
    quality_pass_condition used by the capstone and streaming ingest."""
    from species_range_data_pipeline_spark.plans.quality import (
        doc_quality_funnel,
        quality_pass_condition,
    )

    rows = {r.stage: r.n_docs for r in doc_quality_funnel(spark, SF_CORRECT).collect()}
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    assert rows.get("pass", 0) == docs.where(quality_pass_condition()).count()
