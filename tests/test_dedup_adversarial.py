"""Adversarial-input scale hardening for the dedup family (VERDICT r11
next #2/#3): web-scale corpora are not statistically nice — boilerplate
near-identical pages concentrate millions of documents onto single LSH
buckets and single paragraph-hash keys.  These tests pin that the
operators stay BOUNDED under that shape (hot-bucket sub-sharding, no
single-task hot-key window) while remaining byte-identical to their
oracles on non-adversarial input.
"""

from __future__ import annotations
import pytest

from pyspark.sql import functions as F

from species_range_data_pipeline_spark.catalog import load_table
from species_range_data_pipeline_spark.plans.text import (
    _LSH_BANDS,
    _LSH_BUCKET_CAP,
    minhash_lsh_pairs,
)

SF = "/root/testdata/sf0.01"


def _near_identical_corpus(spark, n: int):
    """n documents sharing one boilerplate body (identical shingle set,
    hence identical MinHash signature, hence ONE bucket per band)."""
    body = " ".join(f"boilerplate{w}" for w in range(40))
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(body).alias("text")
    )


def test_lsh_hot_bucket_fanout_is_capped(spark):
    """10^4 identical docs land in ONE bucket per band.  Uncapped, that is
    C(10^4, 2) ~ 5e7 pairs per band and a 10^4-element collect_list row;
    with the cap the bucket sub-shards to ~cap-sized groups, so per-doc
    fan-out is bounded by bands * cap and the query completes quickly."""
    n, cap = 10_000, 50
    pairs = minhash_lsh_pairs(_near_identical_corpus(spark, n), cap=cap)
    per_doc = pairs.groupBy("doc_a").agg(F.count(F.lit(1)).alias("k"))
    stats = per_doc.agg(
        F.max("k").alias("max_k"), F.sum("k").alias("total")
    ).collect()[0]
    # every doc still pairs with someone (the hot cluster does NOT escape
    # dedup — it collapses to ~one survivor per sub-shard) ...
    n_docs_paired = (
        pairs.select(F.col("doc_a").alias("d"))
        .union(pairs.select(F.col("doc_b").alias("d")))
        .distinct()
        .count()
    )
    assert n_docs_paired == n
    # ... and no doc fans out beyond the banded cap bound
    assert stats["max_k"] <= _LSH_BANDS * cap
    # total candidate volume is ~bands * (n/cap shards) * C(cap,2),
    # orders of magnitude below the uncapped C(n,2)
    assert stats["total"] < n * cap * _LSH_BANDS
    assert stats["total"] < (n * (n - 1)) // 20


def test_lsh_cap_is_inert_below_threshold(spark):
    """Sub-sharding must be a no-op for buckets at or under the cap: the
    same corpus produces identical pairs under the default cap and under
    a cap larger than any bucket (shard is constant 0 either way)."""
    docs = load_table(spark, SF, "documents")
    default = {
        (r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()
    }
    huge_cap = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, cap=10**9).collect()
    }
    assert default == huge_cap
    assert len(default) > 0


def test_emb_lsh_hot_bucket_fanout_is_capped(spark):
    """Embedding-side twin of the MinHash cap: 10^4 IDENTICAL embeddings
    share every band signature (one bucket per band).  With the cap the
    bucket sub-shards; per-vector fan-out is bounded by bands * cap and
    every vector still pairs with someone."""
    from species_range_data_pipeline_spark.operators.similarity import (
        near_dup_candidates,
    )

    n, cap, bands = 10_000, 50, 8
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(j % 7) / 7.0 + 0.1) for j in range(64)]).alias(
            "embedding"
        ),
    )
    pairs = near_dup_candidates(emb, cap=cap)
    per_vec = pairs.groupBy("id_a").agg(F.count(F.lit(1)).alias("k"))
    stats = per_vec.agg(
        F.max("k").alias("max_k"), F.sum("k").alias("total")
    ).collect()[0]
    n_paired = (
        pairs.select(F.col("id_a").alias("d"))
        .union(pairs.select(F.col("id_b").alias("d")))
        .distinct()
        .count()
    )
    assert n_paired == n
    assert stats["max_k"] <= bands * cap
    assert stats["total"] < (n * (n - 1)) // 20


def test_emb_fixture_buckets_are_far_below_cap(spark):
    """The emb_near_dup_lsh / emb_dedup_components_lsh VALUES pins depend
    on no fixture bucket crossing the sub-shard cap.  Pin the headroom
    (sf0.01 largest bucket measured 159; sf0.1 650; cap 4000) so fixture
    regrowth cannot silently cross it."""
    from species_range_data_pipeline_spark.functions.vectors import (
        as_double,
        dot,
    )
    from species_range_data_pipeline_spark.operators.similarity import (
        _EMB_BUCKET_CAP,
        _plane_lit,
        random_hyperplanes,
    )

    emb = load_table(spark, SF, "embeddings")
    planes = random_hyperplanes(64, 16, 42)
    v = as_double("embedding")
    sig = emb.select(
        *[
            (dot(v, _plane_lit(planes[p])) >= 0).cast("int").alias(f"b{p}")
            for p in range(16)
        ]
    )
    mx = 0
    for b in range(8):
        key = F.concat_ws("#", *[f"b{b * 2 + j}" for j in range(2)])
        top = (
            sig.groupBy(key.alias("k"))
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n"))
            .collect()[0][0]
        )
        mx = max(mx, top)
    assert mx * 4 <= _EMB_BUCKET_CAP, (
        f"fixture's largest embedding-LSH bucket ({mx}) is within 4x of "
        f"the cap ({_EMB_BUCKET_CAP}); the VALUES pins would diverge if "
        "it crossed"
    )


@pytest.mark.slow  # r19 slow tier: inertness sweep; the cap-enforced adversarial tests stay default
def test_emb_lsh_cap_is_inert_below_threshold(spark):
    """Fixture pairs must be identical under the default cap and a cap
    larger than any bucket (shard constant 0 either way) — the VALUES pin
    on emb_near_dup_lsh depends on it."""
    from species_range_data_pipeline_spark.operators.similarity import (
        near_dup_lsh,
    )

    emb = load_table(spark, SF, "embeddings")
    default = {
        (r.vec_a, r.vec_b) for r in near_dup_lsh(emb, 0.4).collect()
    }
    huge = {
        (r.vec_a, r.vec_b)
        for r in near_dup_lsh(emb, 0.4, cap=10**9).collect()
    }
    assert default == huge and len(default) > 0


def test_fixture_buckets_are_far_below_cap(spark):
    """The oracle's exactness depends on no fixture bucket exceeding the
    cap (over-cap buckets sub-shard, which the SQL oracle does not model).
    Pin the headroom so a fixture regrowth cannot silently cross it."""
    from species_range_data_pipeline_spark.plans.text import (
        _MINHASH_SALTS,
        _SLICES_PER_MD5,
        _shingles_expr,
        _tokens,
    )

    docs = load_table(spark, SF, "documents")
    sh = docs.select("doc_id", _tokens().alias("toks")).select(
        "doc_id", F.explode(_shingles_expr()).alias("shingle")
    )
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.substring(
                    F.md5(F.concat(F.lit(s), F.lit("|"), F.col("shingle"))),
                    1 + 8 * j,
                    8,
                )
            ).alias(f"mh{i * _SLICES_PER_MD5 + j}")
            for i, s in enumerate(_MINHASH_SALTS)
            for j in range(_SLICES_PER_MD5)
        ]
    )
    per_band = len(_MINHASH_SALTS) * _SLICES_PER_MD5 // _LSH_BANDS
    max_bucket = 0
    for b in range(_LSH_BANDS):
        key = F.concat_ws(
            "#", *[f"mh{b * per_band + j}" for j in range(per_band)]
        )
        top = (
            sig.groupBy(key.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n"))
            .collect()[0][0]
        )
        max_bucket = max(max_bucket, top)
    assert max_bucket * 10 <= _LSH_BUCKET_CAP, (
        f"fixture's largest LSH bucket ({max_bucket}) is within 10x of the "
        f"cap ({_LSH_BUCKET_CAP}); the oracle would diverge if it crossed"
    )


def test_substring_cut_hot_gram_corpus_completes_and_cuts(spark):
    """The r17 single-shuffle substring_cut flags shared grams with a
    min/max window over the gram partition; a boilerplate corpus puts
    EVERY window of 10^3 identical docs into the same gram groups (the
    hottest-group shape — WindowExec buffers each group with disk
    spill).  Pin that the plan completes on that shape and cuts every
    duplicated span: identical docs keep zero tokens."""
    from species_range_data_pipeline_spark.plans.text import substring_cut

    n = 1_000
    out = substring_cut(_near_identical_corpus(spark, n)).collect()
    assert len(out) == n
    assert all(r.n_tokens == 40 for r in out)
    assert all(r.n_kept == 0 for r in out)  # every 6-gram is shared
