"""Driver-visible multimodal queries: seed-stable aggregates and the
planted-duplicate ahash groups."""

from __future__ import annotations

from species_range_data_pipeline_spark.plans.media import (
    multimodal_ahash_dups,
    multimodal_decode_stats,
)


def test_decode_stats_stable_rows(spark):
    rows = {r.kind: r for r in multimodal_decode_stats(spark, "unused").collect()}
    assert set(rows) == {"image", "audio", "video"}
    # 64 media: ids %4 -> 2 images : 1 audio : 1 video per 4
    assert rows["image"].n == 32 and rows["audio"].n == 16
    assert rows["video"].n == 42  # frames kept at every=2 across 16 videos
    # seed-stable numeric pins (RandomState payloads)
    assert abs(rows["image"].metric_a - 129.312) < 1e-9
    assert abs(rows["audio"].metric_a - 18931.204) < 1e-9


def test_ahash_dups_finds_planted_pairs(spark):
    rows = {r.dup_group: r for r in multimodal_ahash_dups(spark, "unused").collect()}
    assert rows[None].n_groups == 30 and rows[None].n_images == 30
    assert rows["[0,1000]"].n_images == 2
    assert rows["[1,1001]"].n_images == 2
    assert len(rows) == 3  # no accidental collisions among distinct images
