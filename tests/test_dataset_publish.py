"""Composition: media payloads -> WebDataset shards -> manifest-table
commit = an atomically published, time-travelable multimodal dataset
(SCALE.md rules 15 + 18 wired together)."""

from __future__ import annotations

import numpy as np

from species_range_data_pipeline_spark.multimodal.jpeg import (
    decode_jpeg,
    encode_jpeg,
)
from species_range_data_pipeline_spark.sources.manifest_table import (
    read_manifest_table,
    table_versions,
    write_manifest_table,
)
from species_range_data_pipeline_spark.sources.webdataset import (
    read_webdataset_samples,
    write_webdataset,
)


def _media_df(spark, n, offset=0):
    rows = []
    for i in range(n):
        yy, xx = np.mgrid[0:16, 0:16]
        img = ((yy * (i + offset + 1) * 3 + xx) % 256).astype(np.uint8)
        rows.append((i + offset, encode_jpeg(img, quality=95), f"img-{i + offset}"))
    return spark.createDataFrame(rows, "sample_id long, jpg binary, caption string")


def test_publish_shards_then_commit_manifest_atomically(spark, tmp_path):
    shard_dir = str(tmp_path / "shards-v0")
    table = str(tmp_path / "dataset")

    media = _media_df(spark, 12)
    manifest = write_webdataset(
        media, shard_dir, key_col="sample_id",
        payload_cols={"jpg": "jpg", "caption": "txt"}, n_shards=3,
    )
    v0 = write_manifest_table(manifest, table)
    assert v0 == 0 and table_versions(table) == [0]

    # a second batch lands in NEW shard files and appends a new version
    shard_dir2 = str(tmp_path / "shards-v1")
    manifest2 = write_webdataset(
        _media_df(spark, 6, offset=100), shard_dir2, key_col="sample_id",
        payload_cols={"jpg": "jpg", "caption": "txt"}, n_shards=2,
    )
    v1 = write_manifest_table(manifest2, table)
    assert v1 == 1

    # time travel: v0 sees 12 samples across 3 shards; v1 sees both drops
    m0 = read_manifest_table(spark, table, version=0).collect()
    assert sum(r.n_samples for r in m0) == 12 and len(m0) == 3
    m1 = read_manifest_table(spark, table, version=1).collect()
    assert sum(r.n_samples for r in m1) == 18

    # the manifest's shard paths are live: stream every sample back out
    # of the committed shard set and decode the JPEGs
    shards = sorted({r.shard.rsplit("/", 1)[0] for r in m1})
    total = 0
    for d in shards:
        samples = read_webdataset_samples(spark, d).collect()
        for s in samples:
            w, h, c, px = decode_jpeg(bytes(s.jpg))
            assert (w, h) == (16, 16)
            assert bytes(s.txt).decode() == f"img-{s.key}"
        total += len(samples)
    assert total == 18
