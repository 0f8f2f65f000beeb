"""WebDataset shard lane: deterministic sharding, byte-stable tars,
manifest accounting, and the full write -> read -> pivot round-trip."""

from __future__ import annotations

import tarfile
from pathlib import Path

from pyspark.sql import functions as F

from species_range_data_pipeline_spark.sources.webdataset import (
    read_webdataset,
    read_webdataset_samples,
    write_webdataset,
)

from .conftest import SF_SMOKE


def _write_docs(spark, out, n_shards=4):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    manifest = write_webdataset(
        docs,
        str(out),
        key_col="doc_id",
        payload_cols={"text": "txt", "lang": "cls"},
        n_shards=n_shards,
    ).collect()
    return docs, manifest


def test_write_manifest_and_shard_files(spark, tmp_path):
    docs, manifest = _write_docs(spark, tmp_path / "wds")
    n_docs = docs.count()
    assert sum(m.n_samples for m in manifest) == n_docs
    shards = sorted(Path(tmp_path / "wds").glob("*.tar"))
    assert [m.shard for m in sorted(manifest, key=lambda m: m.shard)] == [
        str(p) for p in shards
    ]
    for m in manifest:
        assert m.n_bytes == Path(m.shard).stat().st_size
    # every sample contributes its two member files, key-sorted in-shard
    with tarfile.open(shards[0]) as tf:
        names = tf.getnames()
    assert len(names) % 2 == 0
    keys = [int(n.rpartition(".")[0]) for n in names[::2]]
    assert keys == sorted(keys)  # key-column order (numeric here)


def test_shards_are_byte_stable(spark, tmp_path):
    _write_docs(spark, tmp_path / "a")
    _write_docs(spark, tmp_path / "b")
    for pa in sorted(Path(tmp_path / "a").glob("*.tar")):
        pb = Path(tmp_path / "b") / pa.name
        assert pa.read_bytes() == pb.read_bytes(), pa.name


def test_roundtrip_members_and_pivot(spark, tmp_path):
    docs, _ = _write_docs(spark, tmp_path / "wds")
    members = read_webdataset(spark, str(tmp_path / "wds"))
    assert set(r.ext for r in members.select("ext").distinct().collect()) == {
        "txt", "cls"
    }

    samples = read_webdataset_samples(spark, str(tmp_path / "wds"))
    got = {
        int(r.key): (bytes(r.txt).decode(), bytes(r.cls).decode())
        for r in samples.collect()
    }
    want = {
        r.doc_id: (r.text, r.lang)
        for r in docs.select("doc_id", "text", "lang").collect()
    }
    assert got == want


def test_shard_routing_is_deterministic_hash(spark, tmp_path):
    """Same key always lands in the same shard file across writes and
    cluster layouts: the shard id is a pure function of the key."""
    docs, _ = _write_docs(spark, tmp_path / "wds", n_shards=3)
    members = read_webdataset(spark, str(tmp_path / "wds"))
    by_key = {
        r.key: r.shard for r in members.where(F.col("ext") == "txt").collect()
    }
    expect = {
        str(r.doc_id): f"shard-{r.sh:05d}.tar"
        for r in docs.select(
            "doc_id",
            F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(3)).alias("sh"),
        ).collect()
    }
    assert {k: Path(v).name for k, v in by_key.items()} == expect


def test_python_datasource_matches_mapinpandas_lane(spark, tmp_path):
    """format('webdataset') streams one partition per shard and returns
    exactly the member rows of the binaryFile+mapInPandas lane."""
    from species_range_data_pipeline_spark.sources.python_datasource import (
        register_webdataset_source,
    )
    from species_range_data_pipeline_spark.sources.webdataset import (
        read_webdataset,
        write_webdataset,
    )

    docs = spark.createDataFrame(
        [(i, f"text-{i}".encode(), b"M" + bytes([i])) for i in range(20)],
        "doc_id long, txt binary, meta binary",
    )
    manifest = write_webdataset(
        docs, str(tmp_path), "doc_id", {"txt": "txt", "meta": "bin"}, n_shards=3
    ).collect()
    assert len(manifest) == 3

    register_webdataset_source(spark)
    via_ds = (
        spark.read.format("webdataset").option("path", str(tmp_path)).load()
    )
    want = sorted(
        (r.key, r.ext, bytes(r.content))
        for r in read_webdataset(spark, str(tmp_path)).collect()
    )
    got = sorted((r.key, r.ext, bytes(r.content)) for r in via_ds.collect())
    assert got == want and len(got) == 40  # 20 samples x 2 extensions
    # partition-per-shard: the scan parallelism is the shard count
    assert via_ds.rdd.getNumPartitions() == 3
