"""Streaming corpus ingestion: overlapping batches dedup across the
batch boundary, restarts replay nothing, and the result equals the
batch pipeline's filter+dedup on the union of inputs."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from species_range_data_pipeline_spark.streaming.corpus import (
    ingest_corpus_stream,
    normalized_fingerprint,
    quality_pass_condition,
    read_document_stream,
)

from .conftest import SF_CORRECT


@pytest.fixture()
def staged_batches(spark, tmp_path):
    """Two source files with overlapping doc ranges: file B replays
    100 docs of file A plus 200 new ones."""
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    src = tmp_path / "incoming"
    src.mkdir()
    docs.where("doc_id < 300").coalesce(1).write.parquet(str(src / "f=a"))
    docs.where("doc_id >= 200").coalesce(1).write.parquet(str(src / "f=b"))
    return docs, str(src)


def test_overlapping_batches_ingest_each_doc_once(spark, tmp_path, staged_batches):
    docs, src = staged_batches
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = read_document_stream(spark, src, max_files_per_trigger=1)
    q = ingest_corpus_stream(stream, sink, ckpt)
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(sink)
    # equals the batch semantics on the union: pass-filter, one row per fp
    want = (
        docs.where(quality_pass_condition())
        .withColumn("fp", normalized_fingerprint())
        .select("fp")
        .distinct()
        .count()
    )
    assert got.count() == want
    assert got.select("fp").distinct().count() == want
    # overlap region ingested exactly once
    overlap = got.where("doc_id >= 200 AND doc_id < 300").groupBy("doc_id").count()
    assert overlap.where("count > 1").count() == 0

    # restart with the same checkpoint: nothing re-ingests
    stream2 = read_document_stream(spark, src, max_files_per_trigger=1)
    q2 = ingest_corpus_stream(stream2, sink, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(sink).count() == want


def test_new_file_after_restart_adds_only_new_fingerprints(
    spark, tmp_path, staged_batches
):
    docs, src = staged_batches
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = ingest_corpus_stream(
        read_document_stream(spark, src), sink, ckpt
    )
    q.processAllAvailable()
    q.stop()
    before = spark.read.parquet(sink).count()

    # a third file arrives: half replay, half genuinely new text
    extra = docs.where("doc_id < 50").select(
        (F.col("doc_id") + 5000).alias("doc_id"),
        F.concat(F.lit("fresh unseen prefix "), "text").alias("text"),
        "lang",
        "source",
        (F.col("n_chars") + 20).alias("n_chars"),
    )
    replay = docs.where("doc_id < 50")
    extra.unionByName(replay).coalesce(1).write.parquet(f"{src}/f=c")

    q2 = ingest_corpus_stream(
        read_document_stream(spark, src), sink, ckpt
    )
    q2.processAllAvailable()
    q2.stop()
    after = spark.read.parquet(sink)
    n_new = (
        extra.where(quality_pass_condition()).count()
    )
    assert after.count() == before + n_new
    assert after.where("doc_id >= 5000").count() == n_new
