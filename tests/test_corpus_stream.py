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


def test_manifest_stream_source_tails_versions(spark, tmp_path):
    """The manifest_stream source reads each committed version exactly
    once as it lands: the first batch covers existing versions, later
    appends arrive incrementally, and a restart from the checkpoint picks
    up only versions committed while the stream was down."""
    from species_range_data_pipeline_spark.sources.manifest_stream import (
        register_manifest_stream_source,
    )
    from species_range_data_pipeline_spark.sources.manifest_table import (
        write_manifest_table,
    )

    register_manifest_stream_source(spark)
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    write_manifest_table(spark.range(0, 10).selectExpr("id", "id * 2 AS x"), tbl)
    write_manifest_table(spark.range(10, 15).selectExpr("id", "id * 2 AS x"), tbl)

    def run_once():
        q = (
            spark.readStream.format("manifest_stream")
            .option("path", tbl)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got = spark.read.parquet(out)
    assert sorted(r.id for r in got.collect()) == list(range(15))

    # new commit while the stream is down -> restart reads ONLY v2
    write_manifest_table(spark.range(15, 18).selectExpr("id", "id * 2 AS x"), tbl)
    run_once()
    got = spark.read.parquet(out).collect()
    assert sorted(r.id for r in got) == list(range(18))
    assert len(got) == 18  # no version replayed twice
    assert all(r.x == r.id * 2 for r in got)


def test_manifest_stream_change_commit_fails_or_skips(spark, tmp_path):
    """A DML rewrite is not representable as an append stream: default
    fails loudly; skipChangeCommits streams around it (appends only)."""
    import pytest as _pytest

    from species_range_data_pipeline_spark.sources.manifest_stream import (
        ManifestStreamReader,
        register_manifest_stream_source,
    )
    from species_range_data_pipeline_spark.sources.manifest_table import (
        delete_where,
        table_schema,
        write_manifest_table,
    )

    register_manifest_stream_source(spark)
    tbl = str(tmp_path / "tbl")
    write_manifest_table(
        spark.range(0, 10).selectExpr("id", "id * 2 AS x").coalesce(1), tbl
    )
    delete_where(spark, tbl, [("id", "<", 3)])  # v1: rewrite commit
    write_manifest_table(
        spark.range(10, 12).selectExpr("id", "id * 2 AS x").coalesce(1), tbl
    )

    # driver-side planner check (partitions() runs on the driver)
    reader = ManifestStreamReader({"path": tbl}, table_schema(tbl))
    with _pytest.raises(ValueError, match="skipChangeCommits"):
        reader.partitions({"version": 0}, {"version": 2})

    skip = ManifestStreamReader(
        {"path": tbl, "skipChangeCommits": "true"}, table_schema(tbl)
    )
    parts = skip.partitions({"version": 0}, {"version": 2})
    rows = [t for p in parts for b in skip.read(p) for t in b.to_pylist()]
    assert sorted(r["id"] for r in rows) == [10, 11]

    # end-to-end with the option set: v0 + v2 appear, the rewrite never does
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("manifest_stream")
        .option("path", tbl)
        .option("skipChangeCommits", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(10)) + [10, 11]


def test_stream_upsert_sink_latest_per_key(spark, tmp_path):
    """Streaming CDC MERGE sink: microbatches of keyed updates collapse
    to latest-per-key within each batch and MERGE into the table; the
    final state is exactly last-write-per-key across the whole stream,
    and a replayed batch cannot change state (idempotent by content)."""
    from pyspark.sql import functions as F

    from species_range_data_pipeline_spark.sources.manifest_table import (
        read_manifest_table,
        upsert_into,
        write_manifest_table,
        write_stream_upsert,
    )

    tbl = str(tmp_path / "tbl")
    write_manifest_table(
        spark.range(0, 20).selectExpr(
            "id AS k", "CAST(0 AS long) AS seq", "CAST(-1 AS long) AS val"
        ).coalesce(1),
        tbl,
    )
    # CDC source: 3 files -> 3 microbatches, overlapping keys, seq orders
    src_dir = tmp_path / "cdc"
    src_dir.mkdir()
    batches = [
        [(5, 1, 50), (6, 1, 60), (5, 2, 51)],     # in-batch multi-update
        [(6, 3, 61), (25, 1, 250)],               # update + brand-new key
        [(5, 4, 52), (25, 2, 251)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            rows, "k long, seq long, val long"
        ).coalesce(1).write.parquet(str(src_dir / f"b{i}"))
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    import shutil as _sh

    for i in range(3):
        f = next((src_dir / f"b{i}").glob("part-*.parquet"))
        _sh.copy(f, stream_dir / f"f{i}.parquet")

    schema = spark.read.parquet(str(stream_dir)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    q = write_stream_upsert(
        stream, tbl, "k", str(tmp_path / "ck"), order_col="seq"
    )
    q.processAllAvailable()
    q.stop()

    t = {r.k: (r.seq, r.val) for r in read_manifest_table(spark, tbl).collect()}
    assert t[5] == (4, 52) and t[6] == (3, 61) and t[25] == (2, 251)
    assert t[0] == (0, -1)  # untouched keys intact
    assert len(t) == 21

    # replaying the last batch's MERGE changes nothing (content-idempotent)
    replay = spark.createDataFrame(batches[2], "k long, seq long, val long") \
        .groupBy("k").agg(
            F.expr("max_by(seq, struct(seq, seq))").alias("seq"),
            F.expr("max_by(val, struct(seq, val))").alias("val"),
        )
    upsert_into(spark, tbl, replay, "k")
    t2 = {r.k: (r.seq, r.val) for r in read_manifest_table(spark, tbl).collect()}
    assert t2 == t


def test_manifest_stream_starting_version_latest(spark, tmp_path):
    """startingVersion=latest consumes only commits made after the stream
    starts — existing versions are skipped."""
    from species_range_data_pipeline_spark.sources.manifest_stream import (
        ManifestStreamReader,
    )
    from species_range_data_pipeline_spark.sources.manifest_table import (
        table_schema,
        write_manifest_table,
    )

    tbl = str(tmp_path / "tbl")
    write_manifest_table(spark.range(0, 10).selectExpr("id").coalesce(1), tbl)
    write_manifest_table(spark.range(10, 20).selectExpr("id").coalesce(1), tbl)
    reader = ManifestStreamReader(
        {"path": tbl, "startingVersion": "latest"}, table_schema(tbl)
    )
    start = reader.initialOffset()
    assert start == {"version": 1}  # head at stream start
    write_manifest_table(spark.range(20, 25).selectExpr("id").coalesce(1), tbl)
    end = reader.latestOffset()
    parts = reader.partitions(start, end)
    ids = [t for p in parts for b in reader.read(p) for t in b.to_pydict()["id"]]
    assert sorted(ids) == list(range(20, 25))


def test_stream_upsert_tied_order_is_row_atomic(spark, tmp_path):
    """Two updates to one key with the SAME order value must collapse to
    ONE of the actual rows — never a column-mix of both."""
    from species_range_data_pipeline_spark.sources.manifest_table import (
        read_manifest_table,
        write_manifest_table,
        write_stream_upsert,
    )

    tbl = str(tmp_path / "tbl")
    write_manifest_table(
        spark.createDataFrame(
            [(1, 0, 0, 0)], "k long, seq long, a long, b long"
        ),
        tbl,
    )
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(1, 5, 1, 9), (1, 5, 2, 3)], "k long, seq long, a long, b long"
    ).coalesce(1).write.parquet(str(src / "b0"))
    import shutil as _sh

    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    _sh.copy(next((src / "b0").glob("part-*.parquet")), stream_dir / "f0.parquet")
    schema = spark.read.parquet(str(stream_dir)).schema
    stream = spark.readStream.schema(schema).parquet(str(stream_dir))
    q = write_stream_upsert(stream, tbl, "k", str(tmp_path / "ck"), order_col="seq")
    q.processAllAvailable()
    q.stop()
    r = read_manifest_table(spark, tbl).where("k = 1").first()
    assert (r.a, r.b) in {(1, 9), (2, 3)}, (r.a, r.b)  # a REAL row, not a mix
