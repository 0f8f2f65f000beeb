"""Continuous corpus ingestion: the streaming face of the training-data
pipeline (quality filter -> normalized dedup -> idempotent append).

Batch cleaning (``plans/packing.corpus_pipeline_summary``) assumes the
corpus sits still; a production pipeline ingests forever.  This lane
runs the same semantics per microbatch over a document file stream:

1. quality gate — the ``doc_quality_funnel`` pass condition, scan-stage
   JVM math;
2. in-batch dedup — first doc per normalized fingerprint (one window);
3. cross-batch dedup — left-anti join against the sink's already-
   ingested fingerprints, so a document seen in ANY earlier batch (or a
   replayed batch after crash-restart) inserts nothing twice.

State discipline at scale: nothing accumulates in the streaming state
store — cross-batch memory is the sink itself (fingerprint column), so
restart safety comes from the checkpoint + anti-join, and the sink scan
prunes to the fingerprint column only.  With a manifest/Delta-style
sink the anti-join becomes a merge; with plain parquet (here) it is the
same effectively-once contract as ``write_stream_idempotent``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# single source of truth for the acceptance predicate and fingerprint:
# plans/quality.py defines them; batch capstone and streaming ingest share
from ..plans.quality import normalized_fingerprint, quality_pass_condition

__all__ = [
    "quality_pass_condition",
    "normalized_fingerprint",
    "read_document_stream",
    "ingest_corpus_stream",
]


def read_document_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream of document parquet (schema sniffed from the
    files present, same adaptive contract as ``read_event_stream``)."""
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def ingest_corpus_stream(
    stream: DataFrame, sink_path: str, checkpoint_dir: str
):
    """Start the ingestion query: filtered, deduped, effectively-once
    appends of (doc columns + fp) to ``sink_path``."""
    from pyspark.sql import Window

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        passed = batch_df.where(quality_pass_condition()).withColumn(
            "fp", normalized_fingerprint()
        )
        w = Window.partitionBy("fp").orderBy("doc_id")
        batch = (
            passed.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn")
        )
        from pyspark.errors import AnalysisException

        try:
            done = spark.read.parquet(sink_path).select("fp").distinct()
            fresh = batch.join(done, "fp", "left_anti")
        except AnalysisException as exc:
            # ONLY a missing sink means "first batch".  Any other read
            # failure (storage hiccup, corrupt footer) must fail the
            # batch so the checkpoint replays it — treating it as
            # first-batch would silently disable cross-batch dedup and
            # re-append every fingerprint.
            if "PATH_NOT_FOUND" not in str(exc) and "Path does not exist" not in str(exc):
                raise
            fresh = batch
        fresh.write.mode("append").parquet(sink_path)

    return (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
