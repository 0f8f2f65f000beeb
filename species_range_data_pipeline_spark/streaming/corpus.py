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


def quality_pass_condition():
    """The ``doc_quality_funnel`` acceptance predicate as one boolean
    Column (shared by the batch capstone and the streaming ingest)."""
    nonspace = F.length(F.regexp_replace("text", r"\s", ""))
    symbols = F.length(F.regexp_replace("text", r"[A-Za-z0-9\s]", ""))
    digits = F.length(F.regexp_replace("text", r"[^0-9]", ""))
    n_tokens = F.size(
        F.split(F.trim(F.regexp_replace("text", r"\s+", " ")), " ")
    ).cast("long")
    mean_tok = nonspace / n_tokens
    return (
        F.col("n_chars").between(100, 20000)
        & (symbols * 10 <= nonspace)
        & (digits * 5 <= nonspace)
        & (mean_tok >= 2.0)
        & (mean_tok <= 14.0)
    )


def normalized_fingerprint():
    return F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))


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
        try:
            done = spark.read.parquet(sink_path).select("fp").distinct()
            fresh = batch.join(done, "fp", "left_anti")
        except Exception:  # first batch: sink does not exist yet
            fresh = batch
        fresh.write.mode("append").parquet(sink_path)

    return (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
