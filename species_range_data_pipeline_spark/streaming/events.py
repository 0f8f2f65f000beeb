"""Streaming event pipelines: file-source streams with watermarked windowed
aggregation, sessionization, and streaming dedup.

The batch twins of these plans live in plans/events.py and are DuckDB
oracle-checked; the streaming forms are validated in tests by running a
bounded stream to completion and comparing against the batch result — the
strongest check available for plans with no SQL oracle.

Scale notes: a file-source stream with ``maxFilesPerTrigger`` is the local
stand-in for Kafka partitions; the state store (watermark + window state)
is partitioned by group key, so the same plan runs on a real cluster with
checkpointing to object storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_event_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 1,
    schema=None,
) -> DataFrame:
    """File-source stream of event parquet with the engine's events schema.

    The stream schema is sniffed from the files already present (footer
    read only), so the source adapts to how the fixture stores ``ts`` the
    same way ``catalog.load_table`` does — both route through
    ``catalog.normalize_event_ts``, the single copy of the adaptation
    rule (the fixture's physical type changed between rounds 3 and 4;
    hardcoding a shape breaks on the next change).  Pass ``schema`` to
    start the stream on an EMPTY landing directory (the standard
    watch-a-directory production pattern), where the sniff would raise
    'Unable to infer schema'.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # conf locked -> the read below surfaces the real error
    if schema is None:
        schema = spark.read.parquet(path).schema
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    from ..catalog import normalize_event_ts

    return normalize_event_ts(df)


def windowed_counts(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1h windows with late-data handling via watermark."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Sliding windows (1h wide, 30min slide): each event lands in 2 windows;
    watermark bounds how long a window stays open for late data."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


def sessionized(stream: DataFrame, gap: str = "15 minutes") -> DataFrame:
    """Streaming session windows (dynamic gap-merging state)."""
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def stream_dedup(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id over ALL history — the streaming
    form of the pipeline's idempotency operator (D1).

    State-growth caveat (r9): ``dropDuplicates`` without the event-time
    column in the key never evicts state — the watermark here only drops
    late INPUT rows, it does not bound the dedup state store.  That is
    the right semantics when event_ids must be globally unique forever,
    but for long-running queries with an at-least-once source use
    ``stream_dedup_within_watermark`` (bounded state) instead."""
    return stream.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def stream_dedup_within_watermark(
    stream: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming dedup with BOUNDED state: ``dropDuplicatesWithinWatermark``.

    Unlike ``dropDuplicates`` (state grows forever unless the event-time
    column is part of the key), this evicts each key after the watermark
    passes its first-seen event time — duplicates are only suppressed within
    the lateness horizon, which is exactly the at-least-once-source contract
    (a replayed record arrives within the delay bound, not days later).
    At cluster scale this is the difference between a state store that
    reaches steady size and one that grows with total history."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def view_click_interval_join(stream: DataFrame, window: str = "30 minutes") -> DataFrame:
    """Stream-stream interval join: each view matched with that user's
    clicks in the next ``window``.

    Both sides carry a watermark, and the join condition bounds event time
    on BOTH sides — the two requirements that let the state store evict
    matched/expired rows instead of buffering streams forever.  The state is
    partitioned by user_id (the equi key), so it shards like any shuffle."""
    views = stream.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", "1 hour")
    clicks = stream.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("click_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", "1 hour")
    return views.join(
        clicks,
        F.expr(
            f"user_id = click_user AND "
            f"click_ts >= view_ts AND click_ts <= view_ts + interval {window}"
        ),
    ).select("user_id", "view_id", "click_id", "view_ts", "click_ts")


def enrich_with_dimension(stream: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream with a batch dimension.

    The static side is re-planned per microbatch (picking up dimension
    updates between batches) and needs NO watermark — only stream-stream
    joins buffer state.  On a cluster the dimension should be broadcast
    (it is here: Catalyst picks BroadcastHashJoin for the small side), so
    the stream stage never shuffles.  This is the streaming form of the
    pipeline's literal-attribute enrichment (P3) and the K1 sink's
    dimension lookup.
    """
    return stream.join(F.broadcast(dim), "user_id", "left").select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
        F.coalesce("segment", F.lit("unknown")).alias("segment"),
    )


def ohlc_bars_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming OHLC candlesticks — the watermarked twin of
    ``plans.events.ev_ohlc_bars``.  min_by/max_by are algebraic, so the
    state per open window is one fixed-width row (no buffered events), and
    the watermark closes bars exactly like the batch hour boundary."""
    # decimal key: ms*2^32 overflows BIGINT, and a BIGINT ms*2^20 key
    # collides once event_id >= 2^20 (wrong open/close); DECIMAL(38,0)
    # holds ms*2^32+id exactly for any realistic id space (r9 review)
    key = (
        F.unix_millis(F.col("ts").cast("timestamp")).cast("decimal(38,0)")
        * F.lit(4294967296)
        + F.col("event_id")
    ).alias("k")
    # watermark BEFORE deriving the window column: a watermark applied
    # after the select does not attach to the already-resolved window
    # attribute, so append mode rejects the plan and update mode never
    # evicts bar state (r9 review; complete mode masked it)
    t = stream.withWatermark("ts", watermark).select(
        "ts", F.window("ts", "1 hour").alias("w"), "event_type", "value", key
    )
    return (
        t.groupBy("w", "event_type")
        .agg(
            F.round(F.min_by("value", F.col("k")), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max_by("value", F.col("k")), 2).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n",
        )
    )


def stateful_user_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    event count + value total maintained across microbatches.

    This is the engine's escape hatch for stateful semantics Spark's
    built-in windows can't express (per-key accumulators, custom eviction,
    counters that survive the trigger).  State is a single fixed-width row
    per user in the state store, partitioned by the group key — at cluster
    scale it shards with the shuffle and checkpoints incrementally.  Each
    trigger emits one updated row per user seen in that batch (Update mode);
    the latest row per user is the current running total.
    """
    import pandas as pd
    import pyspark.sql.types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    def fn(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "Update", GroupStateTimeout.NoTimeout
    )


def stateful_user_totals_tws(stream: DataFrame) -> DataFrame:
    """Spark-4 transformWithStateInPandas twin of ``stateful_user_totals``.

    The new arbitrary-state API: a ``StatefulProcessor`` with typed state
    handles (ValueState here; ListState/MapState and event/processing-time
    timers are the same surface) instead of the single GroupState blob.
    Requires the RocksDB state-store provider (bundled ``rocksdbjni``) —
    callers set ``spark.sql.streaming.stateStore.providerClass`` before
    starting the query; incremental checkpointing then scales state past
    executor memory, which the HDFS-backed default cannot.

    Environment gate: the TWS state-server protocol needs the ``protobuf``
    wheel (``pyspark.sql.streaming.proto``); where it is absent the query
    fails at start with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE and
    the test skips — ``stateful_user_totals`` (applyInPandasWithState) is
    the dependency-free twin."""
    import pandas as pd
    import pyspark.sql.types as T
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    class UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._totals.get() if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def write_stream_idempotent(
    query_df: DataFrame, sink_path: str, keys: list[str], checkpoint_dir: str
):
    """foreachBatch sink with idempotent appends: each microbatch anti-joins
    the sink's existing keys before appending, so replayed batches (restart
    after a crash between write and commit) insert nothing twice.

    This is the streaming face of the D1 idempotency operator — together
    with the streaming checkpoint it gives effectively-once parquet output
    without a transactional table format."""
    from ..operators.idempotency import materialized_keys, pending_work

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # narrow missing-sink handling only (materialized_keys catches
        # AnalysisException for an absent path): a TRANSIENT sink-read
        # failure must fail the batch so the checkpoint retries it —
        # swallowing it here would append the whole batch unfiltered and
        # silently break the effectively-once contract (r9 review).
        done = materialized_keys(spark, sink_path, keys)
        # dedup WITHIN the batch too: at-least-once sources can deliver a
        # record and its replay inside one trigger, where the sink
        # anti-join alone cannot see the duplicate
        fresh = pending_work(batch_df.dropDuplicates(keys), done, keys)
        fresh.write.mode("append").parquet(sink_path)

    return (
        query_df.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def mv_partial_refresh_batch(batch_df: DataFrame, batch_id: int, state_dir: str) -> None:
    """One microbatch's MV maintenance: aggregate the batch to MERGEABLE
    partials (count, exact integer value units, max) and land them as the
    ``batch_id=N`` partition with dynamic partition overwrite — replaying
    a batch after a crash overwrites its own partition instead of
    double-counting, which is what makes foreachBatch + at-least-once
    delivery add up to an exactly-once MV."""
    partials = batch_df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 10000).cast("long")).alias("v_units"),
        F.max("value").alias("max_value"),
    ).withColumn("batch_id", F.lit(int(batch_id)))
    (
        partials.coalesce(1)
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(state_dir)
    )


def stream_mv_refresh(stream: DataFrame, state_dir: str, checkpoint_dir: str):
    """Streaming materialized view: the streaming twin of
    ``mv_incremental_refresh`` (plans/stats.py).  Each trigger appends one
    batch's algebraic partials; ``read_stream_mv`` is the merge.  State
    grows one tiny row-group per (batch, group) — `compact_files` is the
    maintenance op when batch count gets large."""
    return (
        stream.writeStream.foreachBatch(
            lambda df, bid: mv_partial_refresh_batch(df, bid, state_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def read_stream_mv(spark: SparkSession, state_dir: str) -> DataFrame:
    """Merge the streaming MV's partials: sum-of-sums / sum-of-counts /
    max-of-maxes — exact because every partial is algebraic and the value
    sum is integer ten-thousandths."""
    return (
        spark.read.parquet(state_dir)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("v_units") / 10000.0, 2).alias("total_value"),
            F.max("max_value").alias("max_value"),
        )
        .orderBy("event_type")
    )


def run_stream_to_memory(
    query_df: DataFrame, name: str, output_mode: str = "append"
) -> "object":
    """Start a memory-sink query (tests drain it with processAllAvailable)."""
    return (
        query_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
