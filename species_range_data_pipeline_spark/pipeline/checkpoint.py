"""Stage checkpointing + restartable runs (SURVEY.md §3/§4: the reference's
filesystem staging between stages is its restart mechanism — skip-if-exists
at ``species_range_etl.py:64-69,117-120``; here the same property is an
explicit parquet materialization plus the D1 anti-join).

When to checkpoint (and when not to): lazy lineage is strictly better until
a stage is (a) expensive, (b) feeding >1 downstream consumer, or (c) a
restart boundary you want after failures.  The engine makes the
materialization explicit and cheap to reason about — a checkpoint is just a
parquet directory with the stage's schema, re-read with lineage truncated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.idempotency import pending_work


def checkpoint(df: DataFrame, path: str, mode: str = "overwrite") -> DataFrame:
    """Materialize a stage to parquet and return the re-read DataFrame
    (lineage truncated: downstream failures re-read, not recompute)."""
    df.write.mode(mode).parquet(path)
    return df.sparkSession.read.parquet(path)


def resume_into(
    work: DataFrame,
    sink_path: str,
    keys: list[str],
) -> DataFrame:
    """Restartable write: the subset of ``work`` whose ``keys`` are not yet
    in the sink (left-anti join against the materialized output — the D1
    idempotency operator).  Append the result to the sink to make progress;
    crash anywhere and re-running does only the remainder."""
    spark = work.sparkSession
    try:
        done = spark.read.parquet(sink_path).select(*keys)
    except Exception:
        return work  # empty/missing sink: everything is pending
    return pending_work(work, done, keys)


def run_restartable(
    work: DataFrame, sink_path: str, keys: list[str]
) -> tuple[int, int]:
    """One restartable pass: append all still-pending rows to the sink.
    Returns (n_written, n_already_done) for observability."""
    spark = work.sparkSession
    pending = resume_into(work, sink_path, keys)
    n_pending = pending.count()
    total = work.count()
    if n_pending:
        pending.write.mode("append").parquet(sink_path)
    return n_pending, total - n_pending
