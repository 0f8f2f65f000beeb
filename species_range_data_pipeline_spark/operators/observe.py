"""Observed-metrics sink: data-quality counters computed INSIDE the write
pass.

The reference's load stage (`species_range_etl.py:271-276` ->
`_load_species_data` :213-236) writes blind — no row counts, no validation,
and worker errors vanish (O1: executor.map results never iterated).  The
100 TB-scale fix is not a second validation scan (that doubles the IO bill)
but Spark's ``Observation`` API: arbitrary aggregate expressions are
accumulator-merged on the executors DURING the sink job, so the metrics
cost nothing beyond the write itself and arrive on the driver with the
job's completion.

This is the batch face of streaming's per-microbatch progress metrics; the
same ``df.observe`` call works under ``writeStream`` via
``QueryProgressEvent.observedMetrics``.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def observed_write(
    df: DataFrame,
    path: str,
    metrics: Mapping[str, Column] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> dict[str, Any]:
    """Write ``df`` to ``path`` and return metrics observed during the pass.

    ``metrics`` maps output-metric name -> aggregate Column (count/sum/min/
    max/count_if...; anything accumulator-mergeable — no distinct, no
    percentile).  Default: row count only.  The plan stays a single scan:
    ``CollectMetrics`` is a zero-shuffle streaming aggregate pinned above
    the scan, below the sink.
    """
    if not metrics:
        metrics = {"n_rows": F.count(F.lit(1))}
    from pyspark.sql import Observation

    obs = Observation("sink_metrics")
    named = [col.alias(name) for name, col in metrics.items()]
    df.observe(obs, *named).write.format(fmt).mode(mode).save(path)
    return dict(obs.get)


class StreamMetricsCollector:
    """Per-microbatch observed metrics for a STREAMING query.

    ``attach`` wires the same ``df.observe`` call into a stream; the
    collector (a ``StreamingQueryListener``) harvests every batch's
    ``observedMetrics`` from the progress event — the monitoring face of
    ``observed_write``: row counts / violation counters / bounds arrive
    with each microbatch at zero extra scans, which is how a 24/7 ingest
    pipeline watches itself without a second read of the stream.

    Usage::

        coll = StreamMetricsCollector(spark, "ingest_metrics")
        stream = coll.attach(stream_df, {"n": F.count(F.lit(1)),
                                         "v": F.sum("value")})
        q = stream.writeStream...start(); q.processAllAvailable()
        coll.totals()   # accumulated across batches
        coll.batches    # the per-batch series
    """

    def __init__(self, spark, name: str):
        from pyspark.sql.streaming import StreamingQueryListener

        self.name = name
        self.batches: list[dict] = []
        outer = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                m = event.progress.observedMetrics.get(outer.name)
                if m is not None:
                    outer.batches.append(m.asDict())

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        self._listener = _L()
        self._spark = spark
        spark.streams.addListener(self._listener)

    def attach(self, stream_df: DataFrame, metrics: Mapping[str, Column]) -> DataFrame:
        named = [col.alias(name) for name, col in metrics.items()]
        return stream_df.observe(self.name, *named)

    def totals(self) -> dict[str, Any]:
        """Numeric metrics summed across every batch seen so far."""
        acc: dict[str, Any] = {}
        for b in self.batches:
            for k, v in b.items():
                if isinstance(v, (int, float)) and v is not None:
                    acc[k] = acc.get(k, 0) + v
        return acc

    def close(self) -> None:
        self._spark.streams.removeListener(self._listener)
