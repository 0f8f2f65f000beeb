"""Spark-4 Python Data Source for the species list (S1/S2,
``species_range_etl.py:31-46``).

The reference's source is a driver-side HTTP GET + pandas parse.  The
engine-native form is a REGISTRABLE data source: after
``register_species_list_source(spark)``,

    spark.read.format("species_list").option("path", tsv).load()

plans a real scan — schema declared up front (no inference pass), the file
split into byte-range ``InputPartition``s so the parse runs ON EXECUTORS in
parallel, exactly how Spark's own text sources scale.  This is the
``pyspark.sql.datasource`` API (Spark 4), the sanctioned way to wrap a
bespoke feed (HTTP endpoint, internal service) as a first-class format
instead of collecting through the driver.

Splitting rule: partition boundaries are byte offsets rounded forward to
the next newline, the same convention as Hadoop text splits — each line
belongs to exactly one partition, whichever one its first byte follows.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .species_list import SPECIES_LIST_SCHEMA

_DEFAULT_PARTITIONS = 4


class _ByteRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SpeciesListDataSource(DataSource):
    """TSV species list as a Python data source (format name
    ``species_list``)."""

    @classmethod
    def name(cls) -> str:
        return "species_list"

    def schema(self):
        return SPECIES_LIST_SCHEMA

    def reader(self, schema) -> "SpeciesListReader":
        return SpeciesListReader(self.options)


class SpeciesListReader(DataSourceReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("species_list source requires .option('path', ...)")
        self._n = int(options.get("numPartitions", _DEFAULT_PARTITIONS))

    def partitions(self):
        import os

        size = os.path.getsize(self._path)
        step = max(1, size // self._n)
        bounds = list(range(0, size, step)) + [size]
        return [_ByteRange(a, b) for a, b in zip(bounds, bounds[1:])]

    def read(self, partition: _ByteRange):
        # Hadoop-style split reading: skip the first (partial) line unless
        # at offset 0; keep reading past `end` to finish the line begun
        # inside the range.
        with open(self._path, "rb") as f:
            f.seek(partition.start)
            if partition.start > 0:
                f.readline()
            while f.tell() <= partition.end:
                raw = f.readline()
                if not raw:
                    break
                line = raw.decode("utf-8").rstrip("\n")
                if not line.strip():
                    continue
                parts = line.split("\t")
                parts = (parts + [None] * 4)[:4]
                yield tuple(parts)


def register_species_list_source(spark: SparkSession) -> None:
    spark.dataSource.register(SpeciesListDataSource)


class _Shard(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WebDatasetDataSource(DataSource):
    """WebDataset tar shards as a registrable format (``webdataset``).

    One ``InputPartition`` per shard, streamed with ``tarfile`` straight
    off storage inside the partition read — unlike the ``binaryFile``
    lane (``webdataset.read_webdataset``), the shard is never
    materialized as a single row, so task memory is bounded by one
    MEMBER, not one 2 GB shard.  Schema matches the mapInPandas lane:
    (shard, key, ext, content).
    """

    @classmethod
    def name(cls) -> str:
        return "webdataset"

    def schema(self):
        from .webdataset import MEMBER_SCHEMA

        return MEMBER_SCHEMA

    def reader(self, schema) -> "WebDatasetReader":
        return WebDatasetReader(self.options)


class WebDatasetReader(DataSourceReader):
    def __init__(self, options):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("webdataset source requires .option('path', ...)")

    def partitions(self):
        import glob as _glob
        import os as _os

        shards = sorted(_glob.glob(_os.path.join(self._dir, "*.tar")))
        if not shards:
            raise FileNotFoundError(f"no *.tar shards under {self._dir}")
        return [_Shard(p) for p in shards]

    def read(self, partition: _Shard):
        import tarfile

        # binaryFile renders paths as Hadoop URIs (file:/...); emit the
        # same form so shard values join across the two lanes
        shard_uri = "file:" + partition.path
        with tarfile.open(partition.path) as tf:
            for member in tf:
                if not member.isfile():
                    continue
                key, _, ext = member.name.rpartition(".")
                data = tf.extractfile(member).read()
                yield (shard_uri, key, ext, data)


def register_webdataset_source(spark: SparkSession) -> None:
    spark.dataSource.register(WebDatasetDataSource)
