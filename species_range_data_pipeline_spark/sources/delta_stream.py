"""Streaming source over a FOREIGN Delta log: version-offset tailing.

``sources/manifest_stream.py`` tails the engine's own table format;
this module is the same Delta-streaming-source shape pointed at an
external ``_delta_log`` (VERDICT r16 next #7), on Spark 4's Python
streaming data source API:

    register_delta_stream_source(spark)
    stream = spark.readStream.format("delta_tail").option("path", tbl).load()

- **Offsets are commit versions.**  ``latestOffset`` is the newest
  JSON-visible version; a microbatch covers the versions in
  ``(start, end]`` and its input partitions are exactly the data files
  those commits ADDED with ``dataChange=true`` — one Spark task per
  file, never a table rescan.  Commit JSONs are immutable, so a batch
  replayed from the checkpoint after a crash re-reads precisely the
  same rows: exactly-once end-to-end with an idempotent sink.
- **Append-only contract, explicitly.**  A version that removed files
  with ``dataChange=true``, or added a file carrying a deletion
  vector (DML rewrites always do one of these), is not representable
  as an insert-only stream: default is a loud failure;
  ``.option("skipChangeCommits", "true")`` ignores those versions —
  Delta's own knob and name.  Compaction commits (``dataChange=false``
  on both sides) contribute nothing and are skipped silently, exactly
  like Delta's source.  Row-level change consumption is the batch
  ``read_delta_changes`` feed's job.
- **Partition columns are restored per file** from the add action's
  ``partitionValues`` (typed at read); files written before a column
  was appended are null-padded to the committed schema, matching the
  batch read path.
- Versions whose JSON was vacuumed away inside the requested range
  raise (a checkpoint is a snapshot, not a step history) — never a
  silent gap.

At scale the planner work per batch is parsing the new commit JSONs on
the driver (log-sized) and the read work is the files each commit
landed — tailing a 100 TB table costs the day's appends, not the table.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from .delta_log import (
    _check_metadata,
    _check_protocol,
    _dv_uid,
    _replay,
    _scan_log_dir,
    _typed_partition_value,
)


def _refuse_column_mapping(configuration: dict | None, path: str) -> None:
    """The batch reader resolves name-mode column mapping (r18); this
    per-file streaming reader does not yet — its partitionValues and
    file columns would silently mis-resolve under physical names, so a
    mapped table refuses loudly here."""
    mode = (configuration or {}).get("delta.columnMapping.mode", "none")
    if mode != "none":
        raise NotImplementedError(
            f"delta_tail cannot stream column-mapped table {path!r}"
            f" (mode {mode!r}); use the batch read_delta_table /"
            " read_delta_changes readers, which resolve the mapping."
        )


class _DeltaFile(InputPartition):
    def __init__(self, path: str, schema_json: str, pvalues: dict):
        self.path = path
        self.schema_json = schema_json
        self.pvalues = pvalues  # partition column -> string-serialized value


class DeltaTailDataSource(DataSource):
    """Foreign Delta log as a streaming source (format ``delta_tail``)."""

    @classmethod
    def name(cls) -> str:
        return "delta_tail"

    def schema(self):
        from pyspark.sql.types import StructType

        path = self.options.get("path")
        if not path:
            raise ValueError("delta_tail requires .option('path', ...)")
        snap = _replay(path)
        _refuse_column_mapping(snap.get("configuration"), path)
        return StructType.fromJson(json.loads(snap["schema_json"]))

    def streamReader(self, schema) -> "DeltaTailStreamReader":
        return DeltaTailStreamReader(self.options, schema)


class DeltaTailStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("delta_tail requires .option('path', ...)")
        self._skip_changes = (
            str(options.get("skipChangeCommits", "false")).lower() == "true"
        )
        starting = options.get("startingVersion")
        if starting is None:
            self._first = 0
        elif str(starting).lower() == "latest":
            # consume only commits made AFTER the stream starts; resolved
            # once at construction (the r10 initialOffset-pin rule) so a
            # checkpointed restart keeps it
            versions, _ = _scan_log_dir(self._path)
            self._first = (versions[-1] + 1) if versions else 0
        else:
            self._first = int(starting)
        self._schema_json = schema.json()
        self._pcols: list[str] | None = None  # lazily resolved

    def initialOffset(self) -> dict:
        # the offset names the last CONSUMED version; the first batch
        # therefore covers versions >= startingVersion
        return {"version": self._first - 1}

    def latestOffset(self) -> dict:
        versions, _ = _scan_log_dir(self._path)
        if not versions:
            raise ValueError(f"no JSON commit at {self._path}")
        return {"version": versions[-1]}

    def _commit_actions(self, v: int) -> list[dict]:
        log_dir = os.path.join(self._path, "_delta_log")
        fp = os.path.join(log_dir, f"{v:020d}.json")
        if not os.path.exists(fp):
            raise ValueError(
                f"version {v} of {self._path} has no JSON commit (vacuumed"
                " past a checkpoint?); restart the stream with a fresh"
                " checkpoint from a readable version"
            )
        actions = []
        with open(fp) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    actions.append(json.loads(line))
        return actions

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["version"]), int(end["version"])
        parts: list[InputPartition] = []
        if self._pcols is None:
            # seed from the snapshot at the batch-START version, not
            # LATEST (ADVICE r17): a stream starting mid-log must
            # reconstruct partitionValues for versions before a later
            # metaData change under the OLD partition-column list (the
            # in-range metaData actions below then advance it in step)
            if lo >= 0:
                seed = _replay(self._path, version=lo)
                _refuse_column_mapping(
                    seed.get("configuration"), self._path
                )
                self._pcols = seed["partition_cols"]
            else:
                self._pcols = []
        for v in range(lo + 1, hi + 1):
            adds, changed = [], False
            for action in self._commit_actions(v):
                if "protocol" in action:
                    _check_protocol(action["protocol"], self._path)
                elif "metaData" in action:
                    _check_metadata(action["metaData"], self._path)
                    _refuse_column_mapping(
                        action["metaData"].get("configuration"), self._path
                    )
                    self._pcols = list(
                        action["metaData"].get("partitionColumns") or []
                    )
                elif "remove" in action:
                    if action["remove"].get("dataChange", True):
                        changed = True
                elif "add" in action:
                    if not action["add"].get("dataChange", True):
                        continue  # compaction: rows were already streamed
                    if _dv_uid(action["add"]) is not None:
                        changed = True  # DV rewrite: not insert-only
                    adds.append(action["add"])
            if changed:
                if not self._skip_changes:
                    raise ValueError(
                        f"version {v} of {self._path} rewrote or removed"
                        " data (DELETE/UPDATE/MERGE/DV): not an append-only"
                        " stream. Set .option('skipChangeCommits', 'true')"
                        " to ignore change commits, or consume row-level"
                        " changes with the batch read_delta_changes feed."
                    )
                continue
            from urllib.parse import unquote

            for add in adds:
                rel = unquote(add["path"])
                parts.append(
                    _DeltaFile(
                        os.path.join(self._path, rel),
                        self._schema_json,
                        {
                            c: (add.get("partitionValues") or {}).get(c)
                            for c in self._pcols
                        },
                    )
                )
        return parts

    def read(self, partition: _DeltaFile) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(json.loads(partition.schema_json))
        types = {f.name: f.dataType for f in schema.fields}
        target = to_arrow_schema(schema)
        table = pq.read_table(partition.path)
        # schema-evolution guard, matching the batch path's footer probe
        # (ADVICE r17): a file holding a column the committed schema
        # lacks is an out-of-spec RENAME/DROP — null-padding the renamed
        # column (the else-branch below) would silently drop its data.
        # Stray in-file copies of partition columns are tolerated: the
        # log is authoritative for their values.
        allowed = {f.name for f in schema.fields}
        unknown = [n for n in table.column_names if n not in allowed]
        if unknown:
            raise NotImplementedError(
                f"data file {partition.path!r} holds column(s)"
                f" {unknown} absent from the committed schema; without"
                " column mapping only ADD COLUMN is legal evolution, so"
                " this is a rename/drop this reader cannot resolve."
            )
        cols = []
        for field in target:
            if field.name in partition.pvalues:
                tv = _typed_partition_value(
                    partition.pvalues[field.name], types[field.name]
                )
                cols.append(
                    pa.array([tv] * table.num_rows).cast(field.type)
                    if tv is not None
                    else pa.nulls(table.num_rows, field.type)
                )
            elif field.name in table.column_names:
                cols.append(table.column(field.name).cast(field.type))
            else:
                # pre-evolution file: pad appended columns with nulls,
                # matching the batch read path
                cols.append(pa.nulls(table.num_rows, field.type))
        yield from pa.Table.from_arrays(cols, schema=target).to_batches()

    def commit(self, end: dict) -> None:
        # offsets live in the query checkpoint; commit JSONs are
        # immutable, so there is no source-side state to release
        pass


def register_delta_stream_source(spark: SparkSession) -> None:
    spark.dataSource.register(DeltaTailDataSource)
