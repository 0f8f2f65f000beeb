"""Writer for the open Delta Lake table LAYOUT — the interop EXPORT
sink (the engine's own manifest_table stays the native write path;
this module exists so results can be handed to an external
Delta-reading stack without conversion, and so the repo's own
``delta_log`` reader has a first-party producer to round-trip
against).

Everything follows the public Delta protocol spec (PROTOCOL.md) /
delta-io reference implementation — no Delta runtime anywhere:

    write_delta_table(df, path, mode="append", partition_by=["c"])
    write_delta_checkpoint(path)

- **Data files are written by Spark itself** (one staging write per
  commit, ``partitionBy`` for partitioned tables — Spark's Hive-style
  layout already matches Delta's: partition columns live in the
  directory names and are ABSENT from the files).  The staged part
  files are then moved under the table root keeping their relative
  partition paths (driver-side metadata renames, never a data copy —
  part names carry the job UUID, so they are unique across commits).
- **Per-file stats are footer-derived** (numRecords / minValues /
  maxValues / nullCount from the parquet row-group statistics, a
  metadata-sized driver read per file) and serialized into
  ``add.stats``, so written tables zone-map-prune in this repo's
  reader and in any stats-aware external reader.  Types whose JSON
  rendering is ambiguous (timestamps, decimals, binaries, nested)
  contribute nullCount only — never a wrong bound, just less skipping.
- **Commits are optimistic**: the next version file is claimed with an
  atomic O_EXCL create; a concurrent writer's win surfaces as
  FileExistsError and the commit retries against the re-replayed state
  (appends re-commit as-is; overwrites recompute their remove set) up
  to a bounded attempt count — the protocol's optimistic-concurrency
  loop without a lock service.
- **Modes**: ``append`` (schema and partitioning must match the
  table's — loud refusal, no silent evolution), ``overwrite``
  (tombstones every live file, may change schema/partitioning),
  ``error`` (refuse if the table exists).
- **Checkpoints**: ``write_delta_checkpoint`` renders the replayed
  snapshot as a CLASSIC single-file ``N.checkpoint.parquet`` (protocol
  + metaData + one add row per live file, stats and deletion vectors
  carried through) plus ``_last_checkpoint`` — after which the earlier
  JSON commits may be cleaned up and the table still replays, in this
  reader and any spec reader.

Scale shape: the data write is a plain distributed Spark parquet write
(Catalyst/Tungsten path, no Python in the row loop); driver work is
per-FILE (stats probe + rename), i.e. metadata-sized; the log append
is O(1) per commit and the checkpoint is log-sized.  A 100 TB result
writes in parallel exactly like ``df.write.parquet``; the export adds
a footer sweep and a rename pass over the produced file list.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from urllib.parse import quote, unquote

from pyspark.sql import DataFrame

from .delta_log import _replay, _scan_log_dir

#: bounded optimistic-concurrency retry (each loses only to a racing
#: writer that claimed the same version file first)
_COMMIT_ATTEMPTS = 10

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

#: stats min/max are emitted only for types whose JSON rendering is
#: unambiguous for every reader; everything else gets nullCount only
_STATS_TYPES = ("string", "boolean", "date",
                "tinyint", "smallint", "int", "bigint",
                "float", "double")


def _json_stat_value(v):
    """Parquet row-group statistic -> JSON-safe stats value."""
    import datetime as _dt

    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, (bool, int, float, str)):
        return v
    return None


def _file_stats(fpath: str, data_fields) -> str | None:
    """``add.stats`` JSON for one written data file, from the parquet
    footer alone (no data read).  ``data_fields`` are the in-file
    (non-partition) StructFields."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(fpath)
    eligible = {
        f.name for f in data_fields
        if f.dataType.simpleString() in _STATS_TYPES
    }
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    complete: set = set()
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        for c in range(rg.num_columns):
            col = rg.column(c)
            name = col.path_in_schema
            if "." in name:  # nested leaf: no top-level stats
                continue
            st = col.statistics
            if st is None or not st.has_null_count:
                nulls.pop(name, None)
                complete.discard(name)
                continue
            nulls[name] = nulls.get(name, 0) + st.null_count
            if name not in eligible or not st.has_min_max:
                complete.discard(name)
                continue
            lo = _json_stat_value(st.min)
            hi = _json_stat_value(st.max)
            if lo is None or hi is None:
                complete.discard(name)
                continue
            if name in mins:
                mins[name] = min(mins[name], lo)
                maxs[name] = max(maxs[name], hi)
            else:
                mins[name] = lo
                maxs[name] = hi
                if g == 0:
                    complete.add(name)
    stats = {
        "numRecords": md.num_rows,
        "minValues": {n: mins[n] for n in sorted(complete)},
        "maxValues": {n: maxs[n] for n in sorted(complete)},
        "nullCount": dict(sorted(nulls.items())),
    }
    return json.dumps(stats)


def _partition_values_of(rel: str, pcols: list[str]) -> dict:
    """Partition values from the file's Hive-style directory path, as
    the log's string-serialized map (JSON null for NULL)."""
    values: dict = {}
    for comp in rel.split(os.sep)[:-1]:
        if "=" not in comp:
            raise ValueError(
                f"staged file path {rel!r} has a non-partition"
                f" directory component {comp!r}"
            )
        k, _, v = comp.partition("=")
        values[unquote(k)] = None if v == _HIVE_NULL else unquote(v)
    missing = [c for c in pcols if c not in values]
    if missing:
        raise ValueError(
            f"staged file {rel!r} lacks partition value(s) {missing}"
        )
    return {c: values[c] for c in pcols}


def _stage_data_files(
    df: DataFrame, path: str, partition_by: list[str]
) -> list[str]:
    """Distributed-write ``df``'s data under ``path`` and return the
    new files' table-relative paths (partition dirs included)."""
    staging = os.path.join(path, f"_staging-{uuid.uuid4().hex[:12]}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    import pyarrow.parquet as pq

    rels: list[str] = []
    try:
        for dirpath, _dirs, names in os.walk(staging):
            for name in names:
                if not (
                    name.startswith("part-") and name.endswith(".parquet")
                ):
                    continue
                src = os.path.join(dirpath, name)
                if pq.read_metadata(src).num_rows == 0:
                    continue  # an empty task's file carries no data
                # table-wide-unique basename: Spark reuses a task's
                # part-NNNNN-jobuuid name across the partition dirs it
                # writes, and the reader keys its partition-value
                # restore join by basename
                unique = f"part-{uuid.uuid4().hex}.parquet"
                rel = os.path.join(
                    os.path.dirname(os.path.relpath(src, staging)),
                    unique,
                )
                dst = os.path.join(path, rel)
                if os.path.exists(dst):
                    raise FileExistsError(
                        f"data file collision at {dst!r}; refusing to"
                        " overwrite an existing table file"
                    )
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.replace(src, dst)
                rels.append(rel)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return sorted(rels)


def _schema_key(schema_json: str):
    """Schema identity for the append compatibility check: field names
    and types, metadata ignored."""
    fields = json.loads(schema_json)["fields"]
    return tuple((f["name"], json.dumps(f["type"], sort_keys=True))
                 for f in fields)


def _try_write_commit(path: str, version: int, actions: list[dict]) -> None:
    """Atomically claim and write version's commit JSON (O_EXCL —
    a racing writer's win raises FileExistsError to the retry loop)."""
    log_dir = os.path.join(path, "_delta_log")
    os.makedirs(log_dir, exist_ok=True)
    fp = os.path.join(log_dir, f"{version:020d}.json")
    fd = os.open(fp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    try:
        with os.fdopen(fd, "w") as fh:
            for a in actions:
                fh.write(json.dumps(a) + "\n")
            fh.flush()
            os.fsync(fh.fileno())
    except BaseException:
        os.unlink(fp)
        raise


def _table_state(path: str):
    """(next version, replayed snapshot or None) for the table dir."""
    if not os.path.isdir(os.path.join(path, "_delta_log")):
        return 0, None
    versions, checkpoints = _scan_log_dir(path)
    if not versions and not checkpoints:
        return 0, None
    latest = max([*versions, *checkpoints.keys()])
    return latest + 1, _replay(path)


def _merged_schema_json(table_schema_json: str, df, path: str) -> str:
    """Schema-evolution merge for an append (the ``mergeSchema``
    contract): the table's fields keep their order and types; NEW
    DataFrame columns append as nullable fields (old files null-pad —
    the reader's legal-ADD rule); a column the DataFrame omits stays
    in the schema (its new files null-pad on read); a TYPE change
    refuses."""
    table = json.loads(table_schema_json)
    by_name = {f["name"]: f for f in table["fields"]}
    df_fields = json.loads(df.schema.json())["fields"]
    for f in df_fields:
        old = by_name.get(f["name"])
        if old is not None and json.dumps(
            old["type"], sort_keys=True
        ) != json.dumps(f["type"], sort_keys=True):
            raise ValueError(
                f"append type change for column {f['name']!r} at"
                f" {path!r}: table {old['type']} vs DataFrame"
                f" {f['type']}; schema evolution adds columns, never"
                " retypes them — overwrite to change types."
            )
    merged = list(table["fields"]) + [
        {**f, "nullable": True}
        for f in df_fields
        if f["name"] not in by_name
    ]
    return json.dumps({"type": "struct", "fields": merged})


def write_delta_table(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    merge_schema: bool = False,
) -> int:
    """Write ``df`` as a commit to the Delta-layout table at ``path``
    and return the committed version.  See the module docstring for
    modes, staging, stats, and the concurrency contract.
    ``merge_schema=True`` lets an append ADD nullable columns (and
    omit existing ones) — the mergeSchema contract; type changes
    still refuse."""
    if mode not in ("append", "overwrite", "error"):
        raise ValueError(f"unsupported mode {mode!r}")
    pcols = list(partition_by or [])
    missing = [c for c in pcols if c not in df.columns]
    if missing:
        raise ValueError(f"partition column(s) {missing} not in DataFrame")

    evolved_schema_json: str | None = None
    next_version, snap = _table_state(path)
    if snap is not None:
        if mode == "error":
            raise FileExistsError(
                f"Delta table at {path!r} already exists (mode='error')"
            )
        if mode == "append":
            if _schema_key(snap["schema_json"]) != _schema_key(
                df.schema.json()
            ):
                if not merge_schema:
                    raise ValueError(
                        f"append schema mismatch at {path!r}: table"
                        f" {snap['schema_json']} vs DataFrame"
                        f" {df.schema.json()}; pass merge_schema=True"
                        " to add columns, or overwrite to change"
                        " schema."
                    )
                merged = _merged_schema_json(
                    snap["schema_json"], df, path
                )
                if _schema_key(merged) != _schema_key(
                    snap["schema_json"]
                ):
                    evolved_schema_json = merged
            if list(snap["partition_cols"]) != pcols:
                raise ValueError(
                    f"append partitioning mismatch at {path!r}: table"
                    f" {snap['partition_cols']} vs requested {pcols}."
                )

    # Hive staging conflates empty-string and the literal
    # default-partition sentinel with NULL in the directory name, and
    # Delta data files do NOT carry the partition column to recover
    # the truth from — refuse those values loudly (one column-pruned
    # validation pass over the payload's string partition columns)
    # rather than silently writing them back as NULL.
    str_pcols = [
        f.name
        for f in df.schema.fields
        if f.name in pcols and f.dataType.simpleString() == "string"
    ]
    if str_pcols:
        from pyspark.sql import functions as F

        cond = None
        for c in str_pcols:
            piece = (F.col(c) == "") | (F.col(c) == _HIVE_NULL)
            cond = piece if cond is None else (cond | piece)
        if df.where(cond).take(1):
            raise ValueError(
                f"partition column(s) {str_pcols} contain an empty"
                f" string or the literal {_HIVE_NULL!r} — the Hive"
                " directory layout conflates these with NULL and Delta"
                " data files cannot recover the value; filter or remap"
                " them before writing."
            )

    os.makedirs(path, exist_ok=True)
    rels = _stage_data_files(df, path, pcols)
    data_fields = [f for f in df.schema.fields if f.name not in pcols]
    now_ms = int(time.time() * 1000)
    adds = []
    for rel in rels:
        fpath = os.path.join(path, rel)
        adds.append(
            {
                "add": {
                    # the spec stores URL-encoded table-relative paths
                    "path": quote(rel.replace(os.sep, "/"), safe="/="),
                    "partitionValues": _partition_values_of(rel, pcols),
                    "size": os.path.getsize(fpath),
                    "modificationTime": now_ms,
                    "dataChange": True,
                    "stats": _file_stats(fpath, data_fields),
                }
            }
        )

    meta_action = {
        "metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": df.schema.json(),
            "partitionColumns": pcols,
            "configuration": {},
            "createdTime": now_ms,
        }
    }
    commit_info = {
        "commitInfo": {
            "timestamp": now_ms,
            "operation": "WRITE",
            "operationParameters": {"mode": mode.upper()},
        }
    }

    last_err: Exception | None = None
    for _ in range(_COMMIT_ATTEMPTS):
        version, snap = _table_state(path)
        if snap is None:
            actions = [
                commit_info,
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
                meta_action,
                *adds,
            ]
        elif mode == "overwrite":
            # the replay keys file actions by (path, DV uid): a remove
            # of a DV'd file must carry the same descriptor, else the
            # pair stays live and its rows resurrect
            removes = []
            for rel in sorted(snap["live"]):
                rm = {
                    "path": quote(rel, safe="/="),
                    "deletionTimestamp": now_ms,
                    "dataChange": True,
                }
                dv = snap["live"][rel].get("deletionVector")
                if dv and dv.get("storageType"):
                    rm["deletionVector"] = dv
                removes.append({"remove": rm})
            actions = [commit_info, meta_action, *removes, *adds]
        else:
            actions = [commit_info, *adds]
            if evolved_schema_json is not None:
                # the evolved schema rides the SAME commit as its data
                evo_meta = {
                    "metaData": {
                        **meta_action["metaData"],
                        "schemaString": evolved_schema_json,
                    }
                }
                actions = [commit_info, evo_meta, *adds]
        try:
            _try_write_commit(path, version, actions)
            return version
        except FileExistsError as e:  # a racing writer won this version
            last_err = e
    raise RuntimeError(
        f"could not commit to {path!r} after {_COMMIT_ATTEMPTS}"
        f" optimistic attempts (concurrent writers?): {last_err}"
    )


def _latest_protocol(path: str) -> dict:
    """The newest protocol action visible in the JSON tail (falling
    back to the layout minimum for logs whose protocol lives only in a
    checkpoint this writer did not produce)."""
    versions, _ = _scan_log_dir(path)
    proto = None
    for v in versions:
        fp = os.path.join(path, "_delta_log", f"{v:020d}.json")
        with open(fp) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "protocol" in action:
                    proto = action["protocol"]
    return proto or {"minReaderVersion": 1, "minWriterVersion": 2}


def _json_tail_tombstones(path: str, live: dict) -> list[dict]:
    """Unexpired remove tombstones for the checkpoint: the newest
    remove action per path in the readable JSON tail whose path is not
    currently live (a spec reader keeps these for VACUUM bookkeeping;
    batch reads ignore them).  Tombstones already inside an earlier
    checkpoint are out of reach of this writer and age out naturally."""
    versions, _ = _scan_log_dir(path)
    removed: dict[str, dict] = {}
    for v in versions:
        fp = os.path.join(path, "_delta_log", f"{v:020d}.json")
        with open(fp) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "remove" in action:
                    removed[unquote(action["remove"]["path"])] = action[
                        "remove"
                    ]
                elif "add" in action:
                    removed.pop(unquote(action["add"]["path"]), None)
    return [rm for rel, rm in sorted(removed.items()) if rel not in live]


def write_delta_checkpoint(path: str) -> int:
    """Render the latest snapshot as a CLASSIC single-file parquet
    checkpoint (``N.checkpoint.parquet`` + ``_last_checkpoint``) and
    return its version.  After this, JSON commits at or below N may be
    cleaned up and the table still replays from the checkpoint.
    Remove tombstones from the JSON tail ride along for spec readers'
    VACUUM bookkeeping (this repo's batch reads ignore them)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    versions, checkpoints = _scan_log_dir(path)
    if not versions and not checkpoints:
        raise FileNotFoundError(f"no commits to checkpoint at {path!r}")
    version = max([*versions, *checkpoints.keys()])
    snap = _replay(path)
    proto = _latest_protocol(path)
    tombstones = _json_tail_tombstones(path, snap["live"])

    dv_type = pa.struct(
        [
            ("storageType", pa.string()),
            ("pathOrInlineDv", pa.string()),
            ("offset", pa.int32()),
            ("sizeInBytes", pa.int32()),
            ("cardinality", pa.int64()),
        ]
    )
    schema = pa.schema(
        [
            (
                "protocol",
                pa.struct(
                    [
                        ("minReaderVersion", pa.int32()),
                        ("minWriterVersion", pa.int32()),
                    ]
                ),
            ),
            (
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        ("format", pa.struct([("provider", pa.string())])),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                        (
                            "configuration",
                            pa.map_(pa.string(), pa.string()),
                        ),
                    ]
                ),
            ),
            (
                "add",
                pa.struct(
                    [
                        ("path", pa.string()),
                        (
                            "partitionValues",
                            pa.map_(
                                pa.string(),
                                pa.field("value", pa.string(),
                                         nullable=True),
                            ),
                        ),
                        ("size", pa.int64()),
                        ("modificationTime", pa.int64()),
                        ("dataChange", pa.bool_()),
                        ("stats", pa.string()),
                        ("deletionVector", dv_type),
                    ]
                ),
            ),
            (
                "remove",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("deletionTimestamp", pa.int64()),
                        ("dataChange", pa.bool_()),
                    ]
                ),
            ),
        ]
    )
    rows: list[dict] = [
        {"protocol": proto, "metaData": None, "add": None},
        {
            "protocol": None,
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet"},
                "schemaString": snap["schema_json"],
                "partitionColumns": snap["partition_cols"],
                "configuration": list(
                    (snap.get("configuration") or {}).items()
                ),
            },
            "add": None,
        },
    ]
    for rel in sorted(snap["live"]):
        add = snap["live"][rel]
        dv = add.get("deletionVector")
        rows.append(
            {
                "protocol": None,
                "metaData": None,
                "add": {
                    "path": add["path"],
                    "partitionValues": list(
                        (add.get("partitionValues") or {}).items()
                    ),
                    "size": add.get("size"),
                    "modificationTime": add.get("modificationTime"),
                    "dataChange": False,
                    "stats": add.get("stats"),
                    "deletionVector": (
                        dv if dv and dv.get("storageType") else None
                    ),
                },
            }
        )
    for rm in tombstones:
        rows.append(
            {
                "protocol": None,
                "metaData": None,
                "add": None,
                "remove": {
                    "path": rm.get("path"),
                    "deletionTimestamp": rm.get("deletionTimestamp"),
                    "dataChange": bool(rm.get("dataChange", True)),
                },
            }
        )
    ckpt = os.path.join(
        path, "_delta_log", f"{version:020d}.checkpoint.parquet"
    )
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), ckpt)
    with open(
        os.path.join(path, "_delta_log", "_last_checkpoint"), "w"
    ) as fh:
        json.dump({"version": version, "size": len(rows)}, fh)
    return version
