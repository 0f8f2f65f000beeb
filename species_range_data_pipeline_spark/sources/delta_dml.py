"""Copy-on-write DML for the Delta table LAYOUT — DELETE and UPDATE
over tables the engine (or any spec writer) produced, composing the
reader (`delta_log`) and the writer (`delta_write`):

    delta_delete_where(spark, path, [("k", ">", 100)])
    delta_update_where(spark, path, [("part", "=", "a")],
                       {"v": F.col("v") * 2})

Both follow the two-phase copy-on-write shape the reference Delta
implementation uses:

1. **Find** the files that actually hold matching rows: zone-map +
   partition pruning narrows to candidates without opening anything
   (``delta_scan_files`` — partition-column terms are EXACT at file
   granularity, so candidates satisfy them wholesale), then ONE
   column-pruned scan of the candidates collects the distinct
   ``_metadata.file_path`` values where the remaining data-column
   terms hold — files a conservative zone map admitted but that hold
   no matching row are left untouched (no write amplification from
   pruning slack).  A predicate with NO data-column terms needs no
   scan at all: every candidate file matches wholesale, so a DELETE
   drops the files without rewriting a byte.
2. **Rewrite** only the touched files: their survivors (DELETE) or
   their rows with assignments applied to the matches (UPDATE) are
   staged through the writer's distributed machinery under the same
   partitioning, and ONE commit tombstones the touched files and adds
   the replacements — atomic per the protocol, concurrent readers
   keep seeing the old snapshot until the commit lands.

Deletion vectors on touched files are absorbed: the rewrite reads
through the DV mask, so the replacement file simply has no DV.
Boundaries, loud: column-mapped tables are refused (the rewrite would
write logical column names into a physical-name layout), UPDATE of a
partition column is refused (it moves rows across files — use an
overwrite), and an empty filter list is refused (a full-table DELETE
is an overwrite with nothing, say so explicitly).

Scale shape: phase 1 is a metadata prune plus one column-pruned scan
of candidate files only; phase 2 rewrites exactly the touched files
(the classic copy-on-write amplification — a single-row delete in a
1 GB file rewrites that file; that is this layout's contract, and
merge-on-read is the Iceberg module's job).  The commit is O(1).
"""

from __future__ import annotations

import json
import os
import time
from typing import Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .delta_log import (
    _column_mapping,
    _filters_to_predicate,
    _read_files,
    _replay,
    _scan_log_dir,
    delta_scan_files,
)
from .delta_write import (
    _COMMIT_ATTEMPTS,
    _file_stats,
    _partition_values_of,
    _stage_data_files,
    _table_state,
    _try_write_commit,
)


def _current_version(path: str) -> int:
    versions, checkpoints = _scan_log_dir(path)
    return max([*versions, *checkpoints.keys()], default=0)


def _split_terms(filters, pcols: set) -> tuple[list, list]:
    """(partition-column terms, data-column terms)."""
    part, data = [], []
    for t in filters:
        (part if t[0] in pcols else data).append(t)
    return part, data


def _prepare(spark: SparkSession, path: str, filters):
    """Shared phase-1: replay, refusals, candidate prune, touched-file
    resolution.  Returns (snap, schema, pcols, data_pred,
    touched_rels) — ``data_pred`` is None when every candidate file
    matches wholesale."""
    from pyspark.sql.types import StructType

    if not filters:
        raise ValueError(
            "DML requires a non-empty filter list; a full-table"
            " rewrite is an explicit overwrite."
        )
    snap = _replay(path)
    if _column_mapping(snap, path) is not None:
        raise NotImplementedError(
            f"DML on column-mapped table {path!r} is not implemented:"
            " the rewrite would write logical column names into a"
            " physical-name layout."
        )
    schema = StructType.fromJson(json.loads(snap["schema_json"]))
    pcols = list(snap["partition_cols"])
    _part_terms, data_terms = _split_terms(filters, set(pcols))
    candidates = delta_scan_files(path, filters=filters)
    if not candidates:
        return snap, schema, pcols, None, []
    data_pred = _filters_to_predicate(data_terms)
    if data_pred is None:
        # no data-column terms: every candidate matches wholesale
        rels = [os.path.relpath(f, path) for f in candidates]
        return snap, schema, pcols, None, sorted(rels)
    from pyspark.sql.types import StructType as _ST

    data_schema = _ST(
        [f for f in schema.fields if f.name not in pcols]
    )
    hits = (
        spark.read.schema(data_schema)
        .parquet(*candidates)
        .where(data_pred)
        .select(F.col("_metadata.file_path").alias("f"))
        .distinct()
        .collect()
    )
    import re as _re
    from urllib.parse import unquote

    rels = []
    for r in hits:
        # the scan's file_path is a (sometimes single-slash) file URI
        # with percent-encoded specials — same normalization as the
        # readers' delete-mask key
        p = unquote(_re.sub("^file:(//)?", "", r.f))
        rels.append(os.path.relpath(p, os.path.abspath(path)))
    return snap, schema, pcols, data_pred, sorted(rels)


def _read_touched(
    spark: SparkSession, path: str, snap: dict, schema, pcols, touched
) -> DataFrame:
    """The touched files' rows under the full schema (partition values
    restored, DV masks applied) — the rewrite's input."""
    return _read_files(
        spark,
        path,
        schema,
        pcols,
        {rel: snap["live"][rel] for rel in touched},
        [os.path.join(path, rel) for rel in touched],
    )


def _remove_action(
    live_add: dict, rel: str, now_ms: int, data_change: bool
) -> dict:
    """A remove action that tombstones the live (path, DV uid) pair —
    carrying the live add's deletionVector descriptor when present."""
    from urllib.parse import quote

    rm = {
        "path": quote(rel, safe="/="),
        "deletionTimestamp": now_ms,
        "dataChange": data_change,
    }
    dv = (live_add or {}).get("deletionVector")
    if dv and dv.get("storageType"):
        rm["deletionVector"] = dv
    return rm


def _rewrite_commit(
    path: str,
    snap: dict,
    schema,
    pcols: list[str],
    touched: list[str],
    replacement: DataFrame | None,
    operation: str,
) -> int:
    """Stage ``replacement`` (None = pure file drop) and commit
    removes(touched) + adds(new files) atomically via the writer's
    optimistic machinery."""
    from urllib.parse import quote

    rels = (
        _stage_data_files(replacement, path, pcols)
        if replacement is not None
        else []
    )
    data_fields = [f for f in schema.fields if f.name not in pcols]
    now_ms = int(time.time() * 1000)
    adds = [
        {
            "add": {
                "path": quote(rel.replace(os.sep, "/"), safe="/="),
                "partitionValues": _partition_values_of(rel, pcols),
                "size": os.path.getsize(os.path.join(path, rel)),
                "modificationTime": now_ms,
                "dataChange": True,
                "stats": _file_stats(
                    os.path.join(path, rel), data_fields
                ),
            }
        }
        for rel in rels
    ]
    # the replay keys file actions by (path, DV uid) per the spec, so
    # a remove of a DV'd file must carry the SAME descriptor — a bare
    # remove would leave the (path, DV) pair live and resurrect rows
    removes = [
        {"remove": _remove_action(snap["live"][rel], rel, now_ms, True)}
        for rel in touched
    ]
    commit_info = {
        "commitInfo": {
            "timestamp": now_ms,
            "operation": operation,
            "operationParameters": {},
        }
    }
    last = None
    for _ in range(_COMMIT_ATTEMPTS):
        version, _snap = _table_state(path)
        try:
            _try_write_commit(
                path, version, [commit_info, *removes, *adds]
            )
            return version
        except FileExistsError as e:  # racing writer won this version
            last = e
    raise RuntimeError(
        f"could not commit DML to {path!r} after {_COMMIT_ATTEMPTS}"
        f" attempts: {last}"
    )


def delta_delete_where(spark: SparkSession, path: str, filters) -> int:
    """DELETE FROM the Delta-layout table WHERE ``filters`` (the
    manifest grammar, AND) — copy-on-write: touched files are
    rewritten without their matching rows; a predicate carrying only
    partition-column terms drops whole files without rewriting.
    Returns the committed version (unchanged current version if
    nothing matched)."""
    snap, schema, pcols, data_pred, touched = _prepare(
        spark, path, filters
    )
    if not touched:
        return _current_version(path)
    if data_pred is None:
        # whole-file deletes: no rewrite, no read
        return _rewrite_commit(
            path, snap, schema, pcols, touched, None, "DELETE"
        )
    survivors = _read_touched(
        spark, path, snap, schema, pcols, touched
    ).where(~F.coalesce(data_pred, F.lit(False)))
    return _rewrite_commit(
        path, snap, schema, pcols, touched, survivors, "DELETE"
    )


def delta_update_where(
    spark: SparkSession,
    path: str,
    filters,
    assignments: Mapping[str, Column],
) -> int:
    """UPDATE the Delta-layout table SET ``assignments`` WHERE
    ``filters`` — copy-on-write: touched files are rewritten with the
    assignments applied to their matching rows, other rows carried
    verbatim.  Returns the committed version."""
    snap0 = _replay(path)
    cols = {
        f["name"] for f in json.loads(snap0["schema_json"])["fields"]
    }
    unknown = [c for c in assignments if c not in cols]
    if unknown:
        raise ValueError(f"assignment to unknown column(s) {unknown}")
    moved = [c for c in assignments if c in set(snap0["partition_cols"])]
    if moved:
        raise NotImplementedError(
            f"UPDATE of partition column(s) {moved} moves rows across"
            " files; rewrite via overwrite instead."
        )
    snap, schema, pcols, data_pred, touched = _prepare(
        spark, path, filters
    )
    if not touched:
        return _current_version(path)
    df = _read_touched(spark, path, snap, schema, pcols, touched)
    hit = (
        F.coalesce(data_pred, F.lit(False))
        if data_pred is not None
        else F.lit(True)  # partition-only predicate: whole file hits
    )
    for col, expr in assignments.items():
        df = df.withColumn(col, F.when(hit, expr).otherwise(F.col(col)))
    # keep the table's column order (withColumn appends nothing new,
    # but be explicit for the staged write)
    df = df.select(*[f.name for f in schema.fields])
    return _rewrite_commit(
        path, snap, schema, pcols, touched, df, "UPDATE"
    )


def delta_optimize(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 2**20,
    partition_filters=None,
) -> int:
    """OPTIMIZE (bin-packing compaction) for the Delta layout: within
    each partition, groups of small live files are rewritten into
    fewer files approaching ``target_file_bytes``; deletion vectors on
    compacted files are MATERIALIZED (the rewrite reads through the
    mask, the replacement carries no DV).  The commit's removes and
    adds are all ``dataChange=false`` — a physical reorganization with
    no logical change, which the streaming CDF tail skips from the
    commit JSON alone and the batch feed nets to zero.

    ``partition_filters`` (the manifest grammar over partition columns
    only) scopes the compaction; returns the committed version, or the
    current one when nothing qualifies.

    Scale shape: candidate selection is log-sized; the rewrite reads
    and writes only the compacted groups' bytes.  At a million small
    files the win is the whole point — scan tasks drop with the file
    count, and the zone maps of the merged files stay footer-derived.
    """
    from urllib.parse import quote

    from pyspark.sql.types import StructType

    snap = _replay(path)
    if _column_mapping(snap, path) is not None:
        raise NotImplementedError(
            f"OPTIMIZE on column-mapped table {path!r} is not"
            " implemented: the rewrite would write logical column"
            " names into a physical-name layout."
        )
    schema = StructType.fromJson(json.loads(snap["schema_json"]))
    pcols = list(snap["partition_cols"])
    if partition_filters:
        bad = [t[0] for t in partition_filters if t[0] not in pcols]
        if bad:
            raise ValueError(
                f"OPTIMIZE scope filter on non-partition column(s)"
                f" {bad}; row-level predicates do not scope a"
                " compaction."
            )
        scoped = set(
            os.path.relpath(f, path)
            for f in delta_scan_files(path, filters=partition_filters)
        )
    else:
        scoped = set(snap["live"])

    # group small live files by their partition tuple
    groups: dict[tuple, list[str]] = {}
    for rel in sorted(scoped):
        add = snap["live"][rel]
        if (add.get("size") or 0) >= target_file_bytes:
            continue
        pv = add.get("partitionValues") or {}
        key = tuple(pv.get(c) for c in pcols)
        groups.setdefault(key, []).append(rel)
    touched = sorted(
        rel
        for rels in groups.values()
        if len(rels) > 1
        for rel in rels
    )
    if not touched:
        return _current_version(path)

    compacted = _read_touched(spark, path, snap, schema, pcols, touched)
    # one output file per partition group (bins under target size)
    n_groups = sum(1 for rels in groups.values() if len(rels) > 1)
    if pcols:
        compacted = compacted.repartition(n_groups, *pcols)
    else:
        compacted = compacted.coalesce(1)

    rels = _stage_data_files(compacted, path, pcols)
    data_fields = [f for f in schema.fields if f.name not in pcols]
    now_ms = int(time.time() * 1000)
    adds = [
        {
            "add": {
                "path": quote(rel.replace(os.sep, "/"), safe="/="),
                "partitionValues": _partition_values_of(rel, pcols),
                "size": os.path.getsize(os.path.join(path, rel)),
                "modificationTime": now_ms,
                "dataChange": False,
                "stats": _file_stats(
                    os.path.join(path, rel), data_fields
                ),
            }
        }
        for rel in rels
    ]
    removes = [
        {"remove": _remove_action(snap["live"][rel], rel, now_ms, False)}
        for rel in touched
    ]
    commit_info = {
        "commitInfo": {
            "timestamp": now_ms,
            "operation": "OPTIMIZE",
            "operationParameters": {},
        }
    }
    last = None
    for _ in range(_COMMIT_ATTEMPTS):
        version, _snap = _table_state(path)
        try:
            _try_write_commit(
                path, version, [commit_info, *removes, *adds]
            )
            return version
        except FileExistsError as e:
            last = e
    raise RuntimeError(
        f"could not commit OPTIMIZE to {path!r} after"
        f" {_COMMIT_ATTEMPTS} attempts: {last}"
    )


def delta_vacuum(
    path: str,
    retention_ms: int = 7 * 24 * 3600 * 1000,
    dry_run: bool = False,
) -> list[str]:
    """VACUUM for the Delta layout: physically delete data files under
    the table directory that are NOT referenced by the CURRENT
    snapshot and whose tombstone ``deletionTimestamp`` (file mtime as
    the fallback for untracked strays) is older than ``retention_ms``.
    Returns the deleted (or, with ``dry_run``, deletable) paths,
    table-relative.

    Contract caveats, exactly the reference implementation's: TIME
    TRAVEL to versions whose files were vacuumed stops working (the
    log still replays; the read fails at the missing file), and a
    retention shorter than any concurrent reader's snapshot horizon
    can break that reader — the default is the spec's 7 days, and
    shrinking it is the caller's explicit, documented decision.
    Paths under ``_delta_log`` and directories starting with ``_`` or
    ``.`` (staging areas) are never touched.

    Scale shape: one directory walk + one log replay — metadata-sized
    driver work; deletion is per-unreferenced-file.
    """
    if retention_ms < 0:
        raise ValueError("retention_ms must be >= 0")
    snap = _replay(path)
    live = set(snap["live"])
    # newest tombstone timestamp per removed path from the JSON tail
    tombstone_ms: dict[str, int] = {}
    versions, _ckpts = _scan_log_dir(path)
    from urllib.parse import unquote as _unq

    for v in versions:
        fp = os.path.join(path, "_delta_log", f"{v:020d}.json")
        with open(fp) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "remove" in action:
                    rm = action["remove"]
                    ts = rm.get("deletionTimestamp")
                    if ts is not None:
                        tombstone_ms[_unq(rm["path"])] = int(ts)
    now_ms = int(time.time() * 1000)
    deleted: list[str] = []
    for dirpath, dirnames, names in os.walk(path):
        rel_dir = os.path.relpath(dirpath, path)
        dirnames[:] = [
            d for d in dirnames if not d.startswith(("_", "."))
        ]
        for name in names:
            if not name.endswith(".parquet"):
                continue
            rel = (
                name
                if rel_dir == "."
                else os.path.join(rel_dir, name)
            )
            if rel in live:
                continue
            ts = tombstone_ms.get(rel)
            if ts is None:
                ts = int(
                    os.path.getmtime(os.path.join(path, rel)) * 1000
                )
            if now_ms - ts < retention_ms:
                continue
            deleted.append(rel)
            if not dry_run:
                os.unlink(os.path.join(path, rel))
    return sorted(deleted)
