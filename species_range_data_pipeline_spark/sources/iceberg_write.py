"""Writer for the Iceberg Hadoop table LAYOUT — ``delta_write``'s twin
(the engine's own manifest_table stays the native write path; this is
the interop EXPORT sink, and the first-party producer the repo's
``iceberg_log`` reader round-trips against).

Everything follows the public Iceberg table spec (format-version 2) —
manifests and manifest lists are REAL Avro OCF files rendered by the
engine's own ``avro_ocf.write_avro``, no Iceberg runtime anywhere:

    write_iceberg_table(df, path, mode="append", partition_by=["c"])

- **Data files are written by Spark itself** and are COMPLETE per the
  spec (identity-partition source columns stay IN the files).  The
  partition directory layout comes from ``partitionBy`` on DUPLICATED
  shadow columns (``__ice_part_<c>``), so Spark strips the shadows and
  keeps the originals — the manifest partition tuples are parsed back
  from the directory names.  Zero-row task files are dropped.
- **Manifest entries carry footer-derived stats**: ``record_count``,
  ``null_value_counts``/``value_counts``, and ``lower_bounds``/
  ``upper_bounds`` under the spec's single-value binary serialization
  (little-endian ints/floats, UTF-8 strings) — so written tables prune
  in this repo's reader (``iceberg_scan_files``) and any stats-aware
  external reader.  Types whose binary rendering is ambiguous
  contribute counts only, never a wrong bound.
- **Commits are optimistic**: the next ``vN.metadata.json`` is claimed
  with an atomic O_EXCL create; a racing writer's win surfaces as
  FileExistsError and the commit retries against re-read state, then
  ``version-hint.text`` is updated.  Sequence numbers follow the v2
  rules (``last-sequence-number`` + 1 per commit, manifest-list entries
  stamped so ADDED entries inherit).
- **Appends reuse history**: the new snapshot's manifest list carries
  the previous snapshot's manifest entries verbatim (no rewrite — the
  spec's fast-append shape) plus one new manifest of ADDED files;
  overwrite starts a fresh manifest list (old files simply leave the
  live set, which the change feed reads as deletes).
- **Modes**: ``append`` (schema and partitioning must match — loud
  refusal, no silent evolution), ``overwrite``, ``error``.
- Boundaries, loud: nested Spark types (array/map/struct) and
  partition columns outside {int, long, string, boolean, date} are
  refused — manifests for them need complex Avro shapes this writer
  does not emit.

Scale shape: the data write is a plain distributed Spark parquet write
(no Python in the row loop); driver work is per-FILE (footer probe +
rename + one Avro manifest), metadata-sized; an append never rewrites
existing manifests, so commit cost is the new files' count, not the
table's.
"""

from __future__ import annotations

import json
import os
import shutil
import struct
import time
import uuid
from urllib.parse import unquote

from pyspark.sql import DataFrame

from .avro_ocf import parse_avro, write_avro
from .iceberg_log import _current_schema, _load_metadata, _metadata_path

_COMMIT_ATTEMPTS = 10
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"
_SHADOW = "__ice_part_"

#: Spark simpleString -> Iceberg primitive type
_ICE_TYPE = {
    "boolean": "boolean",
    "int": "int",
    "bigint": "long",
    "float": "float",
    "double": "double",
    "date": "date",
    "timestamp_ntz": "timestamp",
    "timestamp": "timestamptz",
    "string": "string",
    "binary": "binary",
}

#: Iceberg primitive -> Avro type for the partition tuple record
_PARTITION_AVRO = {
    "int": "int",
    "long": "long",
    "string": "string",
    "boolean": "boolean",
    "date": "int",  # days since epoch per the spec
}


def _ice_type_of(field) -> str:
    s = field.dataType.simpleString()
    if s in _ICE_TYPE:
        return _ICE_TYPE[s]
    if s.startswith("decimal("):
        return s  # decimal(p,s) spells identically in both
    raise NotImplementedError(
        f"column {field.name!r} has Spark type {s!r}; this Iceberg"
        " writer emits primitive manifest shapes only — cast or drop"
        " nested/unsupported columns."
    )


def _schema_fields_of(df: DataFrame) -> list[dict]:
    return [
        {"id": i + 1, "name": f.name, "required": False,
         "type": _ice_type_of(f)}
        for i, f in enumerate(df.schema.fields)
    ]


def _encode_bound(v, ice_type: str) -> bytes | None:
    """Python value -> Iceberg single-value binary (spec Appendix D),
    the exact inverse of the reader's ``_decode_bound``."""
    import datetime as _dt

    try:
        if ice_type == "int":
            return struct.pack("<i", int(v))
        if ice_type == "long":
            return struct.pack("<q", int(v))
        if ice_type == "float":
            return struct.pack("<f", float(v))
        if ice_type == "double":
            return struct.pack("<d", float(v))
        if ice_type == "string":
            s = v.decode("utf-8") if isinstance(v, bytes) else str(v)
            return s.encode("utf-8")
        if ice_type == "boolean":
            return b"\x01" if v else b"\x00"
        if ice_type == "date":
            if isinstance(v, _dt.date):
                days = (v - _dt.date(1970, 1, 1)).days
            else:
                return None
            return struct.pack("<i", days)
    except (ValueError, OverflowError, UnicodeDecodeError, struct.error):
        return None
    return None


def _file_manifest_stats(fpath: str, fields: list[dict]) -> dict:
    """Footer-derived manifest-entry stats for one data file:
    record_count, value/null counts, and encoded lower/upper bounds."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(fpath)
    by_name = {f["name"]: f for f in fields}
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    values: dict = {}
    complete: set = set()
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        for c in range(rg.num_columns):
            col = rg.column(c)
            name = col.path_in_schema
            if "." in name or name not in by_name:
                continue
            st = col.statistics
            fid = by_name[name]["id"]
            # spec: value_counts includes nulls — i.e. the row count
            values[fid] = values.get(fid, 0) + rg.num_rows
            if st is None or not st.has_null_count:
                nulls.pop(fid, None)
                complete.discard(name)
                continue
            nulls[fid] = nulls.get(fid, 0) + st.null_count
            if not st.has_min_max:
                complete.discard(name)
                continue
            lo = st.min
            hi = st.max
            if name in mins:
                mins[name] = min(mins[name], lo)
                maxs[name] = max(maxs[name], hi)
            else:
                mins[name] = lo
                maxs[name] = hi
                if g == 0:
                    complete.add(name)
    lower, upper = [], []
    for name in sorted(complete):
        f = by_name[name]
        lo = _encode_bound(mins[name], f["type"])
        hi = _encode_bound(maxs[name], f["type"])
        if lo is not None and hi is not None:
            lower.append({"key": f["id"], "value": lo})
            upper.append({"key": f["id"], "value": hi})
    return {
        "record_count": md.num_rows,
        "value_counts": [
            {"key": k, "value": v} for k, v in sorted(values.items())
        ],
        "null_value_counts": [
            {"key": k, "value": v} for k, v in sorted(nulls.items())
        ],
        "lower_bounds": lower or None,
        "upper_bounds": upper or None,
    }


def _manifest_avro_schema(pcols: list[tuple[str, str]]) -> dict:
    """Manifest-entry Avro schema with the identity partition tuple
    for ``pcols`` ([(name, iceberg type)]) and the stats maps in the
    spec's k_v array-of-record encoding."""

    def _kv(name: str, value_type) -> dict:
        return {
            "name": name,
            "type": [
                "null",
                {
                    "type": "array",
                    "items": {
                        "type": "record",
                        "name": f"k_v_{name}",
                        "fields": [
                            {"name": "key", "type": "int"},
                            {"name": "value", "type": value_type},
                        ],
                    },
                },
            ],
            "default": None,
        }

    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {
                "name": "snapshot_id",
                "type": ["null", "long"],
                "default": None,
            },
            {
                "name": "sequence_number",
                "type": ["null", "long"],
                "default": None,
            },
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": "int"},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {
                            "name": "partition",
                            "type": {
                                "type": "record",
                                "name": "r102",
                                "fields": [
                                    {
                                        "name": n,
                                        "type": [
                                            "null",
                                            _PARTITION_AVRO[t],
                                        ],
                                        "default": None,
                                    }
                                    for n, t in pcols
                                ],
                            },
                        },
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                        _kv("value_counts", "long"),
                        _kv("null_value_counts", "long"),
                        _kv("lower_bounds", "bytes"),
                        _kv("upper_bounds", "bytes"),
                    ],
                },
            },
        ],
    }


_MANIFEST_LIST_AVRO = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": ["null", "long"], "default": None},
        {"name": "added_snapshot_id", "type": "long"},
    ],
}


def _partition_tuple(fpath: str, rel: str,
                     pcols: list[tuple[str, str]]) -> dict:
    """Identity partition tuple for one COMPLETE staged data file,
    derived from the file's OWN footer statistics (min == max for the
    identity column; all-null -> null tuple value) — never from the
    Hive directory name, which conflates empty strings and the literal
    default-partition sentinel with NULL (Spark's
    ``getPartitionPathString`` convention).  A file whose footer shows
    a MIXED column (nulls alongside values — exactly what that
    conflation produces when '' rows and NULL rows land in the same
    default-partition directory) is refused rather than guessed.
    Columns whose parquet stats are unusable fall back to the
    directory name (numeric/date types, where the conflation cannot
    occur)."""
    import pyarrow.parquet as pq

    raw_dir: dict = {}
    for comp in rel.split(os.sep)[1:-1]:  # [0] is the data/ root
        if "=" not in comp:
            raise ValueError(
                f"staged file path {rel!r} has a non-partition"
                f" directory component {comp!r}"
            )
        k, _, v = comp.partition("=")
        k = unquote(k)
        if not k.startswith(_SHADOW):
            raise ValueError(f"unexpected partition directory {comp!r}")
        raw_dir[k[len(_SHADOW):]] = None if v == _HIVE_NULL else unquote(v)

    md = pq.read_metadata(fpath)
    names = {n: i for i, n in enumerate(md.schema.names)}
    out: dict = {}
    for name, ice in pcols:
        if name not in raw_dir:
            raise ValueError(
                f"staged file {rel!r} lacks partition value for {name!r}"
            )
        c = names.get(name)
        lo = hi = None
        nulls = rows = 0
        usable = c is not None and md.num_row_groups > 0
        for g in range(md.num_row_groups if usable else 0):
            col = md.row_group(g).column(c)
            st = col.statistics
            rows += md.row_group(g).num_rows
            if st is None or not st.has_null_count:
                usable = False
                break
            nulls += st.null_count
            if st.null_count < md.row_group(g).num_rows:
                if not st.has_min_max:
                    usable = False
                    break
                glo, ghi = st.min, st.max
                lo = glo if lo is None else min(lo, glo)
                hi = ghi if hi is None else max(hi, ghi)
        if usable:
            if nulls == rows:
                out[name] = None
                continue
            if nulls > 0:
                raise ValueError(
                    f"staged file {rel!r} mixes NULL and non-NULL"
                    f" values in identity partition column {name!r} —"
                    " Hive staging conflated an empty-string (or"
                    " default-partition sentinel) value with NULL;"
                    " such partition values are not representable in"
                    " this layout."
                )
            if lo != hi:
                raise ValueError(
                    f"staged file {rel!r} holds multiple values"
                    f" ({lo!r}..{hi!r}) for identity partition column"
                    f" {name!r}; staging must group by partition."
                )
            if ice == "date":
                import datetime as _dt

                out[name] = (lo - _dt.date(1970, 1, 1)).days
            elif ice == "string":
                out[name] = (
                    lo.decode("utf-8") if isinstance(lo, bytes) else str(lo)
                )
            elif ice in ("int", "long"):
                out[name] = int(lo)
            else:
                out[name] = lo
            continue
        # footer unusable: fall back to the directory name
        v = raw_dir[name]
        if v is None:
            out[name] = None
        elif ice in ("int", "long"):
            out[name] = int(v)
        elif ice == "boolean":
            out[name] = v.lower() == "true"
        elif ice == "date":
            import datetime as _dt

            out[name] = (
                _dt.date.fromisoformat(v) - _dt.date(1970, 1, 1)
            ).days
        else:
            out[name] = v
    return out


def _stage_data_files(
    df: DataFrame, path: str, pcols: list[str]
) -> list[str]:
    """Distributed-write COMPLETE data files under ``path``/data and
    return their table-relative paths (shadow partition dirs kept for
    tuple parsing; the files themselves hold every real column)."""
    from pyspark.sql import functions as F

    staging = os.path.join(path, f"_staging-{uuid.uuid4().hex[:12]}")
    out = df
    for c in pcols:
        out = out.withColumn(_SHADOW + c, F.col(c))
    writer = out.write.mode("overwrite")
    if pcols:
        writer = writer.partitionBy(*[_SHADOW + c for c in pcols])
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
                    continue
                # table-wide-unique basename (Spark reuses a task's
                # part name across the partition dirs it writes; the
                # reader's migrated-layout restore keys by basename)
                rel = os.path.join(
                    "data",
                    os.path.dirname(os.path.relpath(src, staging)),
                    f"part-{uuid.uuid4().hex}.parquet",
                )
                dst = os.path.join(path, rel)
                if os.path.exists(dst):
                    raise FileExistsError(
                        f"data file collision at {dst!r}"
                    )
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.replace(src, dst)
                rels.append(rel)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return sorted(rels)


def _table_meta(path: str) -> tuple[int, dict | None]:
    """(next metadata version N for vN.metadata.json, current meta).

    The committed state is what ``version-hint.text`` points at, but
    the NEXT version must clear every vN already on disk — a racing
    writer may have claimed a higher N without updating the hint yet
    (the HadoopTableOperations probe-past-the-hint rule)."""
    mdir = os.path.join(path, "metadata")
    if not os.path.isdir(mdir):
        return 1, None
    try:
        _metadata_path(path)
    except FileNotFoundError:
        return 1, None
    import re as _re

    claimed = [
        int(m.group(1))
        for m in (
            _re.match(r"^v(\d+)\.metadata\.json$", n)
            for n in os.listdir(mdir)
        )
        if m
    ]
    return max(claimed) + 1, _load_metadata(path)


def write_iceberg_table(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    merge_schema: bool = False,
) -> int:
    """Write ``df`` as a new snapshot of the Iceberg Hadoop-layout
    table at ``path`` and return the snapshot id.  See the module
    docstring for staging, stats, and the concurrency contract.
    ``merge_schema=True`` lets an append ADD columns (fresh field ids
    past ``last-column-id``; old files null-pad on read) and omit
    existing ones; type changes still refuse."""
    if mode not in ("append", "overwrite", "error"):
        raise ValueError(f"unsupported mode {mode!r}")
    pcol_names = list(partition_by or [])
    missing = [c for c in pcol_names if c not in df.columns]
    if missing:
        raise ValueError(f"partition column(s) {missing} not in DataFrame")

    fields = _schema_fields_of(df)
    by_name = {f["name"]: f for f in fields}
    pcols = []
    for c in pcol_names:
        ice = by_name[c]["type"]
        if ice not in _PARTITION_AVRO:
            raise NotImplementedError(
                f"partition column {c!r} has Iceberg type {ice!r};"
                f" supported identity partition types:"
                f" {sorted(_PARTITION_AVRO)}."
            )
        pcols.append((c, ice))

    _next, meta = _table_meta(path)
    if meta is not None:
        if mode == "error":
            raise FileExistsError(
                f"Iceberg table at {path!r} already exists (mode='error')"
            )
        evolved_fields: list[dict] | None = None
        if mode == "append":
            cur = _current_schema(meta, path)
            if [(f["name"], f["type"]) for f in cur["fields"]] != [
                (f["name"], f["type"]) for f in fields
            ]:
                if not merge_schema:
                    raise ValueError(
                        f"append schema mismatch at {path!r}: table"
                        f" {cur['fields']} vs DataFrame {fields};"
                        " pass merge_schema=True to add columns, or"
                        " overwrite to change schema."
                    )
                cur_by_name = {f["name"]: f for f in cur["fields"]}
                for f in fields:
                    old = cur_by_name.get(f["name"])
                    if old is not None and old["type"] != f["type"]:
                        raise ValueError(
                            f"append type change for column"
                            f" {f['name']!r} at {path!r}: table"
                            f" {old['type']} vs DataFrame {f['type']};"
                            " schema evolution adds columns, never"
                            " retypes them."
                        )
                next_id = int(meta.get("last-column-id") or 0)
                evolved_fields = list(cur["fields"])
                for f in fields:
                    if f["name"] not in cur_by_name:
                        next_id += 1
                        evolved_fields.append(
                            {
                                "id": next_id,
                                "name": f["name"],
                                "required": False,
                                "type": f["type"],
                            }
                        )
            specs = {
                s["spec-id"]: s for s in meta.get("partition-specs", [])
            }
            spec = specs.get(meta.get("default-spec-id", 0), {})
            cur_pcols = [
                f["name"]
                for f in spec.get("fields", [])
                if f.get("transform") == "identity"
            ]
            if cur_pcols != pcol_names:
                raise ValueError(
                    f"append partitioning mismatch at {path!r}: table"
                    f" {cur_pcols} vs requested {pcol_names}."
                )
        if mode == "append":
            fields = (
                evolved_fields
                if evolved_fields is not None
                else _current_schema(meta, path)["fields"]
            )
        by_name = {f["name"]: f for f in fields}
        pcols = [(c, by_name[c]["type"]) for c in pcol_names]

    os.makedirs(os.path.join(path, "metadata"), exist_ok=True)
    rels = _stage_data_files(df, path, pcol_names)
    snapshot_id = int(time.time() * 1000) * 1000 + (
        uuid.uuid4().int % 1000
    )
    now_ms = int(time.time() * 1000)

    entries = []
    for rel in rels:
        fpath = os.path.join(path, rel)
        stats = _file_manifest_stats(fpath, fields)
        entries.append(
            {
                "status": 1,  # ADDED: sequence number inherits
                "snapshot_id": snapshot_id,
                "sequence_number": None,
                "data_file": {
                    "content": 0,
                    "file_path": rel.replace(os.sep, "/"),
                    "file_format": "PARQUET",
                    "partition": _partition_tuple(fpath, rel, pcols),
                    "file_size_in_bytes": os.path.getsize(fpath),
                    **stats,
                },
            }
        )
    manifest = os.path.join(
        path, "metadata", f"m-{uuid.uuid4().hex}.avro"
    )
    write_avro(entries, _manifest_avro_schema(pcols), manifest)

    last_err: Exception | None = None
    for _ in range(_COMMIT_ATTEMPTS):
        version, meta = _table_meta(path)
        prev_snaps = list((meta or {}).get("snapshots") or [])
        if meta is not None and mode == "overwrite":
            cur = _current_schema(meta, path)
            if [(f["name"], f["type"]) for f in cur["fields"]] != [
                (f["name"], f["type"]) for f in fields
            ]:
                # a schema-changing overwrite cannot keep history: the
                # single schemas entry written here would mis-resolve
                # the old snapshots' files — start the history fresh
                prev_snaps = []
        seq = int((meta or {}).get("last-sequence-number") or 0) + 1
        carried: list[dict] = []
        if mode == "append" and meta is not None and prev_snaps:
            cur_id = meta.get("current-snapshot-id")
            (cur_snap,) = [
                s for s in prev_snaps if s["snapshot-id"] == cur_id
            ] or [prev_snaps[-1]]
            mlist_path = cur_snap["manifest-list"]
            mlist_abs = (
                mlist_path
                if os.path.isabs(mlist_path)
                else os.path.join(path, mlist_path)
            )
            with open(mlist_abs, "rb") as fh:
                _, carried = parse_avro(fh.read())

        mlist = os.path.join(
            path, "metadata", f"snap-{snapshot_id}-{version}.avro"
        )
        write_avro(
            [
                *[
                    {
                        "manifest_path": c["manifest_path"],
                        "manifest_length": c["manifest_length"],
                        "partition_spec_id": c.get(
                            "partition_spec_id", 0
                        ),
                        "content": c.get("content", 0),
                        "sequence_number": c.get("sequence_number"),
                        "added_snapshot_id": c.get(
                            "added_snapshot_id", snapshot_id
                        ),
                    }
                    for c in carried
                ],
                {
                    "manifest_path": manifest,
                    "manifest_length": os.path.getsize(manifest),
                    "partition_spec_id": 0,
                    "content": 0,
                    "sequence_number": seq,
                    "added_snapshot_id": snapshot_id,
                },
            ],
            _MANIFEST_LIST_AVRO,
            mlist,
        )
        # history is KEPT across overwrite (time travel + the change
        # feed's live-set diff both read the old snapshots; an
        # overwrite's removals are simply files absent from the new
        # manifest list)
        parent = prev_snaps[-1]["snapshot-id"] if prev_snaps else None
        snapshot = {
            "snapshot-id": snapshot_id,
            "timestamp-ms": now_ms,
            "sequence-number": seq,
            "manifest-list": mlist,
            "summary": {
                "operation": "append" if mode == "append" else "overwrite"
            },
        }
        if parent is not None:
            snapshot["parent-snapshot-id"] = parent
        new_meta = {
            "format-version": 2,
            "table-uuid": (meta or {}).get("table-uuid")
            or str(uuid.uuid4()),
            "location": path,
            "last-sequence-number": seq,
            "last-column-id": max(f["id"] for f in fields),
            "schemas": [
                {"type": "struct", "schema-id": 0, "fields": fields}
            ],
            "current-schema-id": 0,
            "partition-specs": [
                {
                    "spec-id": 0,
                    "fields": [
                        {
                            "name": c,
                            "transform": "identity",
                            "source-id": by_name[c]["id"],
                            "field-id": 1000 + i,
                        }
                        for i, (c, _t) in enumerate(pcols)
                    ],
                }
            ],
            "default-spec-id": 0,
            "snapshots": prev_snaps + [snapshot],
            "current-snapshot-id": snapshot_id,
        }
        mpath = os.path.join(path, "metadata", f"v{version}.metadata.json")
        try:
            fd = os.open(mpath, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as e:  # a racing writer won this version
            last_err = e
            os.unlink(mlist)
            continue
        with os.fdopen(fd, "w") as fh:
            json.dump(new_meta, fh)
            fh.flush()
            os.fsync(fh.fileno())
        with open(
            os.path.join(path, "metadata", "version-hint.text"), "w"
        ) as fh:
            fh.write(str(version))
        return snapshot_id
    raise RuntimeError(
        f"could not commit to {path!r} after {_COMMIT_ATTEMPTS}"
        f" optimistic attempts (concurrent writers?): {last_err}"
    )


def iceberg_delete_where(spark, path: str, filters) -> int:
    """MERGE-ON-READ DELETE for the Iceberg layout: rows matching
    ``filters`` (the manifest grammar, AND) are masked by a NEW v2
    POSITION-DELETE file — no data file is rewritten (the
    copy-on-write counterpart is the Delta module's job).  Returns the
    new snapshot id (or the current one if nothing matched).

    Shape per the spec: one scan of the PRUNED candidate files (data
    files are complete, so the full predicate — partition terms
    included — applies in-file) collects matching
    ``(_metadata.file_path, row_index)`` pairs; they are written as a
    sorted ``(file_path, pos)`` parquet delete file, registered under
    a ``content=1`` delete manifest appended to the carried manifest
    list, at the NEW sequence number — so it scopes over every
    existing data file (strictly-smaller rule) and a later compaction
    or append correctly escapes it.  The repo's own reader, change
    feed, and streaming CDF all consume the result; cost is the
    matching rows, never the table.
    """
    from pyspark.sql import functions as F

    from .iceberg_log import (
        _filters_to_predicate,
        _struct_type,
        iceberg_scan_files,
    )

    if not filters:
        raise ValueError(
            "DELETE requires a non-empty filter list; dropping every"
            " row is an explicit overwrite."
        )
    _next, meta = _table_meta(path)
    if meta is None:
        raise FileNotFoundError(f"no Iceberg table at {path!r}")
    cur_schema = _current_schema(meta, path)
    candidates = iceberg_scan_files(path, filters=filters)
    snaps = list(meta.get("snapshots") or [])
    cur_id = meta.get("current-snapshot-id")
    if not candidates:
        return cur_id
    pred = _filters_to_predicate(filters)
    # the scan's file URI -> the plain absolute path the read-side
    # mask compares against (scheme strip + percent decode; '+' is
    # pre-escaped because url_decode speaks form-encoding)
    plain = F.url_decode(
        F.regexp_replace(
            F.regexp_replace(
                F.col("_metadata.file_path"), "^file:(//)?", ""
            ),
            r"\+",
            "%2B",
        )
    )
    dels = (
        spark.read.schema(_struct_type(cur_schema))
        .parquet(*candidates)
        .where(pred)
        .select(
            plain.alias("file_path"),
            F.col("_metadata.row_index").alias("pos"),
        )
    )
    staging = os.path.join(path, f"_staging-{uuid.uuid4().hex[:12]}")
    (
        dels.coalesce(1)
        .sortWithinPartitions("file_path", "pos")
        .write.mode("overwrite")
        .parquet(staging)
    )
    import pyarrow.parquet as pq

    del_rel = None
    n_rows = 0
    try:
        for name in os.listdir(staging):
            if name.startswith("part-") and name.endswith(".parquet"):
                src = os.path.join(staging, name)
                n_rows = pq.read_metadata(src).num_rows
                if n_rows == 0:
                    break
                del_rel = os.path.join(
                    "data", f"delete-{uuid.uuid4().hex}.parquet"
                )
                os.makedirs(
                    os.path.join(path, "data"), exist_ok=True
                )
                os.replace(src, os.path.join(path, del_rel))
                break
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    if del_rel is None:
        return cur_id  # zone maps admitted candidates, none matched

    specs = {s["spec-id"]: s for s in meta.get("partition-specs", [])}
    spec = specs.get(meta.get("default-spec-id", 0), {"fields": []})
    by_id = {f["id"]: f for f in cur_schema["fields"]}
    pcols = [
        (f["name"], by_id[f["source-id"]]["type"])
        for f in spec.get("fields", [])
        if f.get("transform") == "identity" and f["source-id"] in by_id
    ]
    del_abs = os.path.join(path, del_rel)
    snapshot_id = int(time.time() * 1000) * 1000 + (
        uuid.uuid4().int % 1000
    )
    manifest = os.path.join(path, "metadata", f"m-{uuid.uuid4().hex}.avro")
    write_avro(
        [
            {
                "status": 1,
                "snapshot_id": snapshot_id,
                "sequence_number": None,
                "data_file": {
                    "content": 1,  # POSITION DELETES
                    "file_path": del_rel.replace(os.sep, "/"),
                    "file_format": "PARQUET",
                    "partition": {c: None for c, _t in pcols},
                    "record_count": n_rows,
                    "file_size_in_bytes": os.path.getsize(del_abs),
                    "value_counts": None,
                    "null_value_counts": None,
                    "lower_bounds": None,
                    "upper_bounds": None,
                },
            }
        ],
        _manifest_avro_schema(pcols),
        manifest,
    )

    last_err: Exception | None = None
    for _ in range(_COMMIT_ATTEMPTS):
        version, meta = _table_meta(path)
        prev_snaps = list((meta or {}).get("snapshots") or [])
        seq = int((meta or {}).get("last-sequence-number") or 0) + 1
        cur_id2 = (meta or {}).get("current-snapshot-id")
        (cur_snap,) = [
            s for s in prev_snaps if s["snapshot-id"] == cur_id2
        ] or [prev_snaps[-1]]
        mlist_path = cur_snap["manifest-list"]
        mlist_abs = (
            mlist_path
            if os.path.isabs(mlist_path)
            else os.path.join(path, mlist_path)
        )
        with open(mlist_abs, "rb") as fh:
            _, carried = parse_avro(fh.read())
        mlist = os.path.join(
            path, "metadata", f"snap-{snapshot_id}-{version}.avro"
        )
        write_avro(
            [
                *[
                    {
                        "manifest_path": c["manifest_path"],
                        "manifest_length": c["manifest_length"],
                        "partition_spec_id": c.get("partition_spec_id", 0),
                        "content": c.get("content", 0),
                        "sequence_number": c.get("sequence_number"),
                        "added_snapshot_id": c.get(
                            "added_snapshot_id", snapshot_id
                        ),
                    }
                    for c in carried
                ],
                {
                    "manifest_path": manifest,
                    "manifest_length": os.path.getsize(manifest),
                    "partition_spec_id": 0,
                    "content": 1,  # delete manifest
                    "sequence_number": seq,
                    "added_snapshot_id": snapshot_id,
                },
            ],
            _MANIFEST_LIST_AVRO,
            mlist,
        )
        snapshot = {
            "snapshot-id": snapshot_id,
            "parent-snapshot-id": prev_snaps[-1]["snapshot-id"],
            "timestamp-ms": int(time.time() * 1000),
            "sequence-number": seq,
            "manifest-list": mlist,
            "summary": {"operation": "delete"},
        }
        new_meta = dict(meta)
        new_meta["last-sequence-number"] = seq
        new_meta["snapshots"] = prev_snaps + [snapshot]
        new_meta["current-snapshot-id"] = snapshot_id
        mpath = os.path.join(path, "metadata", f"v{version}.metadata.json")
        try:
            fd = os.open(mpath, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as e:
            last_err = e
            os.unlink(mlist)
            continue
        with os.fdopen(fd, "w") as fh:
            json.dump(new_meta, fh)
            fh.flush()
            os.fsync(fh.fileno())
        with open(
            os.path.join(path, "metadata", "version-hint.text"), "w"
        ) as fh:
            fh.write(str(version))
        return snapshot_id
    raise RuntimeError(
        f"could not commit DELETE to {path!r} after {_COMMIT_ATTEMPTS}"
        f" optimistic attempts (concurrent writers?): {last_err}"
    )


def iceberg_compact(spark, path: str) -> int:
    """Compaction (``rewrite_data_files``) for the Iceberg layout:
    the CURRENT snapshot — position- and equality-delete masks applied
    — is rewritten into one data file per identity partition and
    committed as an overwrite snapshot whose manifest list carries NO
    delete manifests: accumulated merge-on-read masks are materialized
    and fold away, exactly the "compaction folds deletes away"
    contract the read-side sweeps assume (SCALE.md rules 62/65).

    History is kept (the schema is unchanged by construction), so
    time travel still reaches the pre-compaction snapshots, and the
    change feed's live-set diff across the compaction step nets to
    ZERO rows (carried rows cancel; the masked rows were already
    logically absent).  The new files land at the NEW sequence
    number, so they correctly escape any older equality deletes.

    Scale shape: reads and rewrites the live table once — a
    maintenance op priced like a full scan plus a full write; run it
    partition-scoped via the writer's machinery when that matters.
    Returns the new snapshot id.
    """
    from .iceberg_log import read_iceberg_table

    _next, meta = _table_meta(path)
    if meta is None:
        raise FileNotFoundError(f"no Iceberg table at {path!r}")
    cur = _current_schema(meta, path)
    specs = {s["spec-id"]: s for s in meta.get("partition-specs", [])}
    spec = specs.get(meta.get("default-spec-id", 0), {"fields": []})
    by_id = {f["id"]: f for f in cur["fields"]}
    pcols = [
        by_id[f["source-id"]]["name"]
        for f in spec.get("fields", [])
        if f.get("transform") == "identity" and f["source-id"] in by_id
    ]
    df = read_iceberg_table(spark, path)
    df = df.repartition(max(1, len(pcols) or 1), *pcols) if pcols \
        else df.coalesce(1)
    return write_iceberg_table(
        df, path, mode="overwrite", partition_by=pcols
    )


def iceberg_expire_snapshots(path: str, keep_last: int = 1) -> list[str]:
    """Snapshot expiry for the Iceberg layout: keep the newest
    ``keep_last`` snapshots, commit a metadata version with the
    history pruned, and physically delete every file (data, delete,
    manifest, manifest list) reachable ONLY from the expired
    snapshots.  Returns the deleted paths.

    Contract caveats, the reference implementation's: time travel to
    an expired snapshot id raises, and a streaming tail whose
    checkpointed offset expired fails with the fresh-checkpoint
    instruction (both already the readers' contract).  The pruned
    metadata commits through the same optimistic O_EXCL claim as any
    write, so racing writers are safe.

    Scale shape: a manifest walk per snapshot (metadata-sized) plus
    per-expired-file deletion — never a data read.
    """
    from .iceberg_log import _walk_entries, _resolve

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")

    def _reachable(meta, snaps) -> set[str]:
        out: set[str] = set()
        for s in snaps:
            mlist = _resolve(path, s["manifest-list"])
            out.add(mlist)
            with open(mlist, "rb") as fh:
                _, manifests = parse_avro(fh.read())
            for m in manifests:
                out.add(_resolve(path, m["manifest_path"]))
            for _kind, d, _sid, _seq in _walk_entries(path, s):
                out.add(_resolve(path, d["file_path"]))
        return out

    last_err: Exception | None = None
    for _ in range(_COMMIT_ATTEMPTS):
        version, meta = _table_meta(path)
        if meta is None:
            raise FileNotFoundError(f"no Iceberg table at {path!r}")
        snaps = list(meta.get("snapshots") or [])
        if len(snaps) <= keep_last:
            return []
        kept, expired = snaps[-keep_last:], snaps[:-keep_last]
        # the oldest kept snapshot loses its (expired) parent pointer
        kept = [dict(kept[0]), *kept[1:]]
        kept[0].pop("parent-snapshot-id", None)
        keep_files = _reachable(meta, kept)
        drop_files = _reachable(meta, expired) - keep_files
        new_meta = dict(meta)
        new_meta["snapshots"] = kept
        mpath = os.path.join(
            path, "metadata", f"v{version}.metadata.json"
        )
        try:
            fd = os.open(mpath, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as e:
            last_err = e
            continue
        with os.fdopen(fd, "w") as fh:
            json.dump(new_meta, fh)
            fh.flush()
            os.fsync(fh.fileno())
        with open(
            os.path.join(path, "metadata", "version-hint.text"), "w"
        ) as fh:
            fh.write(str(version))
        for f in sorted(drop_files):
            if os.path.exists(f):
                os.unlink(f)
        return sorted(drop_files)
    raise RuntimeError(
        f"could not commit snapshot expiry to {path!r} after"
        f" {_COMMIT_ATTEMPTS} attempts: {last_err}"
    )
