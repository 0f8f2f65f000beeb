"""Avro Object Container File reader/writer, stdlib-only.

``sources/formats.py`` gates Avro behind the ``spark-avro`` JVM package,
which this environment does not ship — so the format was the one
advertised lane the engine could only probe for.  The Avro OCF layout
and binary encoding are a public spec (and simple); this module closes
the gap the same way the GeoTIFF/shapefile/GPKG/WARC lanes closed
theirs: struct-level implementation, no dependencies.

Scope (the working majority of real Avro files):
- container: magic ``Obj\\x01``, file-metadata map (``avro.schema`` JSON,
  ``avro.codec`` null/deflate/snappy), 16-byte sync marker, data blocks of
  (count, byte-length, payload, sync).
- types: null, boolean, int, long (zigzag varints), float, double,
  bytes, string, records, enums, fixed, arrays, maps, and unions.
  Logical types pass through as their underlying primitive (the same
  posture DuckDB's Avro reader takes).
- codecs: null, deflate (stdlib zlib), and snappy — the raw-snappy
  format implemented from its public description, CRC32-checked per
  the Avro block convention.

Spark-side: ``read_avro_python(spark, path)`` scans ``*.avro`` via
``binaryFile`` + ``mapInPandas`` — one task per container file (Avro's
own framing; files are the split unit when the JVM reader is absent too)
— yielding one row per record with nested values carried as JSON strings
for schema stability (callers ``from_json`` the columns they need;
flat primitive columns surface natively).  Parse failures land in the
error side-channel.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

_MAGIC = b"Obj\x01"


# ---- binary primitives ---------------------------------------------------


def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint."""
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise ValueError("varint runs past end of input")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("varint longer than 10 bytes")
    return (acc >> 1) ^ -(acc & 1)


def _write_long(out: bytearray, v: int) -> None:
    v = (v << 1) ^ (v >> 63)
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    if n < 0:
        raise ValueError(f"negative byte-length {n}")
    data = buf.read(n)
    if len(data) != n:
        raise ValueError("bytes value runs past end of input")
    return data


# ---- schema-driven decode ------------------------------------------------


def _decode(schema, buf: io.BytesIO, budget: list[int] | None = None):
    # budget: mutable [remaining-value-count] proportional to input size —
    # without it a crafted array/map of zero-byte items (nulls, empty
    # records) with a 10^9 block count hangs/OOMs while reading NO input
    if budget is not None:
        budget[0] -= 1
        if budget[0] < 0:
            raise ValueError("decoded value count exceeds the input-size budget")
    if isinstance(schema, list):  # union: branch index then value
        idx = _read_long(buf)
        if not 0 <= idx < len(schema):
            raise ValueError(f"union branch {idx} out of range")
        return _decode(schema[idx], buf, budget)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {
                f["name"]: _decode(f["type"], buf, budget)
                for f in schema["fields"]
            }
        if t == "enum":
            idx = _read_long(buf)
            symbols = schema["symbols"]
            if not 0 <= idx < len(symbols):
                raise ValueError(f"enum index {idx} out of range")
            return symbols[idx]
        if t == "fixed":
            data = buf.read(schema["size"])
            if len(data) != schema["size"]:
                raise ValueError("fixed value runs past end of input")
            return data
        if t == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix
                    n = -n
                    _read_long(buf)
                if budget is not None and n > budget[0]:
                    raise ValueError(
                        f"array block count {n} exceeds the input-size budget"
                    )
                for _ in range(n):
                    out.append(_decode(schema["items"], buf, budget))
        if t == "map":
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    _read_long(buf)
                if budget is not None and n > budget[0]:
                    raise ValueError(
                        f"map block count {n} exceeds the input-size budget"
                    )
                for _ in range(n):
                    k = _read_bytes(buf).decode("utf-8")
                    out[k] = _decode(schema["values"], buf, budget)
        return _decode(t, buf, budget)  # {"type": "string", "logicalType": ...}
    # primitive name
    if schema == "null":
        return None
    if schema == "boolean":
        b = buf.read(1)
        if not b:
            raise ValueError("boolean runs past end of input")
        return b != b"\x00"
    if schema in ("int", "long"):
        return _read_long(buf)
    if schema == "float":
        data = buf.read(4)
        if len(data) != 4:
            raise ValueError("float runs past end of input")
        return struct.unpack("<f", data)[0]
    if schema == "double":
        data = buf.read(8)
        if len(data) != 8:
            raise ValueError("double runs past end of input")
        return struct.unpack("<d", data)[0]
    if schema == "bytes":
        return _read_bytes(buf)
    if schema == "string":
        return _read_bytes(buf).decode("utf-8", "replace")
    raise ValueError(f"unsupported Avro type {schema!r}")


def _branch_matches(branch, v) -> bool:
    if branch == "null":
        return v is None
    if v is None:
        return False
    if branch == "boolean":
        return isinstance(v, bool)
    if branch in ("int", "long"):
        return isinstance(v, int) and not isinstance(v, bool)
    if branch in ("float", "double"):
        return isinstance(v, (int, float)) and not isinstance(v, bool)
    if branch == "string":
        return isinstance(v, str)
    if branch == "bytes":
        return isinstance(v, (bytes, bytearray))
    if isinstance(branch, dict):
        t = branch["type"]
        if t in ("record", "map"):
            return isinstance(v, dict)
        if t == "array":
            return isinstance(v, list)
        if t == "enum":
            return isinstance(v, str)
        if t == "fixed":
            return isinstance(v, (bytes, bytearray))
        return _branch_matches(t, v)
    return True  # named-type reference etc.: last resort


def _encode(schema, v, out: bytearray) -> None:
    if isinstance(schema, list):
        # pick the first branch whose Python type matches the value
        # (["null","long","string"] with "x" must choose string, not long)
        for i, branch in enumerate(schema):
            if _branch_matches(branch, v):
                _write_long(out, i)
                _encode(branch, v, out)
                return
        raise ValueError(f"no union branch for {v!r}")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                _encode(f["type"], v[f["name"]], out)
            return
        if t == "array":
            if v:
                _write_long(out, len(v))
                for item in v:
                    _encode(schema["items"], item, out)
            _write_long(out, 0)
            return
        if t == "map":
            if v:
                _write_long(out, len(v))
                for k, item in v.items():
                    kb = k.encode("utf-8")
                    _write_long(out, len(kb))
                    out += kb
                    _encode(schema["values"], item, out)
            _write_long(out, 0)
            return
        if t == "enum":
            _write_long(out, schema["symbols"].index(v))
            return
        if t == "fixed":
            out += v
            return
        _encode(t, v, out)
        return
    if schema == "null":
        return
    if schema == "boolean":
        out.append(1 if v else 0)
        return
    if schema in ("int", "long"):
        _write_long(out, int(v))
        return
    if schema == "float":
        out += struct.pack("<f", v)
        return
    if schema == "double":
        out += struct.pack("<d", v)
        return
    if schema == "bytes":
        _write_long(out, len(v))
        out += v
        return
    if schema == "string":
        b = v.encode("utf-8")
        _write_long(out, len(b))
        out += b
        return
    raise ValueError(f"unsupported Avro type {schema!r}")


# ---- container -----------------------------------------------------------


#: bomb guard: a snappy block may not declare more than this many bytes
_SNAPPY_MAX_OUT = 1 << 30


def _snappy_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    shift = v = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated snappy varint")
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy varint too long")


def _snappy_decompress(data: bytes) -> bytes:
    """Raw-snappy decode from the public format description: uvarint
    uncompressed length, then literal / 1-2-4-byte-offset copy elements.
    Overlapping copies are byte-serial (the LZ77 RLE trick); every length
    and offset is bounds-checked and the declared size is capped."""
    n, pos = _snappy_uvarint(data, 0)
    if n > _SNAPPY_MAX_OUT:
        raise ValueError(f"snappy declares {n} bytes (bomb guard)")
    out = bytearray()
    while pos < len(data):
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                if pos + nb > len(data):
                    raise ValueError("truncated snappy literal length")
                ln = int.from_bytes(data[pos : pos + nb], "little")
                pos += nb
            ln += 1
            if pos + ln > len(data):
                raise ValueError("snappy literal runs past end")
            out += data[pos : pos + ln]
            pos += ln
        else:
            if kind == 1:
                if pos >= len(data):
                    raise ValueError("truncated snappy copy")
                ln = ((tag >> 2) & 7) + 4
                off = ((tag >> 5) << 8) | data[pos]
                pos += 1
            else:
                nb = 2 if kind == 2 else 4
                if pos + nb > len(data):
                    raise ValueError("truncated snappy copy")
                ln = (tag >> 2) + 1
                off = int.from_bytes(data[pos : pos + nb], "little")
                pos += nb
            if off == 0 or off > len(out):
                raise ValueError("snappy copy offset out of range")
            if off >= ln:  # disjoint: one slice copy
                start = len(out) - off
                out += out[start : start + ln]
            else:  # overlapping (RLE): byte-serial by definition
                for _ in range(ln):
                    out.append(out[-off])
        if len(out) > n:
            raise ValueError("snappy output exceeds its declared length")
    if len(out) != n:
        raise ValueError(f"snappy output {len(out)} != declared {n}")
    return bytes(out)


def _snappy_compress(data: bytes) -> bytes:
    """All-literal snappy (spec-valid, size-preserving) — the write-side
    twin; any conformant reader, including ours, decodes it."""
    out = bytearray()
    n = len(data)
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            break
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + 65536]
        pos += len(chunk)
        out.append(61 << 2)  # literal, 2-byte length follows
        out += (len(chunk) - 1).to_bytes(2, "little")
        out += chunk
    return bytes(out)


def parse_avro(content: bytes) -> tuple[dict, list]:
    """.avro OCF bytes -> (schema, [record, ...]).  Malformed input raises
    ``ValueError``; null, deflate, and snappy codecs all decode."""
    try:
        return _parse_avro(content)
    except (struct.error, IndexError, KeyError, TypeError) as exc:
        raise ValueError(f"malformed avro container: {exc}") from exc


def _parse_avro(content: bytes) -> tuple[dict, list]:
    if content[:4] != _MAGIC:
        raise ValueError(f"not an Avro OCF: magic {content[:4]!r}")
    buf = io.BytesIO(content)
    buf.seek(4)
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_long(buf)
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate", "snappy"):
        raise ValueError(f"unknown Avro codec {codec!r}")
    schema = json.loads(meta["avro.schema"])
    sync = buf.read(16)
    if len(sync) != 16:
        raise ValueError("missing sync marker")
    records: list = []
    while buf.tell() < len(content):
        count = _read_long(buf)
        size = _read_long(buf)
        if count < 0 or size < 0 or count > 50_000_000:
            raise ValueError(f"implausible block header ({count}, {size})")
        payload = buf.read(size)
        if len(payload) != size:
            raise ValueError("data block runs past end of file")
        if codec == "deflate":
            try:
                payload = zlib.decompress(payload, wbits=-15)
            except zlib.error as exc:
                raise ValueError(f"corrupt deflate block: {exc}") from exc
        elif codec == "snappy":
            if len(payload) < 4:
                raise ValueError("snappy block too short for its CRC")
            body, crc = payload[:-4], payload[-4:]
            payload = _snappy_decompress(body)
            # Avro appends a big-endian CRC32 of the UNCOMPRESSED data
            if zlib.crc32(payload) & 0xFFFFFFFF != int.from_bytes(crc, "big"):
                raise ValueError("snappy block CRC mismatch")
        pbuf = io.BytesIO(payload)
        # every decoded value consumes budget; proportional to the
        # DECOMPRESSED block size so null-heavy but honest data fits
        budget = [10 * len(payload) + 10_000]
        for _ in range(count):
            records.append(_decode(schema, pbuf, budget))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch after block")
    return schema, records


def write_avro(
    records: list[dict], schema: dict, path: str, codec: str = "deflate"
) -> None:
    """Records + schema -> a spec-conformant OCF on local disk (the
    round-trip twin; sync marker derived from the schema so output is
    byte-deterministic)."""
    import hashlib

    sync = hashlib.md5(json.dumps(schema).encode()).digest()
    out = bytearray(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        _write_long(out, len(kb))
        out += kb
        _write_long(out, len(v))
        out += v
    _write_long(out, 0)
    out += sync
    body = bytearray()
    for r in records:
        _encode(schema, r, body)
    payload = bytes(body)
    if codec == "deflate":
        payload = zlib.compress(payload)[2:-4]  # raw deflate, no zlib wrap
    elif codec == "snappy":
        crc = (zlib.crc32(payload) & 0xFFFFFFFF).to_bytes(4, "big")
        payload = _snappy_compress(payload) + crc
    elif codec != "null":
        raise ValueError(f"unsupported write codec {codec!r}")
    _write_long(out, len(records))
    _write_long(out, len(payload))
    out += payload
    out += sync
    with open(path, "wb") as fh:
        fh.write(bytes(out))


# ---- Spark lane ----------------------------------------------------------


def read_avro_python(spark, path: str):
    """Scan ``*.avro`` under ``path``: one row per record — (path, record,
    then one column per top-level field; nested record/array/map values
    carried as JSON strings for schema stability) plus the error
    side-channel.  The committed output schema derives from the FIRST
    file's declared schema (explicit, like every other lane — mixed-
    schema directories should be read per-directory)."""
    import glob as _glob
    import os

    import pandas as pd

    from pyspark.sql import types as T

    first = sorted(
        _glob.glob(os.path.join(path, "**", "*.avro"), recursive=True)
    )
    if not first:
        raise FileNotFoundError(f"no .avro files under {path}")
    with open(first[0], "rb") as fh:
        head_schema, _ = parse_avro(fh.read())
    if head_schema.get("type") != "record":
        raise ValueError("top-level Avro schema must be a record")

    def _col_plan(fs):
        """(spark_type, needs_json).  Native: primitives, enums (their
        symbol string), fixed (bytes), and nullable unions of exactly one
        such branch.  EVERYTHING else — records, arrays, maps, and
        multi-branch unions (whose decoded values vary in Python type and
        would poison an Arrow string column) — is JSON-carried."""
        prim = {
            "boolean": T.BooleanType(),
            "int": T.LongType(),
            "long": T.LongType(),
            "float": T.DoubleType(),
            "double": T.DoubleType(),
            "bytes": T.BinaryType(),
            "string": T.StringType(),
        }
        if isinstance(fs, str) and fs in prim:
            return prim[fs], False
        if isinstance(fs, dict):
            if fs.get("type") == "enum":
                return T.StringType(), False  # symbol string, NOT quoted
            if fs.get("type") == "fixed":
                return T.BinaryType(), False
            if fs.get("type") in prim and isinstance(fs.get("type"), str):
                return prim[fs["type"]], False  # logical-type wrapper
        if isinstance(fs, list):
            branches = [b for b in fs if b != "null"]
            if len(branches) == 1:
                t, nj = _col_plan(branches[0])
                return t, nj
        return T.StringType(), True

    fields = [(f["name"], f["type"]) for f in head_schema["fields"]]
    plans = {n: _col_plan(fs) for n, fs in fields}
    out_schema = T.StructType(
        [T.StructField("path", T.StringType()),
         T.StructField("record", T.LongType())]
        + [T.StructField(n, plans[n][0]) for n, _ in fields]
        + [T.StructField("error", T.StringType())]
    )
    complex_cols = {n for n, _ in fields if plans[n][1]}

    def _jsonable(v):
        # bytes inside JSON-carried values (fixed/bytes in nests) -> hex
        if isinstance(v, (bytes, bytearray)):
            return v.hex()
        raise TypeError(f"not JSON serializable: {type(v).__name__}")

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )

    def fn(batches):
        for pdf in batches:
            rows = []
            for path_, blob in zip(pdf["path"], pdf["content"]):
                try:
                    _, records = parse_avro(bytes(blob))
                    for i, rec in enumerate(records, start=1):
                        row = {"path": path_, "record": i, "error": None}
                        for n, _fs in fields:
                            v = rec.get(n)
                            if n in complex_cols and v is not None:
                                v = json.dumps(
                                    v, sort_keys=True, default=_jsonable
                                )
                            row[n] = v
                        rows.append(row)
                except Exception as exc:
                    rows.append(
                        {"path": path_, "record": None, "error":
                         f"{type(exc).__name__}: {exc}",
                         **{n: None for n, _ in fields}}
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return files.mapInPandas(fn, out_schema)


def _avro_schema_for(spark_schema, name: str = "Row") -> dict:
    """Spark StructType -> Avro record schema (primitives, binary,
    arrays/maps/structs of them; every field nullable as ["null", T] —
    the standard Spark-to-Avro shape)."""
    from pyspark.sql import types as T

    def field_type(dt, fname="item"):
        m = {
            T.BooleanType: "boolean",
            T.IntegerType: "int",
            T.LongType: "long",
            T.FloatType: "float",
            T.DoubleType: "double",
            T.BinaryType: "bytes",
            T.StringType: "string",
        }
        for k, v in m.items():
            if isinstance(dt, k):
                return v
        if isinstance(dt, T.ShortType) or isinstance(dt, T.ByteType):
            return "int"
        if isinstance(dt, T.ArrayType):
            return {
                "type": "array",
                "items": ["null", field_type(dt.elementType, fname)],
            }
        if isinstance(dt, T.MapType):
            return {
                "type": "map",
                "values": ["null", field_type(dt.valueType, fname)],
            }
        if isinstance(dt, T.StructType):
            # unique record name per field — the Avro spec forbids
            # redefining a named type, and two sibling structs sharing
            # one name make avro-tools/fastavro reject the file
            return _avro_schema_for(dt, f"{name}_{fname}")
        raise ValueError(f"no Avro mapping for Spark type {dt.simpleString()}")

    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": ["null", field_type(f.dataType, f.name)]}
            for f in spark_schema.fields
        ],
    }


def write_avro_python(df, out_dir: str, codec: str = "deflate") -> int:
    """Distributed Avro sink: each partition streams its rows into ONE
    ``part-NNNNN.avro`` container under ``out_dir`` (the shard-per-task
    pattern of the WebDataset sink) — with ``read_avro_python`` this
    closes the Avro lane in both directions without spark-avro.  Every
    column is written nullable (["null", T]); returns the file count."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    schema = _avro_schema_for(df.schema)
    names = [f["name"] for f in schema["fields"]]

    def write_part(idx, rows):
        recs = []
        for r in rows:
            d = r.asDict(recursive=True)
            recs.append(
                {
                    n: (bytes(v) if isinstance(v, bytearray) else v)
                    for n, v in ((n, d.get(n)) for n in names)
                }
            )
        if recs:
            write_avro(
                recs, schema, os.path.join(out_dir, f"part-{idx:05d}.avro"),
                codec=codec,
            )
            yield 1

    return int(df.rdd.mapPartitionsWithIndex(write_part).sum())
