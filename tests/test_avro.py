"""Pure-Python Avro OCF lane: binary encode/decode round trips across the
type surface, deflate blocks, container-level guards, and the Spark read
lane with its error channel — the lane that replaces the spark-avro JVM
gate in this environment."""

from __future__ import annotations

import pytest

from species_range_data_pipeline_spark.sources.avro_ocf import (
    parse_avro,
    read_avro_python,
    write_avro,
)

SCHEMA = {
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "title", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "blob", "type": "bytes"},
        {"name": "maybe", "type": ["null", "string"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "long"}},
        {
            "name": "kind",
            "type": {"type": "enum", "name": "Kind", "symbols": ["A", "B"]},
        },
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "Inner",
                "fields": [{"name": "x", "type": "int"}],
            },
        },
    ],
}


def _records(n=5):
    return [
        {
            "id": i,
            "title": f"doc {i} é",
            "score": i * 1.5,
            "ok": i % 2 == 0,
            "blob": bytes([i, 255 - i]),
            "maybe": None if i % 3 == 0 else f"m{i}",
            "tags": [f"t{j}" for j in range(i % 4)],
            "props": {"k": i, "z": -i},
            "kind": "A" if i % 2 else "B",
            "nested": {"x": i * 7},
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy"])
def test_avro_roundtrip_all_types(tmp_path, codec):
    recs = _records(7)
    p = str(tmp_path / "t.avro")
    write_avro(recs, SCHEMA, p, codec=codec)
    schema, back = parse_avro((tmp_path / "t.avro").read_bytes())
    assert schema["name"] == "Doc"
    assert back == recs  # exact: ints, doubles, bytes, unions, nesting

    # zigzag edge values survive
    edge = [
        {**recs[0], "id": v}
        for v in (0, -1, 1, 2**62, -(2**62), 63, -64)
    ]
    write_avro(edge, SCHEMA, p, codec=codec)
    _, back2 = parse_avro((tmp_path / "t.avro").read_bytes())
    assert [r["id"] for r in back2] == [r["id"] for r in edge]


def test_avro_container_guards(tmp_path):
    with pytest.raises(ValueError, match="magic"):
        parse_avro(b"NOPE" + b"\x00" * 30)
    p = str(tmp_path / "t.avro")
    write_avro(_records(3), SCHEMA, p)
    blob = bytearray((tmp_path / "t.avro").read_bytes())
    with pytest.raises(ValueError):
        parse_avro(bytes(blob[:-10]))  # truncated final block/sync
    blob[-1] ^= 0xFF  # corrupt the trailing sync marker
    with pytest.raises(ValueError, match="sync"):
        parse_avro(bytes(blob))


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy"])
def test_avro_fuzz_contract(tmp_path, codec):
    import random

    p = str(tmp_path / "t.avro")
    write_avro(_records(4), SCHEMA, p, codec=codec)
    blob = (tmp_path / "t.avro").read_bytes()
    rng = random.Random(77)
    for _ in range(150):
        trunc = blob[: rng.randrange(len(blob))]
        try:
            parse_avro(trunc)
        except (ValueError, NotImplementedError):
            pass
        flipped = bytearray(blob)
        for _ in range(rng.randrange(1, 6)):
            flipped[rng.randrange(len(flipped))] = rng.randrange(256)
        try:
            parse_avro(bytes(flipped))
        except (ValueError, NotImplementedError):
            pass


def test_read_avro_python_spark_lane(spark, tmp_path):
    """One row per record; flat primitives native, nested values as JSON
    strings; a corrupt file becomes an error row."""
    write_avro(_records(6), SCHEMA, str(tmp_path / "a.avro"))
    write_avro(_records(2), SCHEMA, str(tmp_path / "b.avro"), codec="null")
    (tmp_path / "c.avro").write_bytes(b"Obj\x01" + b"\x99" * 20)
    df = read_avro_python(spark, str(tmp_path)).cache()
    ok = df.where("error IS NULL")
    assert ok.count() == 8
    r = ok.where("id = 5 AND path LIKE '%a.avro'").first()
    assert r.title == "doc 5 é" and r.ok is False and r.score == 7.5
    assert r.maybe == "m5"
    import json as _json

    assert _json.loads(r.tags) == ["t0"]
    assert _json.loads(r.nested) == {"x": 35}
    bad = df.where("error IS NOT NULL").collect()
    assert len(bad) == 1 and "c.avro" in bad[0]["path"]
    df.unpersist()


def test_avro_zero_byte_item_bomb_fails_fast(tmp_path):
    """A crafted array-of-null with a huge block count must be rejected by
    the input-size budget, not decoded (zero bytes consumed per item =
    unbounded memory/time otherwise)."""
    import io
    import time

    from species_range_data_pipeline_spark.sources.avro_ocf import (
        _MAGIC,
        _write_long,
    )

    schema = {
        "type": "record",
        "name": "R",
        "fields": [{"name": "a", "type": {"type": "array", "items": "null"}}],
    }
    import json as _json

    out = bytearray(_MAGIC)
    meta = {"avro.schema": _json.dumps(schema).encode(), "avro.codec": b"null"}
    _write_long(out, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        _write_long(out, len(kb))
        out += kb
        _write_long(out, len(v))
        out += v
    _write_long(out, 0)
    out += b"S" * 16
    body = bytearray()
    _write_long(body, 10**9)  # one array block claiming a billion nulls
    _write_long(out, 1)       # record count
    _write_long(out, len(body))
    out += body
    out += b"S" * 16
    t0 = time.time()
    with pytest.raises(ValueError, match="budget"):
        parse_avro(bytes(out))
    assert time.time() - t0 < 2.0


def test_avro_enum_fixed_and_multibranch_union_columns(spark, tmp_path):
    """Spark-lane typing: enum surfaces as its bare symbol (not
    JSON-quoted), fixed as native binary, and a multi-branch union is
    JSON-carried so mixed Python types can't poison an Arrow column."""
    schema = {
        "type": "record",
        "name": "M",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "kind", "type": {"type": "enum", "name": "K",
                                      "symbols": ["A", "B"]}},
            {"name": "uid", "type": {"type": "fixed", "name": "U", "size": 4}},
            {"name": "v", "type": ["null", "long", "string"]},
        ],
    }
    recs = [
        {"id": 1, "kind": "A", "uid": b"abcd", "v": 5},
        {"id": 2, "kind": "B", "uid": b"\x00\x01\x02\x03", "v": "x"},
        {"id": 3, "kind": "A", "uid": b"zzzz", "v": None},
    ]
    write_avro(recs, schema, str(tmp_path / "m.avro"))
    df = read_avro_python(spark, str(tmp_path))
    rows = {r.id: r for r in df.where("error IS NULL").collect()}
    assert rows[1].kind == "A" and rows[2].kind == "B"  # bare symbols
    assert bytes(rows[1].uid) == b"abcd"                # native binary
    assert rows[1].v == "5" and rows[2].v == '"x"'      # JSON-carried union
    assert rows[3].v is None


def test_write_avro_python_distributed_roundtrip(spark, tmp_path):
    """Distributed write (one container per partition) -> Spark-lane read
    returns exactly the source rows, nullable unions and binary intact."""
    df = spark.range(0, 500).selectExpr(
        "id",
        "concat('name_', id) AS name",
        "IF(id % 7 = 0, NULL, CAST(id * 1.5 AS double)) AS score",
        "CAST(concat('b', id) AS binary) AS payload",
    ).repartition(4)
    out = str(tmp_path / "out")
    from species_range_data_pipeline_spark.sources.avro_ocf import (
        write_avro_python,
    )

    n_files = write_avro_python(df, out)
    assert n_files == 4
    back = read_avro_python(spark, out).where("error IS NULL")
    assert back.count() == 500
    rows = {r.id: r for r in back.collect()}
    assert rows[1].name == "name_1" and abs(rows[1].score - 1.5) < 1e-9
    assert rows[7].score is None
    assert bytes(rows[3].payload) == b"b3"


def test_avro_snappy_codec_roundtrip(tmp_path):
    """Snappy-coded OCF (the wild default for many writers) decodes via
    the pure-Python snappy codec, CRC verified; a corrupted CRC and a
    corrupted body both refuse loudly."""
    import struct as _struct

    from species_range_data_pipeline_spark.sources.avro_ocf import (
        parse_avro,
        write_avro,
    )

    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
        ],
    }
    records = [{"id": i, "name": f"row-{i}" * 3} for i in range(200)]
    path = str(tmp_path / "s.avro")
    write_avro(records, schema, path, codec="snappy")
    blob = open(path, "rb").read()
    got_schema, got = parse_avro(blob)
    assert got == records

    # flip one byte inside the snappy body: CRC (or the frame) must catch it
    bad = bytearray(blob)
    bad[-30] ^= 0xFF
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_avro(bytes(bad))
