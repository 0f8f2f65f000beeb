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


@pytest.mark.parametrize("codec", ["null", "deflate"])
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


def test_avro_fuzz_contract(tmp_path):
    import random

    p = str(tmp_path / "t.avro")
    write_avro(_records(4), SCHEMA, p)
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
