"""Delta deletion-vector codec (`sources/dv.py`): Z85, the 64-bit
RoaringBitmapArray portable serialization, and the DV file wrapper.

The decoder is load-bearing (wrong decode = wrong rows), so it gets
the in-tree codec discipline: hypothesis round-trips against the
encode twin, a hand-built run-container fixture (the encode twin never
emits runs), and a corrupt-input gauntlet asserting loud errors —
never silent wrong positions.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from species_range_data_pipeline_spark.sources.dv import (
    _MAGIC,
    decode_rbm_array,
    dv_positions,
    encode_rbm_array,
    load_dv_bytes,
    make_inline_descriptor,
    make_uuid_descriptor,
    write_dv_file,
    z85_decode,
    z85_encode,
)


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=2**16),  # dense low range
            st.integers(min_value=0, max_value=2**33),  # multi-bitmap
        ),
        max_size=400,
    )
)
def test_rbm_array_roundtrip(positions):
    dec = decode_rbm_array(encode_rbm_array(positions))
    assert dec.tolist() == sorted({int(p) for p in positions})


def test_bitmap_container_roundtrip():
    """> 4096 values in one 16-bit key space forces the 8 KiB bitmap
    container encoding."""
    vals = list(range(0, 60000, 7)) + [65535]
    dec = decode_rbm_array(encode_rbm_array(vals))
    assert dec.tolist() == sorted(set(vals))


def test_run_container_decode():
    """Hand-built SERIAL_COOKIE bitmap with one run container
    ([5..8] = start 5, length-1 3) — the encode twin never emits runs,
    so the run path needs its own fixture."""
    bm32 = (
        struct.pack("<I", 12347)  # run cookie, (n-1)=0 in the high bits
        + b"\x01"  # run flags: container 0 is a run container
        + struct.pack("<HH", 0, 3)  # key 0, cardinality-1 = 3
        + struct.pack("<H", 1)  # one run
        + struct.pack("<HH", 5, 3)  # start 5, length-1 = 3
    )
    data = struct.pack("<iq", _MAGIC, 1) + bm32
    assert decode_rbm_array(data).tolist() == [5, 6, 7, 8]


def test_z85_roundtrip_and_errors():
    import uuid

    for _ in range(20):
        b = uuid.uuid4().bytes
        assert z85_decode(z85_encode(b)) == b
    with pytest.raises(ValueError, match="multiple of 5"):
        z85_decode("abc")
    with pytest.raises(ValueError, match="invalid Z85"):
        z85_decode('"""""')
    with pytest.raises(ValueError, match="multiple of 4"):
        z85_encode(b"abc")


@settings(max_examples=80, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**20), max_size=200),
    st.integers(min_value=0, max_value=60),
)
def test_truncation_never_silently_decodes(positions, cut):
    """Any strict prefix of a valid serialization raises — it never
    returns a (necessarily wrong) position set."""
    blob = encode_rbm_array(positions)
    cut = min(cut, len(blob) - 1) if len(blob) else 0
    with pytest.raises(ValueError):
        decode_rbm_array(blob[:cut])


def test_corrupt_inputs_raise():
    good = encode_rbm_array([1, 2, 3])
    with pytest.raises(ValueError, match="magic"):
        decode_rbm_array(b"\x00\x00\x00\x00" + good[4:])
    with pytest.raises(ValueError, match="trailing"):
        decode_rbm_array(good + b"\x00")
    # bad container cookie
    bad = bytearray(good)
    bad[12] = 0xFF
    with pytest.raises(ValueError, match="cookie"):
        decode_rbm_array(bytes(bad))


def test_dv_file_wrapper_and_descriptors(tmp_path):
    root = str(tmp_path)
    d = make_uuid_descriptor(root, [3, 1, 4, 1, 5], prefix="ab")
    assert d["cardinality"] == 4
    assert dv_positions(root, d).tolist() == [1, 3, 4, 5]

    inline = make_inline_descriptor([10, 2**32 + 7])
    assert dv_positions(root, inline).tolist() == [10, 2**32 + 7]

    # multiple DVs in one file, addressed by offset
    bms = [encode_rbm_array([1]), encode_rbm_array([2, 3])]
    spans = write_dv_file(str(tmp_path / "multi.bin"), bms)
    for (off, size), expect in zip(spans, ([1], [2, 3])):
        desc = {
            "storageType": "p",
            "pathOrInlineDv": str(tmp_path / "multi.bin"),
            "offset": off,
            "sizeInBytes": size,
            "cardinality": len(expect),
        }
        assert dv_positions(root, desc).tolist() == expect


def test_dv_file_corruption_is_loud(tmp_path):
    root = str(tmp_path)
    d = make_uuid_descriptor(root, [1, 2, 3])
    import os

    (dv_file,) = [
        os.path.join(root, n)
        for n in os.listdir(root)
        if n.startswith("deletion_vector_")
    ]
    blob = bytearray(open(dv_file, "rb").read())

    # flipped payload byte -> CRC mismatch
    blob2 = bytearray(blob)
    blob2[10] ^= 0xFF
    open(dv_file, "wb").write(bytes(blob2))
    with pytest.raises(ValueError, match="checksum"):
        load_dv_bytes(root, d)

    # wrong format version byte
    blob3 = bytearray(blob)
    blob3[0] = 2
    open(dv_file, "wb").write(bytes(blob3))
    with pytest.raises(ValueError, match="format version"):
        load_dv_bytes(root, d)

    # size disagreeing with the descriptor
    open(dv_file, "wb").write(bytes(blob))
    d_bad = dict(d, sizeInBytes=d["sizeInBytes"] + 1)
    with pytest.raises(ValueError, match="sizeInBytes"):
        load_dv_bytes(root, d_bad)

    # cardinality disagreeing with the bitmap
    d_card = dict(d, cardinality=99)
    with pytest.raises(ValueError, match="cardinality"):
        dv_positions(root, d_card)

    # unknown storage type / non-local path
    with pytest.raises(NotImplementedError, match="storageType"):
        load_dv_bytes(root, {"storageType": "z", "pathOrInlineDv": "x"})
    with pytest.raises(NotImplementedError, match="non-local"):
        load_dv_bytes(
            root,
            {"storageType": "p", "pathOrInlineDv": "s3://b/f.bin"},
        )


def test_inline_size_bounds():
    inline = make_inline_descriptor([5])
    bad = dict(inline, sizeInBytes=10**6)
    with pytest.raises(ValueError, match="exceeds decoded payload"):
        load_dv_bytes("/nonexistent", bad)
