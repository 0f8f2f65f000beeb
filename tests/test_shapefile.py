"""Shapefile interop: .shp/.dbf encode/parse round-trips, ring re-winding,
hole handling, the Spark read lane with its error channel, and the golden
path — the engine's own dissolve output written as a shapefile and read
back identical."""

from __future__ import annotations

import struct
import zipfile

import pytest

from species_range_data_pipeline_spark.functions.wkb import decode, wkb_area
from species_range_data_pipeline_spark.sources.shapefile import (
    encode_dbf,
    encode_shp,
    parse_dbf,
    parse_shp,
    read_shapefile,
    write_shapefile,
)

OUTER = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]  # CCW
HOLE = [(1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 1.0), (1.0, 1.0)]  # CW


def test_shp_roundtrip_with_hole_and_null():
    square = [[[(10.0, 10.0), (12.0, 10.0), (12.0, 12.0), (10.0, 12.0), (10.0, 10.0)]]]
    shapes = parse_shp(encode_shp([[[OUTER, HOLE]], square, []]))
    assert [r for r, _ in shapes] == [1, 2, 3]
    assert shapes[2][1] is None  # null shape
    assert wkb_area(shapes[0][1]) == pytest.approx(15.0)  # 16 - 1 hole
    assert wkb_area(shapes[1][1]) == pytest.approx(4.0)
    # winding restored to the WKB convention on the way back
    _, polys = decode(shapes[0][1])
    assert polys[0][0] == OUTER and polys[0][1] == HOLE


def test_shp_multipolygon_grouping_by_winding():
    """Two outer rings in ONE record -> MultiPolygon; a hole after an outer
    attaches to that outer."""
    far = [(100.0, 100.0), (101.0, 100.0), (101.0, 101.0), (100.0, 101.0), (100.0, 100.0)]
    shapes = parse_shp(encode_shp([[[OUTER, HOLE], [far]]]))
    name, polys = decode(shapes[0][1])
    assert name == "MultiPolygon" and len(polys) == 2
    assert len(polys[0]) == 2 and len(polys[1]) == 1
    assert wkb_area(shapes[0][1]) == pytest.approx(15.0 + 1.0)


def test_shp_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="file code"):
        parse_shp(b"\x00" * 100)
    with pytest.raises(ValueError, match="header too short"):
        parse_shp(b"tiny")
    # patch a record's shape type to PolyLine (3)
    blob = bytearray(encode_shp([[[OUTER]]]))
    struct.pack_into("<i", blob, 108, 3)  # first record body at 100+8
    with pytest.raises(ValueError, match="unsupported shape type 3"):
        parse_shp(bytes(blob))


def test_dbf_roundtrip_and_deleted_record():
    recs = [{"species": "abies-balsamea", "thr": "25"}, {"species": "x", "thr": "75"}]
    blob = bytearray(encode_dbf(recs))
    assert parse_dbf(bytes(blob)) == recs
    # flag record 1 deleted: header_size = 32 + 2*32 + 1.  The slot stays as
    # None — dropping it would shift record 2's attrs onto record 1's shape.
    blob[32 + 64 + 1] = ord("*")
    assert parse_dbf(bytes(blob)) == [None, recs[1]]


def test_deleted_dbf_record_does_not_shift_attrs(spark, tmp_path):
    """A .dbf with a deleted middle record must keep later attributes
    aligned with their shapes (positional pairing)."""
    sq = lambda x: [[[(x, 0.0), (x + 1.0, 0.0), (x + 1.0, 1.0), (x, 1.0), (x, 0.0)]]]
    write_shapefile(
        [(sq(0.0), {"name": "a"}), (sq(10.0), {"name": "b"}), (sq(20.0), {"name": "c"})],
        str(tmp_path / "t.shp"),
    )
    blob = bytearray((tmp_path / "t.dbf").read_bytes())
    # header: 32 + 1 field desc * 32 + 1; record 2 (index 1) deleted
    rec_size = 1 + 1  # 1-byte flag + width of the single 1-char field
    blob[32 + 32 + 1 + rec_size] = ord("*")
    (tmp_path / "t.dbf").write_bytes(bytes(blob))

    rows = sorted(read_shapefile(spark, str(tmp_path)).collect(), key=lambda r: r.record)
    assert [r.attrs["name"] if r.attrs else None for r in rows] == ["a", None, "c"]


def test_hole_first_record_grouped_by_containment():
    """A record written hole-first (CCW ring before its CW outer) must still
    attach the hole to the containing outer instead of promoting it to a
    flipped-winding standalone polygon."""
    # shapefile winding: outer CW, hole CCW — build raw rings accordingly
    outer_cw = list(reversed(OUTER))
    hole_ccw = list(reversed(HOLE))
    blob = _record_blob([hole_ccw, outer_cw])
    shapes = parse_shp(blob)
    assert wkb_area(shapes[0][1]) == pytest.approx(15.0)  # 16 outer - 1 hole
    _, polys = decode(shapes[0][1])
    assert len(polys) == 1 and len(polys[0]) == 2


def test_mid_record_out_of_order_hole_grouped_by_containment():
    """[outerA, hole-of-B, outerB]: the hole arrives before its own outer but
    after a DIFFERENT outer.  The sequential heuristic would attach it to
    outerA; any record mixing holes with multiple outers must use containment
    grouping instead."""
    outer_a_cw = list(reversed(OUTER))  # 4x4 at origin
    outer_b = [(10.0, 10.0), (14.0, 10.0), (14.0, 14.0), (10.0, 14.0), (10.0, 10.0)]
    outer_b_cw = list(reversed(outer_b))
    hole_b = [(11.0, 11.0), (11.0, 12.0), (12.0, 12.0), (12.0, 11.0), (11.0, 11.0)]
    hole_b_ccw = list(reversed(hole_b))
    shapes = parse_shp(_record_blob([outer_a_cw, hole_b_ccw, outer_b_cw]))
    name, polys = decode(shapes[0][1])
    assert name == "MultiPolygon" and len(polys) == 2
    by_first = {p[0][0]: p for p in polys}
    assert len(by_first[(0.0, 0.0)]) == 1  # A keeps no hole
    assert len(by_first[(10.0, 10.0)]) == 2  # B gets its hole back
    assert wkb_area(shapes[0][1]) == pytest.approx(16.0 + 16.0 - 1.0)


def test_encode_dbf_roundtrips_deleted_none_slots():
    """A read->write cycle of a .dbf holding deleted (None) slots must write
    an empty record in place, preserving positional alignment."""
    recs = [{"n": "a"}, None, {"n": "c"}]
    back = parse_dbf(encode_dbf(recs))
    assert back == [{"n": "a"}, {"n": ""}, {"n": "c"}]
    assert parse_dbf(encode_dbf([None, None])) == [{}, {}]


def test_only_hole_rings_error():
    with pytest.raises(ValueError, match="only hole-wound rings"):
        parse_shp(_record_blob([list(reversed(HOLE))]))


def _record_blob(raw_rings):
    """Hand-pack one Polygon record from raw shapefile-winding rings."""
    n_points = sum(len(r) for r in raw_rings)
    body = struct.pack("<i4d", 5, 0.0, 0.0, 0.0, 0.0)
    body += struct.pack("<ii", len(raw_rings), n_points)
    off = 0
    for r in raw_rings:
        body += struct.pack("<i", off)
        off += len(r)
    for r in raw_rings:
        for x, y in r:
            body += struct.pack("<dd", x, y)
    rec = struct.pack(">ii", 1, len(body) // 2) + body
    header = struct.pack(">i5ii", 9994, 0, 0, 0, 0, 0, (100 + len(rec)) // 2)
    header += struct.pack("<ii", 1000, 5) + struct.pack("<8d", *([0.0] * 8))
    return header + rec


def test_shx_prj_sidecars(tmp_path):
    """write_shapefile emits a fixed-stride .shx whose offsets address every
    record in the .shp, and a WGS84 .prj — what fiona/GeoPandas require
    (species_range_etl.py:131-132)."""
    sq = lambda x: [[[(x, 0.0), (x + 2.0, 0.0), (x + 2.0, 2.0), (x, 2.0), (x, 0.0)]]]
    write_shapefile(
        [(sq(0.0), {"n": "a"}), ([[OUTER, HOLE]], {"n": "b"}), ([], {"n": "c"})],
        str(tmp_path / "t.shp"),
    )
    shp = (tmp_path / "t.shp").read_bytes()
    shx = (tmp_path / "t.shx").read_bytes()
    prj = (tmp_path / "t.prj").read_text()
    assert prj.startswith('GEOGCS["GCS_WGS_1984"') and "298.257223563" in prj
    # .shx: 100-byte header + 8 bytes per record; file length recorded in words
    assert len(shx) == 100 + 8 * 3
    (shx_len_words,) = struct.unpack_from(">i", shx, 24)
    assert shx_len_words * 2 == len(shx)
    # headers agree except for file length; bbox identical
    assert shx[32:100] == shp[32:100]
    # each index entry addresses a real record: header (recno, content_words)
    # at byte offset*2, and content_words matches the .shp record header
    for i in range(3):
        off_words, content_words = struct.unpack_from(">ii", shx, 100 + 8 * i)
        recno, shp_words = struct.unpack_from(">ii", shp, off_words * 2)
        assert recno == i + 1 and shp_words == content_words
    # last entry reaches exactly the end of the .shp
    off_words, content_words = struct.unpack_from(">ii", shx, 100 + 16)
    assert (off_words + 4 + content_words) * 2 == len(shp)


def test_spark_read_lane_attrs_and_error_channel(spark, tmp_path):
    write_shapefile(
        [([[OUTER, HOLE]], {"species": "abies", "thr": "25"}),
         ([[[(5.0, 5.0), (6.0, 5.0), (6.0, 6.0), (5.0, 6.0), (5.0, 5.0)]]],
          {"species": "acer", "thr": "50"})],
        str(tmp_path / "good.shp"),
    )
    (tmp_path / "broken.shp").write_bytes(b"\x00" * 128)

    rows = read_shapefile(spark, str(tmp_path)).collect()
    good = sorted(
        (r for r in rows if r.error is None), key=lambda r: r.record
    )
    bad = [r for r in rows if r.error is not None]
    assert len(good) == 2 and len(bad) == 1
    assert "ValueError" in bad[0].error and bad[0].path.endswith("broken.shp")
    assert good[0].attrs == {"species": "abies", "thr": "25"}
    assert good[1].attrs == {"species": "acer", "thr": "50"}
    assert wkb_area(bytes(good[0].geometry)) == pytest.approx(15.0)
    assert wkb_area(bytes(good[1].geometry)) == pytest.approx(1.0)


def test_dissolve_output_roundtrips_through_shapefile(spark, tmp_path):
    """Golden interop: run the species pipeline, write its speciesdata rows
    as a .shp/.dbf pair, read them back through the Spark lane, and get the
    SAME geometries (byte-identical WKB) and attributes — i.e. a
    GeoDataFrame consumer of the reference could hand its artifacts to this
    engine and vice versa (species_range_etl.py:131,199)."""
    from species_range_data_pipeline_spark.pipeline.species import (
        load_cells_from_zips,
        run_pipeline,
    )

    from .test_pipeline import SPECIES_FILES, _asc_bytes, _grid

    d = tmp_path / "zips"
    d.mkdir()
    with zipfile.ZipFile(d / "a.zip", "w") as zf:
        for name, seed in SPECIES_FILES.items():
            zf.writestr(name, _asc_bytes(_grid(seed)))
    cells, _ = load_cells_from_zips(spark, str(d))
    out = run_pipeline(cells).orderBy("sid").collect()

    write_shapefile(
        [
            (decode(bytes(r.geometry))[1],
             {"species": r.species, "threshold": r.threshold,
              "source": r.source, "year": r.year, "scenario": r.scenario})
            for r in out
        ],
        str(tmp_path / "speciesdata.shp"),
    )

    back = sorted(
        read_shapefile(spark, str(tmp_path)).collect(), key=lambda r: r.record
    )
    assert len(back) == len(out) and all(r.error is None for r in back)
    for orig, rt in zip(out, back):
        assert rt.attrs["species"] == orig.species
        assert rt.attrs["threshold"] == orig.threshold
        assert wkb_area(bytes(rt.geometry)) == pytest.approx(orig.area)
        # ring-level identity, not just area
        assert decode(bytes(rt.geometry))[1] == decode(bytes(orig.geometry))[1]


def _square(x0, y0, side, cw):
    ring = [
        (x0, y0), (x0 + side, y0), (x0 + side, y0 + side), (x0, y0 + side),
        (x0, y0),
    ]
    return list(reversed(ring)) if cw else ring


def test_island_in_lake_chain_groups_by_smallest_outer():
    """outer O1 > hole H1 > island O2 > pond H2, all concentric: H1 must
    attach to O1 and H2 to the SMALLEST containing outer (O2, not O1) —
    the nesting case where 'any containing outer' silently over-subtracts."""
    o1 = _square(0.0, 0.0, 16.0, cw=True)
    h1 = _square(2.0, 2.0, 12.0, cw=False)
    o2 = _square(4.0, 4.0, 8.0, cw=True)
    h2 = _square(6.0, 6.0, 4.0, cw=False)
    # hostile order: holes before their outers, island before the lake ring
    shapes = parse_shp(_record_blob([h2, o2, h1, o1]))
    name, polys = decode(shapes[0][1])
    assert name == "MultiPolygon" and len(polys) == 2
    sizes = sorted(
        (max(x for x, _ in p[0]) - min(x for x, _ in p[0]), len(p) - 1)
        for p in polys
    )
    assert sizes == [(8.0, 1), (16.0, 1)]  # each outer got exactly its hole
    assert wkb_area(shapes[0][1]) == pytest.approx(
        (16.0**2 - 12.0**2) + (8.0**2 - 4.0**2)
    )


def test_fuzzed_multi_outer_interleaved_holes_never_misattach():
    """Adversarial corpus: random disjoint outers with 0-2 holes each, ring
    order fully shuffled (holes can precede any outer, interleave across
    polygons, etc.).  The expected hole->outer assignment comes from the
    CONSTRUCTION (each hole is built strictly inside exactly one outer),
    not from the parser's own containment code, so any mis-attachment —
    however the shuffle lands — fails the vertex-set comparison."""
    import random

    rng = random.Random(20260814)
    for trial in range(60):
        n_outer = rng.randint(1, 4)
        cells = rng.sample(range(9), n_outer)  # disjoint 3x3 macro-grid
        outers, holes_of = [], []
        for cell in cells:
            gx, gy = (cell % 3) * 20.0, (cell // 3) * 20.0
            outers.append(_square(gx, gy, 8.0, cw=True))
            hs = []
            for sub in rng.sample(range(4), rng.randint(0, 2)):
                hx = gx + 1.0 + (sub % 2) * 4.0
                hy = gy + 1.0 + (sub // 2) * 4.0
                hs.append(_square(hx, hy, 2.0, cw=False))
            holes_of.append(hs)
        rings = list(outers) + [h for hs in holes_of for h in hs]
        rng.shuffle(rings)
        shapes = parse_shp(_record_blob(rings))
        _, polys = decode(shapes[0][1])
        assert len(polys) == len(outers), trial
        got = {
            frozenset(p[0]): {frozenset(r) for r in p[1:]} for p in polys
        }
        want = {
            frozenset(o): {frozenset(h) for h in hs}
            for o, hs in zip(outers, holes_of)
        }
        assert got == want, trial
        assert wkb_area(shapes[0][1]) == pytest.approx(
            64.0 * len(outers) - 4.0 * sum(len(h) for h in holes_of)
        ), trial
