"""WARC lane: record framing (plain + per-record-gzip), HTTP payload
splitting, the Spark read lane with its error channel, HTML text
extraction, and the WARC -> documents corpus composition."""

from __future__ import annotations

import gzip

import pytest

from species_range_data_pipeline_spark.functions.html import html_to_text
from species_range_data_pipeline_spark.sources.warc import (
    parse_warc,
    read_warc,
    warc_responses_to_documents,
)

HTML_A = (
    b"<html><head><title>T</title><style>body{x}</style>"
    b"<script>var a=1;</script></head>"
    b"<body><h1>Maple &amp; Fir</h1><p>Ranges  shift</p>"
    b"<!-- hidden --><div>north</div></body></html>"
)


def _record(warc_type: str, url: str | None, block: bytes, extra: str = "") -> bytes:
    h = f"WARC/1.0\r\nWARC-Type: {warc_type}\r\n"
    if url:
        h += f"WARC-Target-URI: {url}\r\n"
    h += "WARC-Date: 2024-01-01T00:00:00Z\r\n"
    h += extra
    h += f"Content-Length: {len(block)}\r\n\r\n"
    return h.encode() + block + b"\r\n\r\n"


def _http_response(body: bytes, status: int = 200, ctype: str = "text/html") -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def make_warc() -> bytes:
    return (
        _record(
            "warcinfo", None, b"software: test\r\n",
            extra="Content-Type: application/warc-fields\r\n",
        )
        + _record(
            "request", "http://a.example/page",
            b"GET /page HTTP/1.1\r\nHost: a.example\r\n\r\n",
            extra="Content-Type: application/http;msgtype=request\r\n",
        )
        + _record(
            "response", "http://a.example/page", _http_response(HTML_A),
            extra="Content-Type: application/http;msgtype=response\r\n",
        )
        + _record(
            "response", "http://b.example/404",
            _http_response(b"gone", status=404, ctype="text/plain"),
            extra="Content-Type: application/http;msgtype=response\r\n",
        )
    )


def make_warc_gz() -> bytes:
    # per-record gzip members, the Common Crawl framing
    recs = [
        _record(
            "response", "http://c.example/x",
            _http_response(b"<p>hello</p><p>world</p>"),
            extra="Content-Type: application/http;msgtype=response\r\n",
        ),
        _record(
            "response", "http://d.example/y",
            _http_response(b"\xff\xfebinary", ctype="image/png"),
            extra="Content-Type: application/http;msgtype=response\r\n",
        ),
    ]
    return b"".join(gzip.compress(r) for r in recs)


def test_parse_warc_plain_splits_http_payload():
    rows = parse_warc(make_warc())
    assert [r["warc_type"] for r in rows] == [
        "warcinfo", "request", "response", "response",
    ]
    resp = rows[2]
    assert resp["url"] == "http://a.example/page"
    assert resp["http_status"] == 200
    assert resp["mime"] == "text/html"
    assert resp["payload"] == HTML_A  # HTTP headers stripped, body exact
    assert rows[3]["http_status"] == 404
    assert rows[3]["mime"] == "text/plain"


def test_parse_warc_gz_member_framing():
    rows = parse_warc(make_warc_gz())
    assert [r["url"] for r in rows] == ["http://c.example/x", "http://d.example/y"]
    assert rows[0]["payload"] == b"<p>hello</p><p>world</p>"
    assert rows[1]["mime"] == "image/png"
    with pytest.raises(ValueError, match="gzip member"):
        parse_warc(make_warc_gz()[:30])


def test_html_to_text_rules():
    txt = html_to_text(HTML_A.decode())
    assert "var a=1" not in txt and "body{x}" not in txt  # script/style gone
    assert "hidden" not in txt  # comments gone
    assert "Maple & Fir" in txt  # entities decoded
    # block tags break words apart; whitespace collapsed per line
    assert "Ranges shift" in txt
    assert "shiftnorth" not in txt.replace("\n", " ")
    assert "shift\nnorth" in txt  # block boundary became a line break
    assert html_to_text(None) is None
    assert html_to_text("<br>") == ""


def test_read_warc_spark_lane_and_error_channel(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(make_warc())
    (tmp_path / "b.warc.gz").write_bytes(make_warc_gz())
    (tmp_path / "c.warc.gz").write_bytes(b"\x1f\x8b" + b"\x00" * 16)  # corrupt
    df = read_warc(spark, str(tmp_path)).cache()
    ok = df.where("error IS NULL")
    assert ok.count() == 6
    assert ok.where("warc_type = 'response'").count() == 4
    bad = df.where("error IS NOT NULL").collect()
    assert len(bad) == 1 and "c.warc.gz" in bad[0]["path"]
    body = ok.where("url = 'http://a.example/page' AND warc_type = 'response'").first()
    assert bytes(body["payload"]) == HTML_A
    df.unpersist()


def test_warc_to_documents_composition(spark, tmp_path):
    """WARC -> documents-shaped table: only 200 text/html responses
    survive, text is extracted, doc_id is the stable URL hash."""
    (tmp_path / "a.warc").write_bytes(make_warc())
    (tmp_path / "b.warc.gz").write_bytes(make_warc_gz())
    docs = warc_responses_to_documents(read_warc(spark, str(tmp_path)))
    rows = {r.url: r for r in docs.collect()}
    # 404 and image/png filtered out; 2 html pages remain
    assert set(rows) == {"http://a.example/page", "http://c.example/x"}
    assert "Maple & Fir" in rows["http://a.example/page"].text
    assert rows["http://c.example/x"].text == "hello\nworld"
    assert all(r.doc_id is not None for r in rows.values())
    # doc_id stable across re-reads
    again = {r.url: r.doc_id for r in
             warc_responses_to_documents(read_warc(spark, str(tmp_path))).collect()}
    assert again == {u: r.doc_id for u, r in rows.items()}


def test_url_functions(spark):
    """Host / registered-domain / canonicalization column functions."""
    from pyspark.sql import functions as F

    from species_range_data_pipeline_spark.functions.url import (
        url_host,
        url_normalize,
        url_registered_domain,
    )

    cases = [
        ("HTTP://WWW.Example.COM:80/Path/x#frag", "www.example.com",
         "example.com", "http://www.example.com/Path/x"),
        ("https://a.b.co.uk:443/?q=1&b=2", "a.b.co.uk",
         "b.co.uk", "https://a.b.co.uk/?q=1&b=2"),
        ("https://deep.sub.example.org:8443/p", "deep.sub.example.org",
         "example.org", "https://deep.sub.example.org:8443/p"),
        ("http://example.com", "example.com", "example.com",
         "http://example.com/"),
        ("http://user.github.io/proj", "user.github.io",
         "user.github.io", "http://user.github.io/proj"),
        ("not a url", None, None, None),
    ]
    df = spark.createDataFrame([(u,) for u, *_ in cases], "url string").select(
        "url",
        url_host(F.col("url")).alias("h"),
        url_registered_domain(F.col("url")).alias("d"),
        url_normalize(F.col("url")).alias("n"),
    )
    got = {r.url: (r.h, r.d, r.n) for r in df.collect()}
    for u, h, d, n in cases:
        assert got[u] == (h, d, n), (u, got[u], (h, d, n))


def test_warc_documents_carry_url_columns(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(make_warc())
    docs = warc_responses_to_documents(read_warc(spark, str(tmp_path)))
    r = docs.first()
    assert r.host == "a.example" and r.domain == "a.example"
    assert r.url_canonical == "http://a.example/page"


def test_plain_warc_truncation_raises_like_gzip():
    """A plain .warc whose final record's declared Content-Length runs
    past EOF must raise (the gzip path already does) — a partial
    download must not pass as clean data."""
    whole = make_warc()
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(whole[:-30])


def test_content_encoded_bodies_are_decoded():
    """Crawlers archive wire bytes: gzip / raw-deflate / zlib-deflate
    bodies decode transparently; a corrupt stream degrades to raw bytes
    (one rotten response must not fail the archive)."""
    import zlib

    body = b"<p>compressed page</p>"
    variants = [
        ("gzip", gzip.compress(body)),
        ("deflate", zlib.compress(body)),            # zlib-wrapped
        ("deflate", zlib.compress(body)[2:-4]),      # raw-deflate (wild web)
    ]
    for enc, wire in variants:
        http = (
            f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            f"Content-Encoding: {enc}\r\n\r\n"
        ).encode() + wire
        rec = _record(
            "response", "http://z.example/e", http,
            extra="Content-Type: application/http;msgtype=response\r\n",
        )
        rows = parse_warc(rec)
        assert rows[0]["payload"] == body, enc
    # corrupt stream: raw bytes pass through, no exception
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + b"\x99" * 20
    )
    rows = parse_warc(_record("response", "http://z.example/bad", http))
    assert rows[0]["payload"] == b"\x99" * 20


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_body = st.binary(min_size=0, max_size=300)
_rec_kind = st.sampled_from(["metadata", "request", "response"])
_enc = st.sampled_from([None, "gzip", "deflate"])


@settings(max_examples=40, deadline=None)
@given(recs=st.lists(st.tuples(_rec_kind, _body, _enc), min_size=1, max_size=6))
def test_warc_roundtrip_property_plain_and_gz(recs):
    """ANY synthesized record sequence survives both framings: plain and
    per-record-gzip parse to the same rows, record count is exact, and
    response bodies come back byte-identical (through Content-Encoding
    when present)."""
    import zlib as _z

    raws = []
    for kind, body, enc in recs:
        if kind == "response":
            hdr = b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
            wire = body
            if enc == "gzip":
                hdr += b"Content-Encoding: gzip\r\n"
                wire = gzip.compress(body)
            elif enc == "deflate":
                hdr += b"Content-Encoding: deflate\r\n"
                wire = _z.compress(body)
            block = hdr + b"\r\n" + wire
        else:
            block = body
        raws.append(_record(kind, "http://p.example/x", block))
    plain = parse_warc(b"".join(raws))
    gzed = parse_warc(b"".join(gzip.compress(r) for r in raws))
    assert len(plain) == len(gzed) == len(recs)
    for (kind, body, enc), p, g in zip(recs, plain, gzed):
        assert p["warc_type"] == g["warc_type"] == kind
        if kind == "response":
            assert p["payload"] == body, (enc, p["payload"], body)
        assert p["payload"] == g["payload"]


def test_multi_member_gzip_body_fully_decoded():
    """gzip Content-Encoding bodies may hold CONCATENATED members; every
    member must decode (first-member-only would silently truncate)."""
    wire = gzip.compress(b"<p>first</p>") + gzip.compress(b"<p>second</p>")
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + wire
    )
    rows = parse_warc(_record("response", "http://m.example/x", http))
    assert rows[0]["payload"] == b"<p>first</p><p>second</p>"


def test_crawl_to_corpus_to_table_composition(spark, tmp_path):
    """The README's stage-0 claim, end to end: WARC archives -> extracted
    documents (text + URL columns) -> atomic manifest publish with a
    doc_id bloom -> point-lookup file pruning -> a second crawl batch
    appends -> a downstream consumer tails ONLY the new commit through
    the streaming source."""
    from species_range_data_pipeline_spark.sources.manifest_stream import (
        ManifestStreamReader,
    )
    from species_range_data_pipeline_spark.sources.manifest_table import (
        manifest_scan_files,
        table_schema,
        write_manifest_table,
    )

    crawl1 = tmp_path / "crawl1"
    crawl1.mkdir()
    (crawl1 / "a.warc").write_bytes(make_warc())
    (crawl1 / "b.warc.gz").write_bytes(make_warc_gz())
    docs1 = warc_responses_to_documents(read_warc(spark, str(crawl1)))
    tbl = str(tmp_path / "corpus")
    write_manifest_table(docs1.coalesce(1), tbl, index_columns=["doc_id"])

    crawl2 = tmp_path / "crawl2"
    crawl2.mkdir()
    body = b"<html><body><p>Second crawl page</p></body></html>"
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    (crawl2 / "c.warc").write_bytes(
        _record("response", "http://n.example/new", http)
    )
    docs2 = warc_responses_to_documents(read_warc(spark, str(crawl2)))
    write_manifest_table(docs2.coalesce(1), tbl)

    # point lookup prunes to one file via the bloom index
    known = docs1.select("doc_id").first().doc_id
    assert len(manifest_scan_files(tbl, filters=[("doc_id", "=", known)])) == 1

    # a consumer that already processed v0 tails exactly the new commit
    reader = ManifestStreamReader({"path": tbl}, table_schema(tbl))
    parts = reader.partitions({"version": 0}, reader.latestOffset())
    urls = [
        u for p in parts for b in reader.read(p) for u in b.to_pydict()["url"]
    ]
    assert urls == ["http://n.example/new"]


def test_write_warc_corpus_roundtrip_deterministic_and_atomic(spark, tmp_path):
    """r10 encode twin: the distributed .warc.gz writer round-trips
    byte-exactly through read_warc, re-renders byte-identical shards
    (gzip mtime pinned to 0 — a speculative duplicate republishes the
    same bytes), and leaves no stage files behind."""
    import glob
    import os

    from species_range_data_pipeline_spark.sources.warc import (
        read_warc,
        write_warc_corpus,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"text {i} é\n with bytes") for i in range(37)],
        "doc_id long, text string",
    ).select(
        F.concat(F.lit("https://x.example/d/"), "doc_id").alias("url"),
        F.encode("text", "UTF-8").alias("body"),
    )
    out1, out2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    m1 = write_warc_corpus(docs, out1).collect()
    m2 = write_warc_corpus(docs, out2).collect()
    assert sum(r.n_records for r in m1) == 37
    # deterministic re-render: same shard names, byte-identical content
    for r in sorted(m1, key=lambda r: r.path):
        twin = os.path.join(out2, os.path.basename(r.path))
        assert open(r.path, "rb").read() == open(twin, "rb").read()
    assert not glob.glob(os.path.join(out1, "*__stage*"))  # atomic publish
    back = read_warc(spark, out1)
    rows = back.where(F.col("error").isNull()).select(
        "url", F.decode("payload", "UTF-8").alias("text")
    ).collect()
    assert len(rows) == 37
    got = {r.url: r.text for r in rows}
    assert got["https://x.example/d/5"] == "text 5 é\n with bytes"


def test_auto_shard_sizing_bounds_shard_bytes(spark, tmp_path):
    """SCALE.md rule 60: with n_shards=None the writer sizes the shard
    count from the input's on-disk bytes so per-shard (and therefore
    per-task and per-binaryFile-row) size is bounded by construction —
    a fixed shard count would put the whole corpus growth into shard
    size.  Parquet-backed input with a tiny byte target must fan out
    beyond the floor of 4; an in-memory frame (not stat-able) falls
    back to the floor."""
    from pyspark.sql import functions as F

    from species_range_data_pipeline_spark.sources.warc import (
        _auto_shards,
        write_warc_corpus,
    )

    src = str(tmp_path / "docs.parquet")
    spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("payload "), F.col("id")).alias("text"),
    ).write.parquet(src)
    docs = spark.read.parquet(src).select(
        F.concat(F.lit("https://x.example/d/"), "doc_id").alias("url"),
        F.encode("text", "UTF-8").alias("body"),
    )

    assert _auto_shards(docs, target_bytes=1 << 30) == 4  # floor
    n = _auto_shards(docs, target_bytes=256)
    assert n > 4

    mem = spark.createDataFrame(
        [("https://x/1", b"a")], "url string, body binary"
    )
    assert _auto_shards(mem, target_bytes=256) == 4  # not stat-able

    out = str(tmp_path / "sharded")
    m = write_warc_corpus(docs, out, target_shard_bytes=256).collect()
    # every NON-EMPTY shard published (hash routing can leave a few of
    # the n buckets empty; empty shards publish no file), no record lost
    assert 4 < len(m) <= n
    assert sum(r.n_records for r in m) == 200


def test_auto_shard_sizing_applies_output_safety_factor(spark, tmp_path):
    """ADVICE r15: _auto_shards stats parquet-COMPRESSED input bytes
    while the real bound is container-OUTPUT bytes (gzip WARC / tar),
    so it must size against target/2 — tolerating 2x input->output
    expansion before a shard overshoots the target."""
    from pyspark.sql import functions as F

    from species_range_data_pipeline_spark.sources.warc import (
        _auto_shards,
        _estimated_input_bytes,
    )

    src = str(tmp_path / "docs.parquet")
    spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("payload "), F.col("id")).alias("text"),
    ).write.parquet(src)
    docs = spark.read.parquet(src)

    est = _estimated_input_bytes(docs)
    assert est and est > 0
    # shards = ceil(est / (target // 2)), floored at 4
    target = 256
    expected = max(4, -(-est // (target // 2)))
    assert _auto_shards(docs, target_bytes=target) == expected
    assert expected >= -(-est // target)  # never fewer than unfactored


def test_shard_byte_cap_guard():
    """ADVICE r15: writers refuse to publish a shard at or above
    binaryFile's 2 GiB row cap — loud at write time, never unreadable
    at read time."""
    import pytest

    from species_range_data_pipeline_spark.sources.warc import (
        _BINARYFILE_MAX_BYTES,
        _check_shard_bytes,
    )

    _check_shard_bytes("ok.warc.gz", _BINARYFILE_MAX_BYTES - 1)
    with pytest.raises(RuntimeError, match="2 GiB row cap"):
        _check_shard_bytes("big.warc.gz", _BINARYFILE_MAX_BYTES)


def test_warc_writer_failure_sweeps_staged_partials(spark, tmp_path):
    """ADVICE r15: a mid-partition failure must close every staged
    handle and unlink the .__stage_* partials — a retried/failed write
    leaves ZERO files (staged or published) in the output directory."""
    import pytest

    from species_range_data_pipeline_spark.sources.warc import (
        write_warc_corpus,
    )

    # body=None explodes inside the member encode, after the first
    # rows have already streamed to staged handles (url-sorted: the
    # poison row sorts last in its shard)
    bad = spark.createDataFrame(
        [(f"https://x.example/d/{i}", b"payload") for i in range(8)]
        + [("https://x.example/zzz", None)],
        "url string, body binary",
    )
    out = tmp_path / "warc_fail"
    with pytest.raises(Exception):
        write_warc_corpus(bad, str(out), n_shards=2).collect()
    leftovers = sorted(p.name for p in out.iterdir())
    assert leftovers == [], leftovers


def test_webdataset_writer_failure_sweeps_staged_partials(spark, tmp_path):
    """Same sweep contract for the tar writer's .tmp-* stage files: a
    publish failure partway through the shard loop must leave zero
    staged partials behind (a directory squatting on one shard's final
    name makes that shard's atomic rename raise)."""
    import pytest

    from species_range_data_pipeline_spark.sources.webdataset import (
        write_webdataset,
    )

    rows = [(f"k{i}", b"payload") for i in range(64)]
    df = spark.createDataFrame(rows, "key string, blob binary")
    out = tmp_path / "wds_fail"
    out.mkdir()
    # with 64 hashed keys over 2 shards, both shards are non-empty;
    # shard 1's publish hits the squatter and raises after shard 0
    # already published
    (out / "shard-00001.tar").mkdir()
    with pytest.raises(Exception):
        write_webdataset(
            df,
            str(out),
            key_col="key",
            payload_cols={"blob": "bin"},
            n_shards=2,
        ).collect()
    staged = sorted(
        p.name for p in out.iterdir() if ".tmp-" in p.name
    )
    assert staged == [], staged
