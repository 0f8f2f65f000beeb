"""SRT/WebVTT subtitle lane (sources/subtitles.py): format parsing,
markup/voice handling, the Spark cue reader with its per-file error
side-channel, and the hostile-input contract."""

from __future__ import annotations

import random

import pytest

from species_range_data_pipeline_spark.sources.subtitles import (
    parse_srt,
    parse_vtt,
    read_subtitles,
)

SRT = b"""1
00:00:01,000 --> 00:00:03,500
Hello <i>world</i>

2
00:00:04,000 --> 00:00:06,000
Second line
continues here
"""

VTT = (
    "﻿WEBVTT - demo\n"
    "\n"
    "NOTE a comment block\nspanning lines\n"
    "\n"
    "STYLE\n::cue { color: red }\n"
    "\n"
    "intro\n00:01.000 --> 00:02.250 position:10%\n"
    "<v Alice>Hi <c.loud>there</c>\n"
    "\n"
    "01:00:00.000 --> 01:00:05.000\nplain\n"
).encode()


def test_srt_cues_and_markup():
    cues = parse_srt(SRT)
    assert [c["start_ms"] for c in cues] == [1000, 4000]
    assert cues[0]["end_ms"] == 3500 and cues[0]["text"] == "Hello world"
    assert cues[1]["text"] == "Second line\ncontinues here"
    assert all(c["speaker"] is None for c in cues)


def test_vtt_header_voice_and_blocks():
    cues = parse_vtt(VTT)
    assert len(cues) == 2  # NOTE/STYLE blocks and cue settings skipped
    assert cues[0]["speaker"] == "Alice" and cues[0]["text"] == "Hi there"
    assert (cues[0]["start_ms"], cues[0]["end_ms"]) == (1000, 2250)
    assert cues[1]["start_ms"] == 3_600_000  # hours form
    with pytest.raises(ValueError, match="WEBVTT"):
        parse_vtt(SRT)


def test_subtitle_hostile_inputs():
    with pytest.raises(ValueError, match="timestamp"):
        parse_srt(b"1\n00:99:00,000 --> 00:00:01,000\nx\n")
    with pytest.raises(ValueError, match="ends before"):
        parse_srt(b"1\n00:00:05,000 --> 00:00:01,000\nx\n")
    with pytest.raises(ValueError, match="timestamp line"):
        parse_srt(b"just some text\nwith no cue\n")
    # truncation/bitflip gauntlet: ValueError or success, never a hang
    rng = random.Random(55)
    for blob in (SRT, VTT):
        for _ in range(120):
            trunc = blob[: rng.randrange(len(blob))]
            try:
                (parse_vtt if blob is VTT else parse_srt)(trunc)
            except ValueError:
                pass
            flipped = bytearray(blob)
            for _ in range(rng.randrange(1, 5)):
                flipped[rng.randrange(len(flipped))] = rng.randrange(256)
            try:
                (parse_vtt if blob is VTT else parse_srt)(bytes(flipped))
            except ValueError:
                pass


def test_spark_cue_reader_with_error_channel(spark, tmp_path):
    (tmp_path / "a.srt").write_bytes(SRT)
    (tmp_path / "b.vtt").write_bytes(VTT)
    (tmp_path / "c.srt").write_bytes(b"broken\nno cue here\n")
    rows = read_subtitles(spark, str(tmp_path)).collect()
    ok = [r for r in rows if r.error is None]
    bad = [r for r in rows if r.error is not None]
    assert len(ok) == 4 and len(bad) == 1
    assert bad[0].path.endswith("c.srt") and "ValueError" in bad[0].error
    by_file = {}
    for r in ok:
        by_file.setdefault(r.path.rsplit("/", 1)[-1], []).append(r)
    assert [r.cue_idx for r in sorted(by_file["a.srt"], key=lambda r: r.cue_idx)] == [0, 1]
    assert by_file["b.vtt"][0].speaker == "Alice"


def test_vtt_header_metadata_and_lookalike_cue_ids():
    """Review regressions: header metadata lines (Kind:/Language:) after
    WEBVTT must not eat the first cue, and cue identifiers that merely
    START with note/style/region are real cues, not metadata blocks."""
    vtt = (
        b"WEBVTT\nKind: captions\nLanguage: en\n\n"
        b"00:01.000 --> 00:02.000\nhello\n"
    )
    cues = parse_vtt(vtt)
    assert len(cues) == 1 and cues[0]["text"] == "hello"

    vtt2 = (
        b"WEBVTT\n\n"
        b"regional-caption-1\n00:01.000 --> 00:02.000\none\n\n"
        b"Notes for later\n00:03.000 --> 00:04.000\ntwo\n\n"
        b"style-2\n00:05.000 --> 00:06.000\nthree\n\n"
        b"NOTE a real comment\nstill the comment\n"
    )
    cues = parse_vtt(vtt2)
    assert [c["text"] for c in cues] == ["one", "two", "three"]
