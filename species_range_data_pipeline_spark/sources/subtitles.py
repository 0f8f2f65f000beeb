"""SRT / WebVTT subtitle ingestion, stdlib-only.

Video training corpora ship their transcripts as SubRip (.srt) and
WebVTT (.vtt) sidecars; aligning text to time ranges is what turns a
video crawl into (clip, caption) training pairs.  This lane parses both
formats into timed cue rows and exposes the usual binary-lane Spark
reader (``binaryFile`` + ``mapInPandas``, error side-channel per file —
same shape as ``sources/warc.py``).

Parsed per cue: start/end milliseconds, cue text with markup stripped
(SRT ``<i>``-style tags, VTT ``<v Speaker>``/``<c>`` spans), and the
speaker name when a VTT voice span carries one.  Cue-settings after the
timestamp line (``position:...``), NOTE/STYLE/REGION blocks, and BOMs
are tolerated and skipped.

Hostile-input contract: ``ValueError`` on malformed timestamps or a
missing WEBVTT header (for .vtt), never a hang — parsing is one linear
pass over the lines.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["parse_srt", "parse_vtt", "read_subtitles"]

#: SRT uses a comma before millis, VTT a dot; VTT hours are optional
_TS = re.compile(
    r"(?:(\d{1,3}):)?(\d{1,2}):(\d{1,2})[.,](\d{1,3})"
)
_CUE_LINE = re.compile(
    r"^\s*((?:\d{1,3}:)?\d{1,2}:\d{1,2}[.,]\d{1,3})\s*-->\s*"
    r"((?:\d{1,3}:)?\d{1,2}:\d{1,2}[.,]\d{1,3})(\s+.*)?$"
)
_VOICE = re.compile(r"<v(?:\.[^ >]*)?\s+([^>]*)>")
_TAG = re.compile(r"</?[^>]+>")


def _ts_ms(ts: str) -> int:
    m = _TS.fullmatch(ts.strip())
    if m is None:
        raise ValueError(f"bad subtitle timestamp {ts!r}")
    h, mi, s = (int(g or 0) for g in m.groups()[:3])
    if mi > 59 or s > 59:
        raise ValueError(f"bad subtitle timestamp {ts!r}")
    # millis digits are positional: "01,5" means 500 ms, not 5 ms
    frac = m.group(4)
    ms = int(frac) * 10 ** (3 - len(frac))
    return ((h * 60 + mi) * 60 + s) * 1000 + ms


def _clean(lines: list[str]) -> tuple[str, str | None]:
    """Join cue lines, strip markup; first VTT voice span names the
    speaker."""
    text = "\n".join(lines).strip()
    voice = _VOICE.search(text)
    speaker = voice.group(1).strip() if voice else None
    return _TAG.sub("", text).strip(), speaker


def _parse_cues(body: str) -> list[dict]:
    cues: list[dict] = []
    block: list[str] = []

    def flush() -> None:
        if not block:
            return
        lines = list(block)
        block.clear()
        # VTT metadata blocks: NOTE is the exact word (then space/EOL),
        # STYLE/REGION whole lines — and NEVER a block that contains a
        # timestamp line (a cue id may legitimately start with "Notes"
        # or "region-1"; dropping those silently would eat real cues)
        head = lines[0].strip()
        is_meta = head.upper() in ("STYLE", "REGION") or (
            head.upper() == "NOTE" or head.upper().startswith("NOTE ")
        )
        if is_meta and not any(_CUE_LINE.match(ln) for ln in lines):
            return
        # optional identifier line (SRT counter / VTT cue id) before -->
        if not _CUE_LINE.match(lines[0]) and len(lines) > 1 and _CUE_LINE.match(lines[1]):
            lines = lines[1:]
        m = _CUE_LINE.match(lines[0])
        if m is None:
            raise ValueError(
                f"cue block without a timestamp line: {lines[0]!r}"
            )
        start, end = _ts_ms(m.group(1)), _ts_ms(m.group(2))
        if end < start:
            raise ValueError(f"cue ends before it starts: {lines[0]!r}")
        text, speaker = _clean(lines[1:])
        cues.append(
            {
                "cue_idx": len(cues),
                "start_ms": start,
                "end_ms": end,
                "speaker": speaker,
                "text": text,
            }
        )

    for raw in body.split("\n"):
        line = raw.rstrip("\r")
        if line.strip() == "":
            flush()
        else:
            block.append(line)
    flush()
    return cues


def parse_srt(blob: bytes) -> list[dict]:
    """SubRip bytes -> cue dicts (cue_idx, start_ms, end_ms, speaker,
    text).  UTF-8 with BOM tolerated; undecodable bytes are replaced,
    not fatal (subtitle files in the wild are encoding soup)."""
    return _parse_cues(blob.decode("utf-8", errors="replace").lstrip("﻿"))


def parse_vtt(blob: bytes) -> list[dict]:
    """WebVTT bytes -> cue dicts; requires the WEBVTT magic, skips the
    whole header block (``Kind:``/``Language:`` lines run until the
    first blank line) and NOTE/STYLE/REGION blocks, strips
    ``<v>``/``<c>`` spans, captures the speaker from the first voice
    span."""
    text = blob.decode("utf-8", errors="replace").lstrip("﻿")
    first, _, rest = text.partition("\n")
    if not first.strip().startswith("WEBVTT"):
        raise ValueError("not WebVTT: missing WEBVTT header line")
    # the header BLOCK extends to the first blank line: metadata lines
    # like "Kind: captions" belong to it, not to the first cue — consume
    # non-blank non-timestamp lines from the top
    lines = rest.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    i = 0
    while i < len(lines) and lines[i].strip() and not _CUE_LINE.match(lines[i]):
        i += 1
    return _parse_cues("\n".join(lines[i:]))


CUE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("cue_idx", T.IntegerType()),
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("speaker", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def read_subtitles(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of .srt/.vtt files -> one row per cue, errors as
    rows (same per-file error side-channel as every binary lane).  One
    file parses per task; cue tables are tiny next to their videos, so
    the scan parallelism follows the file count."""
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for p, content in zip(pdf["path"], pdf["content"]):
                try:
                    blob = bytes(content)
                    cues = (
                        parse_vtt(blob)
                        if p.lower().endswith(".vtt")
                        else parse_srt(blob)
                    )
                    for c in cues:
                        out.append({"path": p, **c, "error": None})
                except Exception as exc:
                    out.append(
                        {"path": p, "cue_idx": None, "start_ms": None,
                         "end_ms": None, "speaker": None, "text": None,
                         "error": f"{type(exc).__name__}: {exc}"}
                    )
            yield pd.DataFrame(out, columns=[f.name for f in CUE_SCHEMA.fields])

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{srt,vtt}")
        .load(path)
        .select("path", "content")
        .mapInPandas(fn, CUE_SCHEMA)
    )
