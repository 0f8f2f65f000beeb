"""Driver-visible multimodal queries.

The fixture tables carry no binary columns, so the multimodal lane's
driver evidence comes from a deterministic synthetic media table
(seed-stable ``make_media_table``): every run, any engine, produces the
same payload bytes, so the decoded feature aggregates are stable rows
pinned as VALUES oracles.  The heavy lifting — codecs,
mapInPandas batching, error channels — is the same production code the
pytest suite drives; these queries exist so the EXTERNAL gate sees it
too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal.media import (
    decode_images,
    extract_audio_features,
    image_ahash,
    make_media_table,
    sample_frames,
)

_N_MEDIA = 64


def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode the synthetic media table and aggregate per kind: image
    feature means, audio RMS, sampled-frame counts — one stable row per
    media kind."""
    media = make_media_table(spark, _N_MEDIA)
    img = decode_images(media).agg(
        F.lit("image").alias("kind"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("mean_pixel"), 3).alias("metric_a"),
        F.round(F.avg("width"), 3).alias("metric_b"),
    )
    aud = extract_audio_features(media).agg(
        F.lit("audio").alias("kind"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("rms"), 3).alias("metric_a"),
        F.round(F.avg("duration_s"), 3).alias("metric_b"),
    )
    vid = sample_frames(media, every=2).agg(
        F.lit("video").alias("kind"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("frame_idx"), 3).alias("metric_a"),
        F.round(F.avg("width"), 3).alias("metric_b"),
    )
    return img.unionByName(aud).unionByName(vid).orderBy("kind")


def multimodal_ahash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash dedup over the synthetic images plus two planted
    byte-identical duplicates: groups with >1 member surface, everything
    else collapses to a count — the image-dedup shape at corpus scale
    (one shuffle on the 64-bit hash)."""
    media = make_media_table(spark, _N_MEDIA)
    dup_src = media.where(F.col("media_id").isin(0, 1)).select(
        (F.col("media_id") + 1000).alias("media_id"),
        "kind",
        "payload",
        "format",
    )
    hashes = image_ahash(media.unionByName(dup_src))
    groups = hashes.groupBy("ahash").agg(
        F.count(F.lit(1)).alias("n"),
        F.sort_array(F.collect_list("media_id")).alias("ids"),
    )
    return (
        groups.select(
            F.when(F.col("n") > 1, F.to_json(F.col("ids"))).alias("dup_group"),
            "n",
        )
        .groupBy("dup_group")
        .agg(F.count(F.lit(1)).alias("n_groups"), F.sum("n").alias("n_images"))
        .orderBy(F.col("dup_group").asc_nulls_first())
    )


def subtitle_cue_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-speaker cue statistics over a deterministic synthetic subtitle
    corpus (two SRT + one VTT payload, parsed by the production
    ``sources/subtitles.py`` kernels through the same mapInPandas shape
    the file reader uses).  Unlike the other media queries this one IS
    oracle-backed: the inputs are fixed literals, so the expected rows
    are a VALUES table — the parser output is pinned VALUE-level by the
    driver, not just rows-only."""
    import pandas as pd

    from ..sources.subtitles import CUE_SCHEMA, parse_srt, parse_vtt

    payloads = [
        (
            "a.srt",
            b"1\n00:00:01,000 --> 00:00:03,500\nHello <i>world</i>\n\n"
            b"2\n00:00:04,000 --> 00:00:06,000\nSecond line\ncontinues\n",
        ),
        (
            "b.srt",
            b"1\n00:01:00,000 --> 00:01:02,000\nAnother file\n",
        ),
        (
            "c.vtt",
            b"WEBVTT\n\nNOTE meta\n\n00:07.000 --> 00:09.500\n"
            b"<v Alice>Hi there\n\n00:10.000 --> 00:11.000\n<v Bob>Yo\n",
        ),
    ]
    src = spark.createDataFrame(payloads, "path string, content binary")

    def fn(batches):
        for pdf in batches:
            out = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                parse = parse_vtt if p.endswith(".vtt") else parse_srt
                for c in parse(bytes(blob)):
                    out.append({"path": p, **c, "error": None})
            yield pd.DataFrame(
                out, columns=[f.name for f in CUE_SCHEMA.fields]
            )

    cues = src.mapInPandas(fn, CUE_SCHEMA)
    return (
        cues.groupBy(F.coalesce("speaker", F.lit("(none)")).alias("speaker"))
        .agg(
            F.count(F.lit(1)).alias("n_cues"),
            F.sum(F.col("end_ms") - F.col("start_ms")).alias("total_ms"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .orderBy("speaker")
    )


# hand-derived from the literal payloads above: cue spans and cleaned
# text lengths ("Hello world"=11, "Second line\ncontinues"=21,
# "Another file"=12, "Hi there"=8, "Yo"=2)
SUBTITLE_CUE_STATS_ORACLE = """
SELECT * FROM (VALUES
    ('(none)', CAST(3 AS BIGINT), CAST(6500 AS BIGINT), CAST(44 AS BIGINT)),
    ('Alice',  CAST(1 AS BIGINT), CAST(2500 AS BIGINT), CAST(8 AS BIGINT)),
    ('Bob',    CAST(1 AS BIGINT), CAST(1000 AS BIGINT), CAST(2 AS BIGINT))
) AS t(speaker, n_cues, total_ms, n_chars)
ORDER BY speaker
"""


# The synthetic corpus is seed-stable and scale-independent (64 payloads,
# pure-numpy decode), so the three aggregate rows are constants — pinned
# here as a VALUES oracle, same trick as subtitle_cue_stats.
MULTIMODAL_DECODE_STATS_ORACLE = """
SELECT * FROM (VALUES
    ('audio', CAST(16 AS BIGINT), CAST(18931.204 AS DOUBLE), CAST(0.063 AS DOUBLE)),
    ('image', CAST(32 AS BIGINT), CAST(129.312 AS DOUBLE), CAST(9.906 AS DOUBLE)),
    ('video', CAST(42 AS BIGINT), CAST(1.714 AS DOUBLE), CAST(8.0 AS DOUBLE))
) AS t(kind, n, metric_a, metric_b)
ORDER BY kind
"""


# The ahash corpus is seed-stable AND scale-independent (64 synthetic
# payloads + 2 planted byte-identical dups, regardless of sf), so the
# three rollup rows are constants: 30 singleton hash groups plus the two
# planted pairs.  VALUES-pinned like multimodal_decode_stats.
MULTIMODAL_AHASH_DUPS_ORACLE = """
SELECT * FROM (VALUES
    (CAST(NULL AS VARCHAR), CAST(30 AS BIGINT), CAST(30 AS BIGINT)),
    ('[0,1000]',            CAST(1 AS BIGINT),  CAST(2 AS BIGINT)),
    ('[1,1001]',            CAST(1 AS BIGINT),  CAST(2 AS BIGINT))
) AS t(dup_group, n_groups, n_images)
ORDER BY dup_group NULLS FIRST
"""


QUERIES = {
    "multimodal_decode_stats": multimodal_decode_stats,
    "multimodal_ahash_dups": multimodal_ahash_dups,
    "subtitle_cue_stats": subtitle_cue_stats,
}

ORACLES: dict[str, str] = {
    "multimodal_decode_stats": MULTIMODAL_DECODE_STATS_ORACLE,
    "multimodal_ahash_dups": MULTIMODAL_AHASH_DUPS_ORACLE,
    "subtitle_cue_stats": SUBTITLE_CUE_STATS_ORACLE,
}
