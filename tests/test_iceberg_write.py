"""Iceberg-layout writer (`sources/iceberg_write.py`): round-trips
through the repo's own reader, complete data files (identity partition
columns in-file), manifest-entry bounds pruning, append/overwrite/
error modes, snapshot history + time travel, change-feed and streaming
-tail interop over self-written history, and optimistic-concurrency
retry on the metadata version file.
"""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest

from species_range_data_pipeline_spark.sources.iceberg_log import (
    iceberg_read_changes,
    iceberg_scan_files,
    iceberg_snapshots,
    read_iceberg_table,
)
from species_range_data_pipeline_spark.sources.iceberg_write import (
    write_iceberg_table,
)


def _df(spark, rows, cols="k long, part string, v double"):
    return spark.createDataFrame(rows, cols)


def test_write_read_roundtrip_and_history(spark, tmp_path):
    tbl = str(tmp_path / "t")
    s1 = write_iceberg_table(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), tbl)
    s2 = write_iceberg_table(_df(spark, [(3, "c", 3.0)]), tbl)
    assert s1 != s2
    got = sorted(
        (r.k, r.part, r.v) for r in read_iceberg_table(spark, tbl).collect()
    )
    assert got == [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]
    # time travel to the first snapshot
    assert sorted(
        r.k
        for r in read_iceberg_table(spark, tbl, snapshot_id=s1).collect()
    ) == [1, 2]
    snaps = iceberg_snapshots(tbl)
    assert [s["snapshot-id"] for s in snaps] == [s1, s2]
    assert snaps[1]["parent-snapshot-id"] == s1
    assert snaps[1]["sequence-number"] == 2


def test_partitioned_files_are_complete_and_prune(spark, tmp_path):
    """Identity-partitioned writes keep the partition column IN the
    data files (the spec's completeness rule) while the manifest
    tuples and footer bounds drive file pruning."""
    tbl = str(tmp_path / "t")
    rows = [(k, "lo" if k < 100 else "hi", float(k)) for k in range(200)]
    write_iceberg_table(_df(spark, rows), tbl, partition_by=["part"])
    got = sorted(
        (r.k, r.part) for r in read_iceberg_table(spark, tbl).collect()
    )
    assert got == sorted((k, p) for k, p, _v in rows)
    for dirpath, _d, names in os.walk(os.path.join(tbl, "data")):
        for n in names:
            if n.endswith(".parquet"):
                assert "part" in pq.read_schema(
                    os.path.join(dirpath, n)
                ).names
    all_files = iceberg_scan_files(tbl)
    lo = iceberg_scan_files(tbl, filters=[("part", "=", "lo")])
    assert lo and set(lo) < set(all_files)
    # footer-derived lower/upper bounds prune on the NON-partition col
    assert iceberg_scan_files(tbl, filters=[("k", ">", 10_000)]) == []


def test_overwrite_keeps_history_and_feeds_changes(spark, tmp_path):
    tbl = str(tmp_path / "t")
    s1 = write_iceberg_table(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), tbl)
    s2 = write_iceberg_table(
        _df(spark, [(2, "b", 2.0), (9, "z", 9.0)]), tbl, mode="overwrite"
    )
    assert sorted(
        r.k for r in read_iceberg_table(spark, tbl).collect()
    ) == [2, 9]
    assert sorted(
        r.k
        for r in read_iceberg_table(spark, tbl, snapshot_id=s1).collect()
    ) == [1, 2]
    got = sorted(
        (r.k, r._change_type)
        for r in iceberg_read_changes(spark, tbl, s1).collect()
    )
    # the overwrite step nets: k=1 deleted, k=9 inserted (k=2 carries
    # in the multiset even though its file was rewritten)
    assert got == [(1, "delete"), (2, "delete"), (2, "insert"), (9, "insert")] \
        or got == [(1, "delete"), (9, "insert")]


def test_refusals(spark, tmp_path):
    tbl = str(tmp_path / "t")
    write_iceberg_table(_df(spark, [(1, "a", 1.0)]), tbl)
    with pytest.raises(ValueError, match="schema mismatch"):
        write_iceberg_table(_df(spark, [(1, 2)], "k long, o long"), tbl)
    with pytest.raises(ValueError, match="partitioning mismatch"):
        write_iceberg_table(
            _df(spark, [(1, "a", 1.0)]), tbl, partition_by=["part"]
        )
    with pytest.raises(FileExistsError, match="mode='error'"):
        write_iceberg_table(_df(spark, [(1, "a", 1.0)]), tbl, mode="error")
    with pytest.raises(NotImplementedError, match="primitive"):
        write_iceberg_table(
            spark.createDataFrame([([1],)], "a array<long>"),
            str(tmp_path / "nested"),
        )
    with pytest.raises(NotImplementedError, match="partition types"):
        write_iceberg_table(
            _df(spark, [(1, "a", 1.0)]),
            str(tmp_path / "badpart"),
            partition_by=["v"],
        )


def test_optimistic_commit_retries_past_claimed_version(spark, tmp_path):
    tbl = str(tmp_path / "t")
    write_iceberg_table(_df(spark, [(1, "a", 1.0)]), tbl)
    racer = os.path.join(tbl, "metadata", "v2.metadata.json")
    with open(racer, "w") as fh:
        json.dump({"format-version": 2, "racer": True}, fh)
    write_iceberg_table(_df(spark, [(2, "b", 2.0)]), tbl)
    assert os.path.exists(os.path.join(tbl, "metadata", "v3.metadata.json"))
    with open(os.path.join(tbl, "metadata", "version-hint.text")) as fh:
        assert fh.read().strip() == "3"
    assert sorted(
        r.k for r in read_iceberg_table(spark, tbl).collect()
    ) == [1, 2]


def test_streaming_tail_over_self_written_appends(spark, tmp_path):
    from species_range_data_pipeline_spark.sources.iceberg_stream import (
        register_iceberg_stream_source,
    )

    register_iceberg_stream_source(spark)
    tbl = str(tmp_path / "t")
    write_iceberg_table(_df(spark, [(1, "a", 1.0)]), tbl)
    write_iceberg_table(_df(spark, [(2, "b", 2.0)]), tbl)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("iceberg_tail")
        .option("path", tbl)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(r.k for r in spark.read.parquet(out).collect()) == [1, 2]


def test_partition_value_escaping_roundtrip_and_empty_string(
    spark, tmp_path
):
    """Partition tuples come from the files' OWN footers, so values
    the Hive directory encoding mangles ('' included, when it lands
    in its own file) round-trip exactly — and pruning on them stays
    truthful."""
    nasty = ["a b", "a%20b", "a=b", "100%", "a\tb", None, ""]
    rows = [(i, v) for i, v in enumerate(nasty)]
    tbl = str(tmp_path / "t")
    # one task per value: '' and NULL land in separate files, so the
    # footer disambiguates what the shared directory name conflates
    df = spark.createDataFrame(rows, "k long, part string").repartition(
        len(nasty), "k"
    )
    write_iceberg_table(df, tbl, partition_by=["part"])
    got = sorted(
        (r.k, r.part) for r in read_iceberg_table(spark, tbl).collect()
    )
    assert got == sorted(rows, key=lambda t: t[0])
    empty = iceberg_scan_files(tbl, filters=[("part", "=", "")])
    ks = sorted(
        k
        for f in empty
        for k in pq.read_table(f, columns=["k"]).column("k").to_pylist()
    )
    assert 6 in ks  # the '' row's file survives the prune


def test_mixed_empty_and_null_partition_file_refused(spark, tmp_path):
    """A single staged file holding BOTH '' and NULL rows of an
    identity partition column (the Hive default-partition conflation)
    is refused rather than guessed."""
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "x")], "k long, part string"
    ).coalesce(1)
    with pytest.raises(ValueError, match="conflated"):
        write_iceberg_table(
            df, str(tmp_path / "t"), partition_by=["part"]
        )


def test_merge_schema_append_adds_columns_with_fresh_ids(spark, tmp_path):
    """merge_schema=True: appended columns get fresh field ids past
    last-column-id; old files null-pad on read; type changes refuse."""
    tbl = str(tmp_path / "t")
    write_iceberg_table(_df(spark, [(1, "a", 1.0)]), tbl)
    write_iceberg_table(
        spark.createDataFrame(
            [(2, "b", 2.0, 7)], "k long, part string, v double, extra long"
        ),
        tbl,
        merge_schema=True,
    )
    got = sorted(
        (r.k, r.part, r.extra)
        for r in read_iceberg_table(spark, tbl).collect()
    )
    assert got == [(1, "a", None), (2, "b", 7)]
    from species_range_data_pipeline_spark.sources.iceberg_log import (
        _current_schema,
        _load_metadata,
    )

    meta = _load_metadata(tbl)
    fields = _current_schema(meta, tbl)["fields"]
    assert [(f["name"], f["id"]) for f in fields] == [
        ("k", 1), ("part", 2), ("v", 3), ("extra", 4),
    ]
    assert meta["last-column-id"] == 4
    with pytest.raises(ValueError, match="type change"):
        write_iceberg_table(
            spark.createDataFrame([(4, 1.5)], "k long, part double"),
            tbl,
            merge_schema=True,
        )
