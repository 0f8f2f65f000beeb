"""Delta-layout writer (`sources/delta_write.py`): round-trips through
the repo's own reader, spec-shaped log actions, partitioned layouts
(null and special-char values), append/overwrite/error modes, stats
-driven pruning, optimistic-concurrency retry, checkpoint + cleanup
replay, and change-feed interop over self-written history.
"""

from __future__ import annotations

import json
import os

import pytest

from species_range_data_pipeline_spark.sources.delta_log import (
    delta_scan_files,
    read_delta_changes,
    read_delta_table,
)
from species_range_data_pipeline_spark.sources.delta_write import (
    write_delta_checkpoint,
    write_delta_table,
)


def _df(spark, rows, cols="k long, part string, v double"):
    return spark.createDataFrame(rows, cols)


def test_write_read_roundtrip_unpartitioned(spark, tmp_path):
    tbl = str(tmp_path / "t")
    df = _df(spark, [(1, "a", 1.5), (2, "b", 2.5), (3, None, 3.5)])
    assert write_delta_table(df, tbl) == 0
    got = sorted(
        (r.k, r.part, r.v) for r in read_delta_table(spark, tbl).collect()
    )
    assert got == [(1, "a", 1.5), (2, "b", 2.5), (3, None, 3.5)]


def test_commit_actions_are_spec_shaped(spark, tmp_path):
    """First commit: protocol + metaData + adds with relative
    URL-encoded paths and valid stats JSON."""
    tbl = str(tmp_path / "t")
    write_delta_table(_df(spark, [(1, "a", 1.5)]), tbl)
    with open(os.path.join(tbl, "_delta_log", f"{0:020d}.json")) as fh:
        actions = [json.loads(line) for line in fh if line.strip()]
    kinds = [next(iter(a)) for a in actions]
    assert kinds[:3] == ["commitInfo", "protocol", "metaData"]
    assert kinds.count("add") >= 1
    proto = actions[1]["protocol"]
    assert (proto["minReaderVersion"], proto["minWriterVersion"]) == (1, 2)
    meta = actions[2]["metaData"]
    assert meta["format"]["provider"] == "parquet"
    assert json.loads(meta["schemaString"])["type"] == "struct"
    for a in actions:
        if "add" not in a:
            continue
        add = a["add"]
        assert not add["path"].startswith("/") and "://" not in add["path"]
        st = json.loads(add["stats"])
        assert st["numRecords"] == 1
        assert st["minValues"]["k"] == 1 and st["maxValues"]["k"] == 1
        assert st["nullCount"]["part"] == 0


def test_partitioned_roundtrip_with_null_and_spaces(spark, tmp_path):
    """Partition values (including NULL and an escaped space) ride the
    log, not the files, and restore exactly."""
    tbl = str(tmp_path / "t")
    rows = [(1, "a b", 1.0), (2, None, 2.0), (3, "c", 3.0)]
    write_delta_table(_df(spark, rows), tbl, partition_by=["part"])
    got = sorted(
        (r.k, r.part, r.v) for r in read_delta_table(spark, tbl).collect()
    )
    assert got == sorted(rows)
    # the data files must NOT contain the partition column
    import pyarrow.parquet as pq

    for dirpath, _d, names in os.walk(tbl):
        for n in names:
            if n.endswith(".parquet") and "_delta_log" not in dirpath:
                assert "part" not in pq.read_schema(
                    os.path.join(dirpath, n)
                ).names


def test_append_then_overwrite_and_time_travel(spark, tmp_path):
    tbl = str(tmp_path / "t")
    assert write_delta_table(_df(spark, [(1, "a", 1.0)]), tbl) == 0
    assert write_delta_table(_df(spark, [(2, "b", 2.0)]), tbl) == 1
    assert (
        write_delta_table(
            _df(spark, [(9, "z", 9.0)]), tbl, mode="overwrite"
        )
        == 2
    )
    assert sorted(
        r.k for r in read_delta_table(spark, tbl).collect()
    ) == [9]
    assert sorted(
        r.k for r in read_delta_table(spark, tbl, version=1).collect()
    ) == [1, 2]


def test_append_refusals_and_error_mode(spark, tmp_path):
    tbl = str(tmp_path / "t")
    write_delta_table(_df(spark, [(1, "a", 1.0)]), tbl)
    with pytest.raises(ValueError, match="schema mismatch"):
        write_delta_table(
            _df(spark, [(1, 2)], "k long, other long"), tbl
        )
    with pytest.raises(ValueError, match="partitioning mismatch"):
        write_delta_table(
            _df(spark, [(1, "a", 1.0)]), tbl, partition_by=["part"]
        )
    with pytest.raises(FileExistsError, match="mode='error'"):
        write_delta_table(_df(spark, [(1, "a", 1.0)]), tbl, mode="error")


def test_stats_prune_written_table(spark, tmp_path):
    """Footer-derived stats + partition values make the written table
    zone-map-prunable: a filter on the partition column opens only its
    files, and a filter outside the k range opens none."""
    tbl = str(tmp_path / "t")
    rows = [(k, "lo" if k < 100 else "hi", float(k)) for k in range(200)]
    write_delta_table(
        _df(spark, rows), tbl, partition_by=["part"]
    )
    all_files = delta_scan_files(tbl)
    lo_files = delta_scan_files(tbl, filters=[("part", "=", "lo")])
    assert lo_files and set(lo_files) < set(all_files)
    assert all("part=lo" in f for f in lo_files)
    assert delta_scan_files(tbl, filters=[("k", ">", 10_000)]) == []


def test_optimistic_commit_retries_past_claimed_version(spark, tmp_path):
    """A version file claimed by a racing writer is skipped — the
    commit lands on the next free version, never overwrites."""
    tbl = str(tmp_path / "t")
    write_delta_table(_df(spark, [(1, "a", 1.0)]), tbl)
    # simulate a racing writer that claimed version 1
    racer = os.path.join(tbl, "_delta_log", f"{1:020d}.json")
    with open(racer, "w") as fh:
        fh.write(json.dumps({"commitInfo": {"operation": "RACER"}}) + "\n")
    v = write_delta_table(_df(spark, [(2, "b", 2.0)]), tbl)
    assert v == 2
    assert sorted(
        r.k for r in read_delta_table(spark, tbl).collect()
    ) == [1, 2]


def test_checkpoint_then_log_cleanup_replays(spark, tmp_path):
    """After write_delta_checkpoint, the earlier JSON commits can be
    deleted and the table (including partition values and stats
    pruning) still replays from the checkpoint."""
    tbl = str(tmp_path / "t")
    write_delta_table(
        _df(spark, [(1, "a", 1.0), (2, None, 2.0)]), tbl,
        partition_by=["part"],
    )
    write_delta_table(
        _df(spark, [(3, "c", 3.0)]), tbl, partition_by=["part"]
    )
    assert write_delta_checkpoint(tbl) == 1
    for v in (0, 1):
        os.unlink(os.path.join(tbl, "_delta_log", f"{v:020d}.json"))
    got = sorted(
        (r.k, r.part) for r in read_delta_table(spark, tbl).collect()
    )
    assert got == [(1, "a"), (2, None), (3, "c")]
    pruned = delta_scan_files(tbl, filters=[("part", "=", "c")])
    assert pruned and all("part=c" in f for f in pruned)
    # and the checkpointed table still accepts new commits
    assert (
        write_delta_table(
            _df(spark, [(4, "d", 4.0)]), tbl, partition_by=["part"]
        )
        == 2
    )
    assert sorted(
        r.k for r in read_delta_table(spark, tbl).collect()
    ) == [1, 2, 3, 4]


def test_change_feed_over_self_written_history(spark, tmp_path):
    """The repo's own change feed reads a self-written append +
    overwrite history exactly."""
    tbl = str(tmp_path / "t")
    write_delta_table(_df(spark, [(1, "a", 1.0)]), tbl)
    write_delta_table(_df(spark, [(2, "b", 2.0)]), tbl)
    write_delta_table(_df(spark, [(2, "b", 2.0)]), tbl, mode="overwrite")
    got = sorted(
        (r.k, r._change_type, r._commit_version)
        for r in read_delta_changes(spark, tbl, 0).collect()
    )
    # v1 inserts k=2; v2 overwrite nets to: delete k=1 (k=2 carried)
    assert got == [(1, "delete", 2), (2, "insert", 1)]


def test_partition_value_escaping_roundtrip(spark, tmp_path):
    """Hive-escaped partition values (spaces, %XX lookalikes, =, /,
    control chars) round-trip exactly through the directory encoding."""
    nasty = ["a b", "a%20b", "a=b", "a/b", "a:b", "100%", "x%y",
             "a#b", "  ", "a\tb", None, "nul\x01ctl"]
    rows = [(i, v) for i, v in enumerate(nasty)]
    tbl = str(tmp_path / "t")
    write_delta_table(
        spark.createDataFrame(rows, "k long, part string"),
        tbl,
        partition_by=["part"],
    )
    got = sorted(
        (r.k, r.part) for r in read_delta_table(spark, tbl).collect()
    )
    assert got == sorted(rows, key=lambda t: t[0])


def test_empty_string_partition_value_refused(spark, tmp_path):
    """Hive staging conflates '' (and the literal default-partition
    sentinel) with NULL, and Delta files cannot recover the value —
    the write refuses instead of silently nulling."""
    for bad in ["", "__HIVE_DEFAULT_PARTITION__"]:
        with pytest.raises(ValueError, match="conflates"):
            write_delta_table(
                spark.createDataFrame(
                    [(1, bad), (2, "x")], "k long, part string"
                ),
                str(tmp_path / f"t{len(bad)}"),
                partition_by=["part"],
            )


def test_overwrite_tombstones_dv_files(spark, tmp_path):
    """Overwriting a table whose live file carries a deletion vector
    must tombstone the (path, DV uid) pair — a bare remove would leave
    the DV'd file live and resurrect its rows."""
    from species_range_data_pipeline_spark.sources.dv import (
        make_inline_descriptor,
    )

    tbl = str(tmp_path / "t")
    write_delta_table(
        _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]).coalesce(1), tbl
    )
    import pyarrow.parquet as pq

    from species_range_data_pipeline_spark.sources.delta_log import _replay

    snap = _replay(tbl)
    (rel0,) = list(snap["live"])
    add0 = dict(snap["live"][rel0])
    add0["deletionVector"] = make_inline_descriptor([0])
    add0["dataChange"] = True
    with open(os.path.join(tbl, "_delta_log", f"{1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"add": add0}) + "\n")
        fh.write(
            json.dumps({"remove": {"path": rel0, "dataChange": True}})
            + "\n"
        )
    assert sorted(r.k for r in read_delta_table(spark, tbl).collect()) == [2]
    write_delta_table(_df(spark, [(9, "z", 9.0)]), tbl, mode="overwrite")
    assert sorted(r.k for r in read_delta_table(spark, tbl).collect()) == [9]


def test_checkpoint_carries_remove_tombstones(spark, tmp_path):
    """The checkpoint includes unexpired remove tombstones from the
    JSON tail (spec readers keep them for VACUUM bookkeeping); batch
    replay still reads only the live set."""
    import pyarrow.parquet as pq

    tbl = str(tmp_path / "t")
    write_delta_table(_df(spark, [(1, "a", 1.0)]), tbl)
    write_delta_table(_df(spark, [(9, "z", 9.0)]), tbl, mode="overwrite")
    v = write_delta_checkpoint(tbl)
    ckpt = os.path.join(tbl, "_delta_log", f"{v:020d}.checkpoint.parquet")
    rows = pq.read_table(ckpt).to_pylist()
    removes = [r["remove"] for r in rows if r.get("remove") and r["remove"].get("path")]
    assert len(removes) == 1  # v0's overwritten file
    for x in (0, 1):
        os.unlink(os.path.join(tbl, "_delta_log", f"{x:020d}.json"))
    assert sorted(r.k for r in read_delta_table(spark, tbl).collect()) == [9]


def test_merge_schema_append_adds_and_omits_columns(spark, tmp_path):
    """merge_schema=True: an append may ADD nullable columns (old
    files null-pad) and OMIT existing ones (its files null-pad); a
    type change still refuses."""
    tbl = str(tmp_path / "t")
    write_delta_table(_df(spark, [(1, "a", 1.0)]), tbl)
    write_delta_table(
        spark.createDataFrame(
            [(2, "b", 2.0, 7)], "k long, part string, v double, extra long"
        ),
        tbl,
        merge_schema=True,
    )
    write_delta_table(
        spark.createDataFrame([(3,)], "k long"), tbl, merge_schema=True
    )
    got = sorted(
        (r.k, r.part, r.v, r.extra)
        for r in read_delta_table(spark, tbl).collect()
    )
    assert got == [
        (1, "a", 1.0, None),
        (2, "b", 2.0, 7),
        (3, None, None, None),
    ]
    with pytest.raises(ValueError, match="type change"):
        write_delta_table(
            spark.createDataFrame([(4, 1.5)], "k long, part double"),
            tbl,
            merge_schema=True,
        )
    with pytest.raises(ValueError, match="merge_schema"):
        write_delta_table(
            spark.createDataFrame([(4, "x")], "k long, other string"), tbl
        )
