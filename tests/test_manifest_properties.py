"""Property-based gate for the manifest skipping stack: for ANY commit
layout and ANY filter conjunction, a filtered read must return exactly
the rows a full scan + in-memory filter returns.  Zone maps, bloom
indexes, and DML pruning are all allowed to be incomplete — never wrong;
this is the test that hunts for wrongness with randomized layouts rather
than hand-picked ones."""

from __future__ import annotations

import operator

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# r19 slow tier: randomized hypothesis sweeps; the pointwise manifest/
# DML/stream contracts stay in the default gate (test_formats,
# test_delta_write, test_corpus_stream).
import pytest

pytestmark = pytest.mark.slow

_OPS = {
    "=": operator.eq,
    "<": operator.lt,
    "<=": operator.le,
    ">": operator.gt,
    ">=": operator.ge,
    # null ops: value is ignored; semantics mirrored in the in-memory check
    "is_null": lambda x, _v: x is None,
    "not_null": lambda x, _v: x is not None,
}
_RANGE_OPS = [op for op in _OPS if not op.endswith("null")]

# (value, split) pools kept small so zone ranges overlap in interesting ways
_vals = st.integers(min_value=0, max_value=60)
_filters = st.lists(
    st.one_of(
        st.tuples(
            st.sampled_from(["a", "b", "label"]),
            st.sampled_from(_RANGE_OPS),
            _vals,
        ),
        # null probes target the nullable column
        st.tuples(
            st.just("label"),
            st.sampled_from(["is_null", "not_null"]),
            st.none(),
        ),
    ),
    min_size=1,
    max_size=3,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(_vals, _vals), min_size=1, max_size=80
    ),
    n_commits=st.integers(min_value=1, max_value=4),
    filters=_filters,
)
def test_filtered_read_equals_full_scan_filter(
    spark, tmp_path_factory, rows, n_commits, filters
):
    from species_range_data_pipeline_spark.sources.manifest_table import (
        read_manifest_table,
        write_manifest_table,
    )

    tmp = tmp_path_factory.mktemp("prop")
    path = str(tmp / "tbl")
    # label is nullable (a % 5 == 0 -> NULL) so null ops have real prey
    data = [
        (i, a, b, None if a % 5 == 0 else f"L{a % 7}")
        for i, (a, b) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "rid long, a long, b long, label string"
    )
    for part in range(n_commits):
        chunk = df.where(f"rid % {n_commits} = {part}").coalesce(1)
        if chunk.first() is None:
            continue
        write_manifest_table(chunk, path, index_columns=["label"])

    # string filters probe the label pool; ints hit a/b; null ops pass through
    norm = [
        (c, op, f"L{v % 7}" if c == "label" and v is not None else v)
        for c, op, v in filters
    ]

    def matches(x, op, v):
        if op in ("is_null", "not_null"):
            return _OPS[op](x, v)
        if x is None:
            return False  # SQL: NULL never satisfies a range predicate
        return _OPS[op](x, v)

    got = sorted(
        r.rid
        for r in read_manifest_table(spark, path, filters=norm).collect()
    )
    want = sorted(
        rid
        for rid, a, b, label in data
        if all(
            matches({"a": a, "b": b, "label": label}[c], op, v)
            for c, op, v in norm
        )
    )
    assert got == want


# ---- change-data-feed replay property ----------------------------------

_dml_op = st.one_of(
    st.tuples(st.just("append"), st.integers(0, 3)),
    st.tuples(st.just("delete"), st.integers(0, 60)),
    st.tuples(st.just("update"), st.integers(0, 60)),
    st.tuples(st.just("upsert"), st.integers(0, 3)),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_dml_op, min_size=1, max_size=4))
def test_change_feed_replay_identity_any_dml_sequence(
    spark, tmp_path_factory, ops
):
    """For ANY sequence of append/DELETE/UPDATE/MERGE commits, the change
    feed must satisfy snapshot(v0) + inserts - deletes == latest
    snapshot, as multisets — the log-replay identity the fixed-scenario
    test pins, hunted here with randomized histories (including no-op
    DML whose predicate matches nothing)."""
    from pyspark.sql import functions as F

    from species_range_data_pipeline_spark.sources.manifest_table import (
        delete_where,
        read_changes,
        read_manifest_table,
        table_versions,
        update_where,
        upsert_into,
        write_manifest_table,
    )

    tmp = tmp_path_factory.mktemp("cdfprop")
    path = str(tmp / "tbl")
    write_manifest_table(
        spark.range(0, 60).selectExpr("id", "id % 7 AS g").coalesce(2), path
    )
    next_id = 1000
    for kind, arg in ops:
        if kind == "append":
            write_manifest_table(
                spark.range(next_id, next_id + 5 + arg)
                .selectExpr("id", "id % 7 AS g")
                .coalesce(1),
                path,
            )
            next_id += 100
        elif kind == "delete":
            delete_where(spark, path, [("id", ">=", arg), ("id", "<", arg + 9)])
        elif kind == "update":
            update_where(spark, path, [("id", "<", arg)], {"g": "g + 50"})
        elif kind == "upsert":
            upsert_into(
                spark, path,
                spark.range(arg * 10, arg * 10 + 8)
                .selectExpr("id", "CAST(999 AS long) AS g"),
                "id",
            )
    if table_versions(path) == [0]:
        return  # every op was a pruned no-op: empty feed range

    def counts(df):
        return {
            (r.id, r.g): r.n
            for r in df.groupBy("id", "g")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    replay = counts(read_manifest_table(spark, path, version=0))
    for r in read_changes(spark, path, from_version=0).collect():
        k = (r.id, r.g)
        d = 1 if r._change_type == "insert" else -1
        replay[k] = replay.get(k, 0) + d
    replay = {k: n for k, n in replay.items() if n != 0}
    assert replay == counts(read_manifest_table(spark, path))


# ---- streaming source batch-boundary invariance ------------------------

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(1, 30), min_size=2, max_size=5),
    cuts=st.sets(st.integers(0, 10), max_size=3),
)
def test_stream_source_any_batch_boundaries_exactly_once(
    spark, tmp_path_factory, sizes, cuts
):
    """However the driver slices the version range into microbatches
    (Spark picks boundaries by timing — they are NOT deterministic), the
    concatenation of all batches is exactly the table's rows, each once:
    partitions(start, end) must be additive over any cut of the range."""
    from species_range_data_pipeline_spark.sources.manifest_stream import (
        ManifestStreamReader,
    )
    from species_range_data_pipeline_spark.sources.manifest_table import (
        table_schema,
        write_manifest_table,
    )

    tmp = tmp_path_factory.mktemp("srcprop")
    path = str(tmp / "tbl")
    lo = 0
    for n in sizes:
        write_manifest_table(
            spark.range(lo, lo + n).selectExpr("id").coalesce(1), path
        )
        lo += n
    last = len(sizes) - 1
    bounds = sorted({c for c in cuts if 0 <= c < last})
    versions = [-1, *bounds, last]  # offsets: consumed-through markers

    reader = ManifestStreamReader({"path": path}, table_schema(path))
    got: list[int] = []
    for a, b in zip(versions, versions[1:]):
        parts = reader.partitions({"version": a}, {"version": b})
        for p in parts:
            for batch in reader.read(p):
                got.extend(batch.to_pydict()["id"])
    assert sorted(got) == list(range(sum(sizes)))
    assert len(got) == sum(sizes)  # no duplicates across any boundary cut
