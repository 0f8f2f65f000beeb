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
