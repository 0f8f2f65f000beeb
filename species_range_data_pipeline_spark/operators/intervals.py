"""Generic interval-overlap join as a bin-and-refine equi-join.

Spark has no native interval/range join (Sedona and DBR add one); the
scale-safe composition is: map every interval ``[s, e]`` onto fixed-width
epoch bins, equi-join on the bin id, refine with the exact theta
predicate, and emit each qualifying pair from exactly ONE bin — the
"reporting bin" that contains ``greatest(left.s, right.s)``.  When two
closed intervals overlap, the later of the two starts lies inside both,
so both sides generated that bin and the guard fires exactly once; no
``distinct`` shuffle is needed afterwards.

At 100 TB this is one co-partitioned shuffle on an 8-byte bin key with a
bounded fan-out of ``ceil(len / bin) + 1`` rows per interval, versus the
broadcast-nested-loop a raw theta join degenerates to.  Pick ``bin_size``
near the typical interval length: too small explodes rows, too large
degrades refine selectivity (many candidates share a bin).  The
round-4 query `plans/relational.py::join_interval_overlap` hardcoded a
16-day bin for its fixed 10-day windows; this operator generalizes to
arbitrary (multi-bin) interval lengths, including auto-tuning the bin
from a length quantile.

Reference parity note: the reference ETL (species_range_etl.py) has no
temporal join; this belongs to the builder's-brief extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIN = "__iv_bin"


def _day_number(df: DataFrame, col: str) -> Column:
    """Integer position of an interval endpoint: days for date/timestamp
    columns, the value itself for integer columns."""
    dtype = dict(df.dtypes)[col]
    if dtype == "date":
        return F.unix_date(F.col(col))
    if dtype.startswith("timestamp"):
        return F.unix_date(F.to_date(col))
    return F.col(col).cast("long")


def _binned(df: DataFrame, start: str, end: str, bin_size: int, tag: str) -> DataFrame:
    s = _day_number(df, start)
    e = _day_number(df, end)
    out = df.withColumn(f"__iv_s_{tag}", s).withColumn(f"__iv_e_{tag}", e)
    # floor-division bins; sequence() is inclusive on both ends so an
    # interval spanning k bin boundaries yields k+1 rows — bounded fan-out.
    return out.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.floor(F.col(f"__iv_s_{tag}") / bin_size),
                F.floor(F.col(f"__iv_e_{tag}") / bin_size),
            )
        ),
    )


def _p90_len(df: DataFrame, start: str, end: str) -> int:
    row = (
        df.select((_day_number(df, end) - _day_number(df, start)).alias("len"))
        .agg(F.expr("approx_percentile(len, 0.9)").alias("p90"))
        .first()
    )
    return int(row["p90"] or 0)


def auto_bin_size(
    left: DataFrame,
    start: str,
    end: str,
    right: DataFrame | None = None,
    right_span: tuple[str, str] | None = None,
) -> int:
    """Bin width from the p90 interval length of BOTH sides (two bounded
    aggregates; driver holds one row each) — most intervals then span
    <= 2 bins.  Sizing from one side alone is a trap: point-like left
    intervals (p90 0 -> bin 1) against year-long right intervals would
    explode every right row into ~365 bin rows, the exact fan-out this
    operator exists to bound."""
    p90 = _p90_len(left, start, end)
    if right is not None and right_span is not None:
        p90 = max(p90, _p90_len(right, *right_span))
    return max(1, p90 + 1)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_span: tuple[str, str],
    right_span: tuple[str, str],
    bin_size: int | None = None,
    extra_on: list[str] | None = None,
) -> DataFrame:
    """Join rows whose closed intervals ``[start, end]`` overlap.

    ``left_span`` / ``right_span`` name (start, end) columns — DATE,
    TIMESTAMP (date-granularity) or integer typed.  ``extra_on`` adds
    equality keys to the join (e.g. a tenant/species id), which tightens
    the shuffle key and the refine set.  Output columns = all left
    columns then all right columns; callers select/alias (colliding names
    must be disambiguated by the caller first, as with any Spark join).

    Each overlapping pair is emitted exactly once (reporting-bin guard);
    the result is identical to the all-pairs theta join
    ``l.s <= r.e AND r.s <= l.e`` — property-pinned in
    tests/test_intervals.py against that oracle.
    """
    ls, le = left_span
    rs, re_ = right_span
    clash = [
        c for c in (*left.columns, *right.columns) if c.startswith("__iv")
    ]
    if clash:
        raise ValueError(
            f"input columns {sorted(set(clash))} collide with the "
            "operator's reserved '__iv' prefix — rename them first "
            "(they would be silently dropped from the output otherwise)"
        )
    if bin_size is None:
        bin_size = auto_bin_size(left, ls, le, right, right_span)
    if bin_size < 1:
        raise ValueError(f"bin_size must be >= 1, got {bin_size}")

    a = _binned(left, ls, le, bin_size, "l")
    b = _binned(right, rs, re_, bin_size, "r")
    on = [_BIN, *(extra_on or [])]
    pairs = a.join(b, on).where(
        (F.col("__iv_s_l") <= F.col("__iv_e_r"))
        & (F.col("__iv_s_r") <= F.col("__iv_e_l"))
        & (
            F.col(_BIN)
            == F.floor(F.greatest("__iv_s_l", "__iv_s_r") / bin_size)
        )
    )
    keep = [c for c in pairs.columns if not c.startswith("__iv")]
    return pairs.select(*keep)
