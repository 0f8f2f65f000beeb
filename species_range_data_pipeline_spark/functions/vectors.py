"""Vector math over ArrayType(Float/Double) columns as pure column
expressions (``F.aggregate`` / ``F.zip_with``) — stays in the JVM, no Python
round trip, vectorizable by codegen.

At 100 TB the alternative (a Pandas UDF per pair) pays an Arrow serialize on
every batch; these expressions run inside the join/aggregate stage itself.
For very high dimensions (>~4k) a pandas_udf with numpy BLAS wins back —
see operators/similarity.py for that variant.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column | str) -> Column:
    """Cast array<float> -> array<double>: float32 sums drift; the engine
    (and the DuckDB oracle) accumulate in fp64."""
    return F.col(v).cast("array<double>") if isinstance(v, str) else v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — same accumulation order as a loop."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
