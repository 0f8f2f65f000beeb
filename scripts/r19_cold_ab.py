"""r19 cold-protocol A/B cell (VERDICT r18 #6): run ONE variant of ONE
lane in a FRESH process the way the driver's bench does — cold pass +
4 warm passes through the noop sink — and print one JSON line.  An
outer loop alternates variants so box drift hits both equally.

Variants:
  mmr_old   retrieval_mmr_diversify with the r17 un-hinted pair-sims
            self-join (plans as SortMergeJoin)
  mmr_new   the registered lane (pair-sims build side forced broadcast)
  mv_old    mv_incremental_refresh as two filtered partials + union
            (two lineitem scans)
  mv_new    the registered lane (one scan, is_base grouping flag)

Usage: SPARK_GRAFT_CPUS=32 python scripts/r19_cold_ab.py <variant>
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from species_range_data_pipeline_spark.catalog import load_table  # noqa: E402
from species_range_data_pipeline_spark.functions.vectors import (  # noqa: E402
    as_double,
    cosine,
)
from species_range_data_pipeline_spark.plans import retrieval as R  # noqa: E402
from species_range_data_pipeline_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def old_pair_sims(cands):
    a, b = cands.alias("a"), cands.alias("b")
    return a.join(
        b,
        (F.col("a.query_id") == F.col("b.query_id"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.query_id").alias("query_id"),
        F.col("a.vec_id").alias("a_id"),
        F.col("b.vec_id").alias("b_id"),
        F.round(
            cosine(as_double(F.col("a.embedding")),
                   as_double(F.col("b.embedding"))) * 1e6
        ).cast("long").alias("sim_micro"),
    )


def mmr_old(spark, sf_dir):
    cands = R._mmr_candidates(
        load_table(spark, sf_dir, "embeddings")
    ).localCheckpoint(eager=False)
    slim = cands.select("query_id", "vec_id", "rel_micro")
    return (
        slim.groupBy("query_id")
        .cogroup(old_pair_sims(cands).groupBy("query_id"))
        .applyInPandas(
            R._mmr_greedy_kernel,
            "query_id long, rank long, vec_id long, rel_micro long",
        )
        .orderBy("query_id", "rank")
    )


def mmr_new(spark, sf_dir):
    return R.retrieval_mmr_diversify(spark, sf_dir)


def _mv_partials(df, keys, cents):
    return df.groupBy(*keys).agg(
        F.sum(cents).alias("rev_units"),
        F.count(F.lit(1)).alias("n_lines"),
        F.max("l_extendedprice").alias("max_price"),
    )


def mv_old(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    keys = [F.col("l_returnflag").alias("returnflag"),
            F.year("l_shipdate").cast("long").alias("ship_year")]
    base_state = _mv_partials(
        lineitem.where(F.col("l_shipdate") < cutoff), keys, cents
    )
    delta_state = _mv_partials(
        lineitem.where(F.col("l_shipdate") >= cutoff), keys, cents
    )
    merged = base_state.unionByName(delta_state)
    return (
        merged.groupBy("returnflag", "ship_year")
        .agg(
            F.round(F.sum("rev_units") / 10000.0, 2).alias("revenue"),
            F.sum("n_lines").alias("n_lines"),
            F.max("max_price").alias("max_price"),
        )
        .orderBy("returnflag", "ship_year")
    )


def mv_new(spark, sf_dir):
    from species_range_data_pipeline_spark.plans.stats import (
        mv_incremental_refresh,
    )

    return mv_incremental_refresh(spark, sf_dir)


VARIANTS = {
    "mmr_old": mmr_old,
    "mmr_new": mmr_new,
    "mv_old": mv_old,
    "mv_new": mv_new,
}


def main() -> None:
    variant = sys.argv[1]
    fn = VARIANTS[variant]
    spark = get_spark(f"r19-cold-ab-{variant}")
    spark.sparkContext.setLogLevel("ERROR")
    # the bench's infra warm-up (parquet footers + Arrow worker pool)
    for t in ("lineitem", "embeddings"):
        spark.read.parquet(f"{SF}/{t}.parquet").count()
    warm = spark.range(64).selectExpr("id", "id % 32 as g")
    warm.groupBy("g").applyInPandas(
        lambda pdf: pdf.head(1), "id long, g bigint"
    ).count()

    def once() -> float:
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    cold = once()
    warms = [once() for _ in range(4)]
    print(json.dumps({
        "variant": variant,
        "cold": round(cold, 3),
        "warm_median": round(statistics.median(warms), 3),
        "warms": [round(w, 3) for w in warms],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
