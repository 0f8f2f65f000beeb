"""r18: MMR pair-sims broadcast-vs-SMJ interleaved A/B (one session).
Old = self-join without the broadcast hint (r17 shape).  Equality
asserted first.  Prints one JSON line."""
from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from species_range_data_pipeline_spark.catalog import load_table
from species_range_data_pipeline_spark.functions.vectors import as_double, cosine
from species_range_data_pipeline_spark.plans import retrieval as R
from species_range_data_pipeline_spark.session import get_spark

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


def old_tail(cands):
    cands = cands.localCheckpoint(eager=False)
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


def new_fn(spark):
    emb = load_table(spark, SF, "embeddings")
    return R._mmr_tail(R._mmr_candidates(emb))


def old_fn(spark):
    emb = load_table(spark, SF, "embeddings")
    return old_tail(R._mmr_candidates(emb))


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = get_spark("r18_mmr_bcast_ab")
    spark.sparkContext.setLogLevel("ERROR")

    def rows(df):
        return sorted(tuple(str(x) for x in r)
                      for r in df.select(*sorted(df.columns)).collect())

    assert rows(new_fn(spark)) == rows(old_fn(spark))
    print("equal", file=sys.stderr)

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(spark).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run(new_fn); run(old_fn)  # warm-up
    cells = {"new": [], "old": []}
    for p in range(passes):
        order = [("new", new_fn), ("old", old_fn)]
        if p % 2:
            order.reverse()
        for tag, fn in order:
            cells[tag].append(run(fn))
    out = {t: {"med": round(statistics.median(v), 3),
               "min": round(min(v), 3)} for t, v in cells.items()}
    out["ratio"] = round(out["new"]["med"] / out["old"]["med"], 3)
    print(json.dumps({"metric": "r18_mmr_bcast_ab", "passes": passes, **out}))
    spark.stop()


if __name__ == "__main__":
    main()
