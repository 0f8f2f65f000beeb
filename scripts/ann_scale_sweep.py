"""10x scale sweep for the similarity-search ladder (r11; companion to
SCALE.md rules 23/28/46).

The ANN family had design rules (IVF-as-table-layout, PQ bandwidth
split) and fixture-scale recall pins, but no measured growth curve.
This sweep builds a 10x embeddings table — 10 vec_id-shifted copies,
each perturbed by a tiny per-copy offset on a per-copy dimension so
vectors are distinct while the label (= IVF bucket) structure is
preserved: buckets grow 10x, nlist and nprobe stay fixed, which is
exactly the regime where IVF's probe arithmetic (touch nprobe/nlist of
the corpus) must show — and times the exact/IVF/PQ ladder with
alternating 1x/10x cells through the noop sink (medians of 3; growth
exponent e = log10(t10/t1); 1.0 = linear).  Recall@3 of ANN vs the
same-scale exact brute-force is recomputed AT 10x from the collected
rows, so the ladder's quality claim is re-proven at the scale it is
being timed at, not assumed from the fixture pin.

Prints one JSON line per lane plus a recall trailer.
Usage: python scripts/ann_scale_sweep.py
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from species_range_data_pipeline_spark.catalog import load_table  # noqa: E402
from species_range_data_pipeline_spark.plans import vectors  # noqa: E402
from species_range_data_pipeline_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
MULT = 10
LANES = {
    "cosine_topk": vectors.cosine_topk,        # exact brute baseline
    "ann_ivf_topk": vectors.ann_ivf_topk,      # coarse-probe IVF
    "emb_pq_topk": vectors.emb_pq_topk,        # PQ/ADC + exact re-rank
}


def build_scaled(spark, mult: int) -> str:
    tmp = tempfile.mkdtemp(prefix=f"ann_sweep_{mult}x_")
    emb = load_table(spark, SF, "embeddings")
    copies = emb.withColumn(
        "copy", F.explode(F.array(*[F.lit(i) for i in range(mult)]))
    )
    # distinct vectors per copy: nudge dimension (copy-1) % 64 by
    # 0.05*copy; copy 0 stays pristine so the original queries
    # (vec_id < 5) are byte-identical to the 1x run.  The mod keeps the
    # dimension in range for the 100x arm (dims = 64 < copies); the
    # nudge MAGNITUDE is still copy-unique, so vectors stay distinct.
    perturbed = F.transform(
        "embedding",
        lambda x, i: F.when(
            (F.col("copy") > 0) & (i == (F.col("copy") - 1) % 64),
            x + F.col("copy").cast("float") * F.lit(0.05),
        ).otherwise(x),
    )
    out = copies.select(
        (F.col("vec_id") + F.col("copy").cast("long") * F.lit(10**6)).alias(
            "vec_id"
        ),
        perturbed.alias("embedding"),
        "label",
    )
    out.write.parquet(os.path.join(tmp, "embeddings.parquet"))
    return tmp


def timed(fn, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(int(r.query_id), set()).add(int(r.cand_id))
    return out


def recall_vs_exact(approx: dict, exact: dict) -> float:
    hits = sum(len(approx.get(q, set()) & c) for q, c in exact.items())
    total = sum(len(c) for c in exact.values())
    return hits / total if total else 0.0


def decade2(spark) -> None:
    """Second-decade arm (VERDICT r13 next #7): 10x vs 100x, so the
    100-TB extrapolation for the ladder ordering rests on two measured
    decades instead of one.  Same protocol: alternating cells, medians
    of 3, noop sink; recall@3 of the ANN lanes is recomputed against
    the same-scale exact scan AT 100x."""
    sf10 = build_scaled(spark, 10)
    sf100 = build_scaled(spark, 100)
    for name, fn in LANES.items():
        timed(fn, spark, sf10)  # warm both scales
        timed(fn, spark, sf100)
        cells_10x, cells_100x = [], []
        for _ in range(3):
            cells_10x.append(timed(fn, spark, sf10))
            cells_100x.append(timed(fn, spark, sf100))
        t10 = statistics.median(cells_10x)
        t100 = statistics.median(cells_100x)
        print(json.dumps({
            "lane": name,
            "t10x_med": round(t10, 3),
            "t100x_med": round(t100, 3),
            "second_decade_exponent": round(math.log10(t100 / t10), 3),
            "cells_10x": [round(c, 3) for c in cells_10x],
            "cells_100x": [round(c, 3) for c in cells_100x],
        }), flush=True)
    exact100 = topk_sets(vectors.cosine_topk(spark, sf100))
    print(json.dumps({
        "recall_at_3_vs_exact_100x": {
            nm: round(
                recall_vs_exact(topk_sets(fn(spark, sf100)), exact100), 3
            )
            for nm, fn in LANES.items()
            if nm != "cosine_topk"
        },
        "corpus_rows_100x": load_table(spark, sf100, "embeddings").count(),
    }), flush=True)


def nlist_arm(spark) -> None:
    """nlist sweep at FIXED corpus (VERDICT r14 next #5): the last
    argued-not-measured claim in the ANN family — "at production scale
    the quantizer is k-means-trained with nlist >> 10, where the same
    [nprobe] dial is much cheaper per point of recall" — measured.

    Protocol: the 10x corpus (bucket structure preserved), re-quantized
    by k-means at nlist in {10, 32, 100} (3 Lloyd rounds,
    operators/clustering.kmeans_assign — the production quantizer, not
    the fixture's label stand-in), each relabeled table written once;
    then per nlist, TWO probe modes timed in alternating cells through
    the noop sink: nprobe PROPORTIONAL (20% of nlist — fixed scored
    fraction, the regime where recall should rise at ~flat cost) and
    nprobe FIXED at 2 (falling scored fraction — the regime where cost
    should fall as nlist grows).  Recall@3 vs the same-table exact scan
    is recomputed per cell-config from collected rows."""
    sf10 = build_scaled(spark, 10)
    emb = load_table(spark, sf10, "embeddings")
    exact = topk_sets(vectors.cosine_topk(spark, sf10))

    from species_range_data_pipeline_spark.operators.clustering import (
        kmeans_assign,
    )

    for nlist in (10, 32, 100):
        t0 = time.perf_counter()
        assign, _ = kmeans_assign(emb, k=nlist, iters=3)
        relab = (
            emb.drop("label")
            .join(
                assign.selectExpr(
                    "id AS vec_id", "CAST(cluster AS BIGINT) AS label"
                ),
                "vec_id",
            )
            .select("vec_id", "embedding", "label")
        )
        tmp = tempfile.mkdtemp(prefix=f"ann_nlist_{nlist}_")
        relab.write.parquet(os.path.join(tmp, "embeddings.parquet"))
        train_sec = time.perf_counter() - t0

        modes = {"prop": max(2, round(nlist * 0.2)), "fixed2": 2}
        walls = {m: [] for m in modes}
        for m, np_ in modes.items():  # warm each config once
            timed(lambda s, d: vectors.ann_ivf_topk(s, d, nprobe=np_),
                  spark, tmp)
        for _ in range(3):
            for m, np_ in modes.items():
                walls[m].append(
                    timed(
                        lambda s, d: vectors.ann_ivf_topk(s, d, nprobe=np_),
                        spark,
                        tmp,
                    )
                )
        rec = {
            m: round(
                recall_vs_exact(
                    topk_sets(vectors.ann_ivf_topk(spark, tmp, nprobe=np_)),
                    exact,
                ),
                3,
            )
            for m, np_ in modes.items()
        }
        print(json.dumps({
            "nlist": nlist,
            "nprobe": modes,
            "kmeans_train_sec": round(train_sec, 3),
            "medians": {
                m: round(statistics.median(v), 3) for m, v in walls.items()
            },
            "cells": {
                m: [round(x, 3) for x in v] for m, v in walls.items()
            },
            "recall_at_3_vs_exact": rec,
        }), flush=True)


def main() -> None:
    spark = get_spark("ann-scale-sweep")
    if "--decade2" in sys.argv:
        decade2(spark)
        return
    if "--nlist" in sys.argv:
        nlist_arm(spark)
        return
    sf10 = build_scaled(spark, MULT)
    for name, fn in LANES.items():
        timed(fn, spark, SF)  # warm both scales
        timed(fn, spark, sf10)
        cells_1x, cells_10x = [], []
        for _ in range(3):  # alternating, drift-resistant
            cells_1x.append(timed(fn, spark, SF))
            cells_10x.append(timed(fn, spark, sf10))
        t1 = statistics.median(cells_1x)
        t10 = statistics.median(cells_10x)
        print(json.dumps({
            "lane": name,
            "t1x_med": round(t1, 3),
            "t10x_med": round(t10, 3),
            "growth_exponent": round(math.log10(t10 / t1), 3),
            "cells_1x": [round(c, 3) for c in cells_1x],
            "cells_10x": [round(c, 3) for c in cells_10x],
        }), flush=True)

    exact10 = topk_sets(vectors.cosine_topk(spark, sf10))
    rec = {
        "recall_at_3_vs_exact_10x": {
            nm: round(recall_vs_exact(topk_sets(fn(spark, sf10)), exact10), 3)
            for nm, fn in LANES.items()
            if nm != "cosine_topk"
        },
        "corpus_rows_10x": load_table(spark, sf10, "embeddings").count(),
    }
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
