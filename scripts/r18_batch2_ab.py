import json, statistics, sys, time
sys.path.insert(0, "/root/repo")
from species_range_data_pipeline_spark.session import get_spark
from species_range_data_pipeline_spark.plans import (
    _old_r18b1_text as ot, _old_r18b1_advanced as oa, _old_r18b1_graph as og,
    _old_r18b1_quality as oq, _old_r18b1_tpch_extra as ox, _old_r18b1_geo as oge,
    _old_r18b1_packing as op,
    text as nt, advanced as na, graph as ng, quality as nq,
    tpch_extra as nx, geo as nge, packing as np_,
)

SF = "/root/testdata/sf0.1"
PAIRS = {
    "ev_funnel": (na.ev_funnel, oa.ev_funnel),
    "graph_triangles": (ng.graph_triangles, og.graph_triangles),
    "text_bm25_topk": (nt.text_bm25_topk, ot.text_bm25_topk),
    "text_tfidf_topk": (nt.text_tfidf_topk, ot.text_tfidf_topk),
    "dedup_ngram_jaccard": (nt.dedup_ngram_jaccard, ot.dedup_ngram_jaccard),
    "dq_checks": (nq.dq_checks, oq.dq_checks),
    "q15_top_supplier": (nx.q15_top_supplier, ox.q15_top_supplier),
    "q17_small_quantity_revenue": (nx.q17_small_quantity_revenue, ox.q17_small_quantity_revenue),
    "geo_range_overlap": (nge.geo_range_overlap, oge.geo_range_overlap),
    "dataset_mixture": (np_.dataset_mixture, op.dataset_mixture),
    "dataset_interleave_epochs": (np_.dataset_interleave_epochs, op.dataset_interleave_epochs),
}

def main():
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    names = sys.argv[2:] or list(PAIRS)
    spark = get_spark("r18_batch2_ab"); spark.sparkContext.setLogLevel("ERROR")

    def rows(df):
        return sorted(tuple(str(x) for x in r) for r in df.select(*sorted(df.columns)).collect())

    for n in names:
        new, old = PAIRS[n]
        assert rows(new(spark, SF)) == rows(old(spark, SF)), n
        print("equal:", n, file=sys.stderr)

    def run(fn):
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for n in names:
        run(PAIRS[n][0]); run(PAIRS[n][1])
    cells = {}
    for p in range(passes):
        for n in names:
            order = [("new", PAIRS[n][0]), ("old", PAIRS[n][1])]
            if p % 2: order.reverse()
            for tag, fn in order:
                cells.setdefault((n, tag), []).append(run(fn))
    out = {}
    for n in names:
        mn = statistics.median(cells[(n, "new")]); mo = statistics.median(cells[(n, "old")])
        out[n] = {"new": round(mn, 3), "old": round(mo, 3), "ratio": round(mn / mo, 3)}
    print(json.dumps(out))
    spark.stop()

main()
