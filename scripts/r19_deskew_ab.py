"""r19 interleaved A/B: the de-skewed aggregate+join forms vs the r18
hot-key-window forms (VERDICT r18 #3/#4/#5), one session, alternating
cells, outputs asserted equal first (SCALE.md rule 45 discipline —
sequential cross-session comparisons on this box are worthless).

OLD forms below are verbatim re-implementations of the r18 lanes
(commit 33ab2f6) kept inline so both variants run in one session.

Usage: SPARK_GRAFT_CPUS=32 python scripts/r19_deskew_ab.py [lane ...]
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from species_range_data_pipeline_spark.catalog import load_table  # noqa: E402
from species_range_data_pipeline_spark.plans import registry  # noqa: E402
from species_range_data_pipeline_spark.plans.text import (  # noqa: E402
    _BM25_B,
    _BM25_K1,
    _BM25_TERMS,
    _tokens,
)
from species_range_data_pipeline_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


# ---- r18 forms (hot-key windows / collect_list), verbatim ----------------

def old_text_bm25_topk(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with_dl = docs.select(
        "doc_id",
        F.size(_tokens()).cast("long").alias("dl"),
        F.filter(_tokens(), lambda w: w.isin(*_BM25_TERMS)).alias("terms"),
    ).localCheckpoint(eager=False)
    stats = with_dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_total"),
        F.avg("dl").alias("avgdl"),
    )
    tok = with_dl.select("doc_id", "dl", F.explode("terms").alias("word"))
    tf = tok.groupBy("doc_id", "dl", "word").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    wd = Window.partitionBy("word")
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(wd).cast("double"))
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    (F.col("n_total") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                    + 1.0
                )
                * (F.col("tf") * (_BM25_K1 + 1))
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
        .select(
            "doc_id",
            F.round(F.col("term_score") * 1e6).cast("long").alias("micro"),
        )
    )
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("micro") / 1e6, 6).alias("score"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 15)
        .orderBy("rnk")
    )


def old_retrieval_rrf_fusion(spark, sf_dir):
    from species_range_data_pipeline_spark.functions.vectors import (
        as_double,
        cosine,
    )
    from species_range_data_pipeline_spark.plans.retrieval import (
        _QUERY_VEC_ID,
        _RRF_K,
        _TOPN,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    with_dl = docs.select(
        "doc_id",
        F.size(_tokens()).cast("long").alias("dl"),
        F.filter(_tokens(), lambda w: w.isin(*_BM25_TERMS)).alias("terms"),
    ).localCheckpoint(eager=False)
    stats = with_dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_total"),
        F.avg("dl").alias("avgdl"),
    )
    tok = with_dl.select("doc_id", "dl", F.explode("terms").alias("word"))
    tf = tok.groupBy("doc_id", "dl", "word").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    wd = Window.partitionBy("word")
    term_scores = (
        tf.withColumn("df", F.count(F.lit(1)).over(wd).cast("double"))
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                F.log(
                    (F.col("n_total") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                    + 1.0
                )
                * (F.col("tf") * (_BM25_K1 + 1))
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
                )
                * 1e6
            )
            .cast("long")
            .alias("micro"),
        )
    )
    wl = Window.orderBy(F.col("lex_micro").desc(), "doc_id")
    lex = (
        term_scores.groupBy("doc_id")
        .agg(F.sum("micro").alias("lex_micro"))
        .withColumn("lex_rank", F.row_number().over(wl).cast("long"))
        .select("doc_id", "lex_rank")
    )
    qvec = emb.where(F.col("vec_id") == _QUERY_VEC_ID).select(
        F.col("embedding").alias("qvec")
    )
    ws = Window.orderBy(F.col("cos_sim").desc(), "doc_id")
    sem = (
        emb.where(F.col("vec_id") != _QUERY_VEC_ID)
        .crossJoin(F.broadcast(qvec))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(as_double("embedding"), as_double("qvec")), 6).alias(
                "cos_sim"
            ),
        )
        .withColumn("sem_rank", F.row_number().over(ws).cast("long"))
        .select("doc_id", "sem_rank")
    )
    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(
                    1.0 / (F.lit(_RRF_K) + F.col("sem_rank")), F.lit(0.0)
                ),
                6,
            ).alias("rrf_score"),
            "lex_rank",
            "sem_rank",
        )
    )
    wf = Window.orderBy(F.col("rrf_score").desc(), "doc_id")
    return (
        fused.withColumn("rnk", F.row_number().over(wf).cast("long"))
        .where(F.col("rnk") <= _TOPN)
        .orderBy("rnk")
    )


def old_text_tfidf_topk(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", F.explode(_tokens()).alias("word"))
        .where(F.col("word") != "")
    )
    tf = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("n_dw"))
    n_total = docs.agg(F.count(F.lit(1)).alias("n_total"))
    wd = Window.partitionBy("word")
    scored = (
        tf.withColumn("n_docs_with", F.count(F.lit(1)).over(wd))
        .where(F.col("doc_id") < 20)
        .crossJoin(F.broadcast(n_total))
        .select(
            "doc_id",
            "word",
            F.round(
                F.col("n_dw") * F.log(F.col("n_total") / F.col("n_docs_with")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "word")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .orderBy("doc_id", "rnk")
    )


def old_dedup_repeated_ngrams(spark, sf_dir):
    W = 6
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _tokens().alias("t"))
    args = ",".join(
        f"t[i{'+' + str(j - 1) if j else '-1'}]" for j in range(W)
    )
    grams = (
        toks.where(F.size("t") >= W)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(t)-{W - 1}),"
                    f" i -> xxhash64({args}))"
                )
            ).alias("gram"),
        )
        .distinct()
    )
    wg = Window.partitionBy("gram")
    return (
        grams.withColumn("nd", F.count(F.lit(1)).over(wg))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.count_if(F.col("nd") >= 2).alias("n_dup_windows"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            F.round(
                F.col("n_dup_windows") / F.col("n_windows"), 4
            ).alias("dup_ratio"),
        )
        .orderBy("doc_id")
    )


def old_text_perplexity(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.posexplode(_tokens()).alias("pos", "w1"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = toks.withColumn("w2", F.lead("w1").over(w)).where(
        F.col("w2").isNotNull()
    )
    doc_bigrams = pairs.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).alias("m")
    )
    wbg = Window.partitionBy("w1", "w2")
    wpf = Window.partitionBy("w1")
    scored = (
        doc_bigrams.withColumn("n_bigram", F.sum("m").over(wbg))
        .withColumn("n_prefix", F.sum("m").over(wpf))
        .withColumn("p", F.col("n_bigram") / F.col("n_prefix"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("m").alias("n_bigrams"),
            F.round(
                F.sum(-F.col("m") * F.log2("p")) / F.sum("m"), 3
            ).alias("avg_bits"),
        )
        .orderBy("doc_id")
    )


def old_ev_funnel(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    per_user = (
        events.where(
            F.col("event_type").isin("view", "click", "purchase")
        )
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "view", F.col("ts"))
            ).alias("t_view"),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("event_type") == "click", F.col("ts"))
                )
            ).alias("clicks"),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("event_type") == "purchase", F.col("ts"))
                )
            ).alias("purchases"),
        )
    )
    t_click = F.array_min(
        F.filter("clicks", lambda c: c > F.col("t_view"))
    )
    staged = per_user.select(
        "t_view",
        t_click.alias("t_click"),
        "purchases",
    ).select(
        "t_view",
        "t_click",
        F.array_min(
            F.filter("purchases", lambda p: p > F.col("t_click"))
        ).alias("t_purchase"),
    )
    return staged.agg(
        F.count(F.when(F.col("t_view").isNotNull(), 1)).alias("n_viewed"),
        F.count(F.when(F.col("t_click").isNotNull(), 1)).alias("n_clicked"),
        F.count(
            F.when(F.col("t_purchase").isNotNull(), 1)
        ).alias("n_purchased"),
    )


OLD = {
    "text_bm25_topk": old_text_bm25_topk,
    "retrieval_rrf_fusion": old_retrieval_rrf_fusion,
    "text_tfidf_topk": old_text_tfidf_topk,
    "dedup_repeated_ngrams": old_dedup_repeated_ngrams,
    "text_perplexity": old_text_perplexity,
    "ev_funnel": old_ev_funnel,
}


def run_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    lanes = sys.argv[1:] or list(OLD)
    spark = get_spark("r19-deskew-ab")
    spark.sparkContext.setLogLevel("ERROR")
    new_qs = registry.all_queries()
    passes = 5
    for lane in lanes:
        old_fn, new_fn = OLD[lane], new_qs[lane]
        a = sorted(map(tuple, old_fn(spark, SF).collect()))
        b = sorted(map(tuple, new_fn(spark, SF).collect()))
        assert a == b, f"{lane}: outputs differ"
        # warm both once, then alternate
        run_noop(old_fn(spark, SF))
        run_noop(new_fn(spark, SF))
        olds, news = [], []
        for i in range(passes):
            spark.sparkContext.setJobDescription(f"{lane} old#{i}")
            olds.append(run_noop(old_fn(spark, SF)))
            spark.sparkContext.setJobDescription(f"{lane} new#{i}")
            news.append(run_noop(new_fn(spark, SF)))
        spark.sparkContext.setJobDescription(None)
        mo, mn = statistics.median(olds), statistics.median(news)
        print(
            f"{lane}: old med {mo:.3f}s new med {mn:.3f}s "
            f"-> new/old {mn / mo:.2f}x  (old {sorted(olds)}, "
            f"new {sorted(news)})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
