"""r18 optimization: OLD vs NEW interleaved A/B in one session.

The old (r17, pre-optimization) forms of the changed queries are inlined
here verbatim; each alternation runs new then old (order flipped every
pass) through the noop sink.  Output equality old == new is asserted on
the first pass (collected, stringified, sorted).  Prints one JSON line
with per-query old/new medians+mins and the new/old ratio.
"""
from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from species_range_data_pipeline_spark.catalog import load_table
from species_range_data_pipeline_spark.plans.registry import all_queries
from species_range_data_pipeline_spark.plans.text import _hashed_grams, _tokens
from species_range_data_pipeline_spark.plans.retrieval import (
    _BM25_B, _BM25_K1, _BM25_TERMS, _RRF_K, _TOPN, _QUERY_VEC_ID,
)
from species_range_data_pipeline_spark.functions.vectors import as_double, cosine
from species_range_data_pipeline_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def old_text_bigram_lm(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.posexplode(_tokens()).alias("pos", "w1"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = (
        toks.withColumn("w2", F.lead("w1").over(w))
        .where(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_bigram"))
    )
    unigrams = bigrams.groupBy("w1").agg(F.sum("n_bigram").alias("n_prefix"))
    return (
        bigrams.join(F.broadcast(unigrams), "w1")
        .where(F.col("n_bigram") >= 30)
        .select(
            "w1", "w2", "n_bigram",
            F.round(F.col("n_bigram") / F.col("n_prefix"), 4).alias("p_cond"),
        )
        .orderBy(F.col("n_bigram").desc(), "w1", "w2")
    )


def old_text_decontaminate(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    grams = _hashed_grams(docs).distinct()
    ev = grams.where(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("eval_doc"), "gram"
    )
    tr = grams.where(F.col("doc_id") % 10 != 0).select(
        F.col("doc_id").alias("train_doc"), "gram"
    )
    return (
        ev.join(tr, "gram")
        .groupBy("eval_doc")
        .agg(
            F.countDistinct("train_doc").alias("n_train_docs"),
            F.countDistinct("gram").alias("n_shared_grams"),
        )
        .orderBy("eval_doc")
    )


def old_retrieval_rrf_fusion(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    with_dl = docs.select(
        "doc_id",
        F.size(_tokens()).cast("long").alias("dl"),
        F.filter(_tokens(), lambda w: w.isin(*_BM25_TERMS)).alias("terms"),
    )
    stats = with_dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_total"),
        F.avg("dl").alias("avgdl"),
    )
    tok = with_dl.select("doc_id", "dl", F.explode("terms").alias("word"))
    tf = tok.groupBy("doc_id", "dl", "word").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).cast("double").alias("df"))
    term_scores = (
        tf.join(F.broadcast(dfreq), "word")
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
            F.round(cosine(as_double("embedding"), as_double("qvec")), 6).alias("cos_sim"),
        )
        .withColumn("sem_rank", F.row_number().over(ws).cast("long"))
        .select("doc_id", "sem_rank")
    )
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        F.round(
            F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("sem_rank")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
        "lex_rank",
        "sem_rank",
    )
    wf = Window.orderBy(F.col("rrf_score").desc(), "doc_id")
    return (
        fused.withColumn("rnk", F.row_number().over(wf).cast("long"))
        .where(F.col("rnk") <= _TOPN)
        .orderBy("rnk")
    )


def old_q21(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n3_supp = supplier.join(
        F.broadcast(nation.where(F.col("n_name") == "NATION_3")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    base = (
        lineitem.join(
            orders.where(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .withColumn("late_cutoff", F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .where(F.col("l_shipdate") > F.col("late_cutoff"))
        .join(n3_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", "l_suppkey", "s_name", "late_cutoff")
    )
    others = lineitem.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
        F.col("l_shipdate").alias("o2_shipdate"),
    )
    with_other = base.join(
        others,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    )
    no_other_late = with_other.join(
        others,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey"))
        & (F.col("o2_shipdate") > F.col("late_cutoff")),
        "left_anti",
    )
    return (
        no_other_late.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


def old_merge_upsert(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    updates = orders.where(F.col("o_orderkey") % 10 == 0).select(
        F.col("o_orderkey").alias("c_orderkey"),
        (F.col("o_totalprice") * 1.1).alias("c_totalprice"),
        F.col("o_orderstatus").alias("c_orderstatus"),
    )
    inserts = orders.where(F.col("o_orderkey") % 17 == 3).select(
        (F.col("o_orderkey") + 100000000).alias("c_orderkey"),
        F.col("o_totalprice").alias("c_totalprice"),
        F.lit("N").alias("c_orderstatus"),
    )
    changes = updates.unionByName(inserts)
    return (
        orders.join(changes, F.col("o_orderkey") == F.col("c_orderkey"), "full_outer")
        .select(
            F.coalesce("c_orderstatus", "o_orderstatus").alias("status"),
            F.coalesce("c_totalprice", "o_totalprice").alias("price"),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("price"), 2).alias("total_price"),
        )
        .orderBy("status")
    )


def old_mv_incremental_refresh(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    keys = [F.col("l_returnflag").alias("returnflag"),
            F.year("l_shipdate").cast("long").alias("ship_year")]

    def partials(df):
        return df.groupBy(*keys).agg(
            F.sum(cents).alias("rev_units"),
            F.count(F.lit(1)).alias("n_lines"),
            F.max("l_extendedprice").alias("max_price"),
        )

    base_state = partials(lineitem.where(F.col("l_shipdate") < cutoff))
    delta_state = partials(lineitem.where(F.col("l_shipdate") >= cutoff))
    return (
        base_state.unionByName(delta_state)
        .groupBy("returnflag", "ship_year")
        .agg(
            F.round(F.sum("rev_units") / 10000.0, 2).alias("revenue"),
            F.sum("n_lines").alias("n_lines"),
            F.max("max_price").alias("max_price"),
        )
        .orderBy("returnflag", "ship_year")
    )


OLD = {
    "text_bigram_lm": old_text_bigram_lm,
    "text_decontaminate": old_text_decontaminate,
    "retrieval_rrf_fusion": old_retrieval_rrf_fusion,
    "q21_suppliers_kept_waiting": old_q21,
    "merge_upsert": old_merge_upsert,
    "mv_incremental_refresh": old_mv_incremental_refresh,
}


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    names = sys.argv[2:] or list(OLD)
    spark = get_spark("r18_opt_oldnew_ab")
    spark.sparkContext.setLogLevel("ERROR")
    new = all_queries()

    def rows(df: DataFrame):
        return sorted(tuple(str(x) for x in r)
                      for r in df.select(*sorted(df.columns)).collect())

    for n in names:
        assert rows(new[n](spark, SF)) == rows(OLD[n](spark, SF)), n
        print(f"equal: {n}", file=sys.stderr)

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for n in names:  # warm-up
        run(new[n]); run(OLD[n])
    cells: dict[tuple[str, str], list[float]] = {}
    for p in range(passes):
        for n in names:
            order = [("new", new[n]), ("old", OLD[n])]
            if p % 2:
                order.reverse()
            for tag, fn in order:
                cells.setdefault((n, tag), []).append(run(fn))
    out = {}
    for n in names:
        mn, mo = (statistics.median(cells[(n, t)]) for t in ("new", "old"))
        out[n] = {
            "new_med": round(mn, 3), "old_med": round(mo, 3),
            "new_min": round(min(cells[(n, "new")]), 3),
            "old_min": round(min(cells[(n, "old")]), 3),
            "ratio": round(mn / mo, 3),
        }
    print(json.dumps({"metric": "r18_opt_oldnew_ab", "passes": passes, "q": out}))
    spark.stop()


if __name__ == "__main__":
    main()
