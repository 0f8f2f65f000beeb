"""Distributed BPE merge training (Sennrich et al. 2016, ACL).

Learns the first K byte-pair merges from the ``documents`` corpus — the
tokenizer-TRAINING half of the BPE story (`text_token_count_bpe` is the
counting half).  The classic algorithm iterates: count adjacent symbol
pairs weighted by word frequency, merge the most frequent pair
everywhere, repeat.

Distributed shape (the reason this scales to 100 TB while the reference
algorithm is a single-process dict loop):

- The iteration state is the WORD-TYPE table (word, count, symbols),
  which is Zipf-small relative to the corpus — one initial explode +
  groupBy collapses the 100 TB of text into it, and nothing downstream
  ever rescans the corpus.
- Pair counting per round is explode(arrays_zip(slice, slice)) ->
  groupBy(pair) with map-side partial aggregation; only the single
  argmax row is collected to the driver (k rounds -> k one-row
  collects, the same driver-footprint discipline as
  ``operators/clustering.py``).
- The merge application is a pure JVM higher-order ``aggregate`` over
  the symbol array (leftmost-greedy with skip — exactly the reference
  semantics for overlapping pairs like 'a a a'), so no Python touches
  the vocab table.
- ``localCheckpoint`` per round keeps the plan flat (SCALE.md rule 9,
  as in ``plans/graph.py``'s PageRank loop).

Non-SQL-expressible (iterative argmax + data-dependent rewriting), so
this is a rows-only driver query; the spec-level gate is
``tests/test_bpe.py``'s golden equality against an independent pure-
Python reference implementation.

Determinism: ties on pair count break by (left, right) lexicographic
order, making the merge sequence a pure function of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .text import _tokens

#: merges to learn for the driver query (enough to show multi-char
#: tokens forming; production vocabularies run the same loop longer)
N_MERGES = 12

#: end-of-word sentinel, as in the reference implementation
EOW = "</w>"


def _merge_pair(syms: Column, left: str, right: str) -> Column:
    """Replace every leftmost-greedy adjacent (left, right) in the symbol
    array with their concatenation — a JVM ``aggregate`` fold, no UDF."""
    merged = left + right
    return F.aggregate(
        F.sequence(F.lit(1), F.size(syms)),
        F.struct(
            F.array().cast("array<string>").alias("acc"),
            F.lit(False).alias("skip"),
        ),
        lambda st, i: F.when(
            st["skip"],
            F.struct(st["acc"].alias("acc"), F.lit(False).alias("skip")),
        )
        .when(
            (i < F.size(syms))
            & (F.element_at(syms, i) == F.lit(left))
            & (F.element_at(syms, i + F.lit(1)) == F.lit(right)),
            F.struct(
                F.concat(st["acc"], F.array(F.lit(merged))).alias("acc"),
                F.lit(True).alias("skip"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(st["acc"], F.array(F.element_at(syms, i))).alias("acc"),
                F.lit(False).alias("skip"),
            )
        ),
        lambda st: st["acc"],
    )


def train_merges(
    words: DataFrame, n_merges: int = N_MERGES
) -> list[tuple[int, str, str, int]]:
    """(word, wc) DataFrame -> [(step, left, right, pair_count), ...].

    The returned list is driver-sized (n_merges entries); the vocab table
    stays distributed throughout.
    """
    cur = words.select(
        "wc",
        F.concat(
            F.filter(F.split("word", ""), lambda x: x != ""),
            F.array(F.lit(EOW)),
        ).alias("syms"),
    ).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for step in range(n_merges):
        pairs = cur.select(
            "wc",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(syms, 1, size(syms)-1)").alias("l"),
                    F.expr("slice(syms, 2, size(syms)-1)").alias("r"),
                )
            ).alias("p"),
        ).select("wc", F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        best = (
            pairs.groupBy("l", "r")
            .agg(F.sum("wc").alias("n"))
            .orderBy(F.col("n").desc(), "l", "r")
            .first()
        )
        if best is None or best["n"] < 2:
            break  # corpus exhausted: every remaining pair is unique
        merges.append((step, best["l"], best["r"], int(best["n"])))
        cur = cur.select(
            "wc", _merge_pair(F.col("syms"), best["l"], best["r"]).alias("syms")
        ).localCheckpoint(eager=False)
    return merges


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first ``N_MERGES`` learned merges as a table
    (step, left, right, merged, pair_count)."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(_tokens()).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    merges = train_merges(words)
    return spark.createDataFrame(
        [(s, l, r, l + r, n) for s, l, r, n in merges],
        "step int, left string, right string, merged string, pair_count long",
    ).orderBy("step")


QUERIES = {
    "bpe_train_merges": bpe_train_merges,
}

ORACLES: dict[str, str] = {}
