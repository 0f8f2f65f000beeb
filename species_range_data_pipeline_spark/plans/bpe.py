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

Non-SQL-expressible (iterative argmax + data-dependent rewriting), but
deterministic per corpus, so a scale-keyed VALUES pin (plans/pinned.py) lets the driver hash-check it value-level; the spec-level gate is
``tests/test_bpe.py``'s golden equality against an independent pure-
Python reference implementation.

Determinism: ties on pair count break by (left, right) lexicographic
order, making the merge sequence a pure function of the corpus.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.materialize import materialize_once
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
        ).transform(materialize_once)
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


def encode_word_types(
    words: DataFrame, merges: list[tuple[str, str]], word_col: str = "word"
) -> DataFrame:
    """Apply a trained merge list: adds a ``tokens`` array column holding
    the BPE segmentation of ``word_col``.

    Standard rank-priority encode (the GPT-2 / subword-nmt semantics): at
    each step merge the adjacent pair with the LOWEST merge rank, leftmost
    on ties, until no trained pair remains.  Runs as an Arrow-batched
    pandas UDF with the rank table captured in the closure — merge lists
    are vocabulary-sized (tens of KB at production scale), so they ship
    with the task, not through a join.

    Scale note (100 TB): call this on the WORD-TYPE table (word, wc), not
    on raw tokens — the Zipf collapse means each distinct word is encoded
    exactly once no matter how many billions of times it occurs; weight
    downstream aggregates by wc.
    """
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def enc(col: pd.Series) -> pd.Series:
        def one(w: str) -> list[str]:
            syms = list(w) + [EOW]
            while len(syms) > 1:
                best_rank = None
                best_i = -1
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_rank is None:
                    break
                syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            return syms

        return col.map(one)

    return words.withColumn("tokens", enc(F.col(word_col)))


def bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train ``N_MERGES`` merges on the documents corpus, then ENCODE the
    corpus with them: the full tokenizer round trip (train -> apply) as
    one plan.  Returns the 20 most frequent tokens of the encoded corpus
    (token, token_count), occurrence-weighted via the word-type counts.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(_tokens()).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
        .localCheckpoint()  # reused: training iterates it, encoding scans it
    )
    merges = [(l, r) for _, l, r, _ in train_merges(words)]
    return (
        encode_word_types(words, merges)
        .select("wc", F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.sum("wc").alias("token_count"))
        .orderBy(F.col("token_count").desc(), "token")
        .limit(20)
    )


# The tokenizer round trip has no SQL restatement, but it IS
# deterministic per corpus (greedy merge training with pinned
# tie-breaks), so the expected top-20 rows are pinned per
# documents-table cardinality (sf0.01=500 docs, sf0.1=5000) -- the
# scale-keyed VALUES-oracle trick (see subtitle_cue_stats).
BPE_ENCODE_TOKENS_ORACLE = '''
SELECT token, token_count FROM (VALUES
    (500, '</w>', CAST(12448 AS BIGINT)),
    (500, 'a', CAST(10805 AS BIGINT)),
    (500, 'l', CAST(5525 AS BIGINT)),
    (500, 's', CAST(5481 AS BIGINT)),
    (500, 't', CAST(5343 AS BIGINT)),
    (500, 'c', CAST(4653 AS BIGINT)),
    (500, 'm', CAST(4602 AS BIGINT)),
    (500, 'g', CAST(4474 AS BIGINT)),
    (500, 'e</w>', CAST(4473 AS BIGINT)),
    (500, 'r', CAST(4467 AS BIGINT)),
    (500, 'o', CAST(3710 AS BIGINT)),
    (500, 'n</w>', CAST(2834 AS BIGINT)),
    (500, 'er</w>', CAST(2779 AS BIGINT)),
    (500, 'i', CAST(2773 AS BIGINT)),
    (500, 'ow</w>', CAST(2747 AS BIGINT)),
    (500, 'd', CAST(2732 AS BIGINT)),
    (500, 'b', CAST(2721 AS BIGINT)),
    (500, 'u', CAST(2709 AS BIGINT)),
    (500, 'e', CAST(2696 AS BIGINT)),
    (500, 'or', CAST(2696 AS BIGINT)),
    (5000, '</w>', CAST(171320 AS BIGINT)),
    (5000, 'a', CAST(89864 AS BIGINT)),
    (5000, 'l', CAST(54318 AS BIGINT)),
    (5000, 's', CAST(54134 AS BIGINT)),
    (5000, 't', CAST(53870 AS BIGINT)),
    (5000, 'm', CAST(45518 AS BIGINT)),
    (5000, 'e</w>', CAST(45289 AS BIGINT)),
    (5000, 'g', CAST(45078 AS BIGINT)),
    (5000, 'c', CAST(44955 AS BIGINT)),
    (5000, 'o', CAST(36264 AS BIGINT)),
    (5000, 'h', CAST(35802 AS BIGINT)),
    (5000, 'd', CAST(27489 AS BIGINT)),
    (5000, 'u', CAST(27193 AS BIGINT)),
    (5000, 'in', CAST(27190 AS BIGINT)),
    (5000, 'e', CAST(27129 AS BIGINT)),
    (5000, 'or', CAST(27095 AS BIGINT)),
    (5000, 'r', CAST(27082 AS BIGINT)),
    (5000, 'st', CAST(27060 AS BIGINT)),
    (5000, 'er</w>', CAST(27051 AS BIGINT)),
    (5000, 'ow</w>', CAST(27044 AS BIGINT))
) AS t(n_docs, token, token_count)
WHERE n_docs = (SELECT count(*) FROM documents)
ORDER BY token_count DESC, token
'''


QUERIES = {
    "bpe_train_merges": bpe_train_merges,
    "bpe_encode_tokens": bpe_encode_tokens,
}

from .pinned import BPE_TRAIN_MERGES_ORACLE  # noqa: E402

ORACLES: dict[str, str] = {
    "bpe_encode_tokens": BPE_ENCODE_TOKENS_ORACLE,
    "bpe_train_merges": BPE_TRAIN_MERGES_ORACLE,
}
