"""BPE merge training: the distributed loop must reproduce, merge for
merge, an independent pure-Python reference implementation of the
Sennrich et al. algorithm on the same corpus (golden equality — the
rows-only substitute for a SQL oracle), plus overlap/tie semantics."""

from __future__ import annotations

import re
from collections import Counter

from species_range_data_pipeline_spark.plans.bpe import (
    EOW,
    N_MERGES,
    bpe_train_merges,
    train_merges,
)

from .conftest import SF_CORRECT


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Dict-loop BPE exactly as in the published algorithm: count every
    adjacent pair occurrence (overlaps included) weighted by word count,
    merge the (count desc, left, right) argmax leftmost-greedily."""
    vocab = {
        tuple(list(w) + [EOW]): c for w, c in word_counts.items()
    }
    merges = []
    for step in range(n_merges):
        stats: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        (left, right), n = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < 2:
            break
        merges.append((step, left, right, n))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_spark_bpe_matches_reference_on_fixture_corpus(spark):
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    texts = [r.text for r in docs.select("text").collect()]
    wc: Counter = Counter()
    for t in texts:
        for w in re.sub(r"\s+", " ", t).strip().split(" "):
            if w:
                wc[w] += 1

    want = _reference_bpe(dict(wc), N_MERGES)
    got = [
        (r.step, r.left, r.right, r.pair_count)
        for r in bpe_train_merges(spark, SF_CORRECT).collect()
    ]
    assert got == want and len(got) == N_MERGES
    assert [s for s, *_ in got] == list(range(N_MERGES))
    # every learned merge is distinct and earned its spot (count >= 2)
    assert len({(l, r) for _, l, r, _ in got}) == N_MERGES
    assert all(n >= 2 for *_, n in got)


def test_overlapping_pair_and_tie_semantics(spark):
    """'a a a' merges leftmost-greedily (one 'aa', one 'a'), and count
    ties break lexicographically — pinned against the reference."""
    words = spark.createDataFrame(
        [("aaa", 5), ("bc", 5), ("bd", 5)], "word string, wc long"
    )
    got = train_merges(words, n_merges=2)
    want = _reference_bpe({"aaa": 5, "bc": 5, "bd": 5}, 2)
    assert got == want
    # first merge: ('a','a') count 10 (two overlapping occurrences in each
    # 'aaa') beats ('b','c')/('b','d') at 5... verify the arithmetic holds
    assert got[0][1:] == ("a", "a", 10)
