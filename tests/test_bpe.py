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


# ------------------------------------------------------------------- encode


def _reference_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Independent rank-priority BPE encode (GPT-2 / subword-nmt
    semantics): repeatedly merge the lowest-rank adjacent pair, leftmost
    on ties, until none of the trained pairs remains."""
    ranks = {p: i for i, p in enumerate(merges)}
    syms = list(word) + [EOW]
    while len(syms) > 1:
        cands = [
            (ranks[(syms[i], syms[i + 1])], i)
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not cands:
            break
        _, i = min(cands)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


def test_encode_matches_reference_and_roundtrips(spark):
    from species_range_data_pipeline_spark.plans.bpe import encode_word_types

    corpus = {
        "lower": 5, "lowest": 4, "newer": 6, "wider": 3, "new": 7,
        "aaa": 5, "banana": 2, "bandana": 2,
    }
    merges = [(l, r) for _, l, r, _ in _reference_bpe(corpus, 8)]
    words = spark.createDataFrame(
        [(w, c) for w, c in corpus.items()] + [("unseenword", 1)],
        "word string, wc long",
    )
    got = {
        r.word: list(r.tokens)
        for r in encode_word_types(words, merges).collect()
    }
    for w in list(corpus) + ["unseenword"]:
        assert got[w] == _reference_encode(w, merges), w
        # lossless: concatenating tokens reproduces word + EOW
        assert "".join(got[w]) == w + EOW, w


def test_bpe_encode_tokens_query_shape(spark):
    from species_range_data_pipeline_spark.plans.bpe import bpe_encode_tokens

    out = bpe_encode_tokens(spark, SF_CORRECT)
    rows = out.collect()
    assert 0 < len(rows) <= 20
    assert out.columns == ["token", "token_count"]
    counts = [r.token_count for r in rows]
    assert counts == sorted(counts, reverse=True) and counts[-1] > 0
    # encoding is conservative: total token mass can't exceed total
    # character+EOW mass of the corpus (merges only shrink counts)
    assert all(r.token for r in rows)
