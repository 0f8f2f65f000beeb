"""Property tests for the round-7 rewritten text operators.

The fixture-corpus oracles (DuckDB parity at sf0.01/sf0.1) pin these
operators on realistic data; hypothesis corpora hit the edges those
corpora can't be trusted to contain — docs shorter than the gram width,
byte-identical duplicate docs, grams repeated WITHIN one doc only (must
NOT be flagged: sharing requires >= 2 distinct docs), overlapping flagged
spans, and docs whose every position is cut.  The references below
implement the SPEC (Lee et al. span cutting; Charikar simhash voting)
independently in pure Python, so agreement is two implementations of the
math, not the engine checking itself.
"""

from __future__ import annotations

import hashlib

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# tiny alphabet so hypothesis actually produces cross-doc shared 6-grams
_TOKEN = st.sampled_from(["a", "b", "ab", "x", "zz"])
_DOC = st.lists(_TOKEN, min_size=1, max_size=14)
_CORPUS = st.lists(_DOC, min_size=1, max_size=7)


def _ref_substring_cut(docs: list[list[str]], W: int = 6):
    """Pure-Python spec: cut every W-token span whose token tuple appears
    in >= 2 distinct docs (every occurrence, by span union)."""
    gram_docs: dict[tuple, set] = {}
    for did, toks in enumerate(docs):
        for s in range(len(toks) - W + 1):
            gram_docs.setdefault(tuple(toks[s : s + W]), set()).add(did)
    shared = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    out = []
    for did, toks in enumerate(docs):
        covered = set()
        for s in range(len(toks) - W + 1):
            if tuple(toks[s : s + W]) in shared:
                covered.update(range(s, s + W))
        kept = [t for p, t in enumerate(toks) if p not in covered]
        out.append(
            (
                did,
                len(toks),
                len(kept),
                hashlib.md5(" ".join(kept).encode()).hexdigest(),
            )
        )
    return out


def _ref_simhash(toks: list[str]) -> str:
    """Pure-Python spec: bit b of the signature is the sign of the sum of
    +-1 votes, where token t votes +1 iff bit b%4 of hex digit b//4 of
    md5(t) is set (strictly positive sum -> '1')."""
    n = len(toks)
    bits = []
    for b in range(64):
        j, i = b // 4, b % 4
        sb = sum(
            1
            for t in toks
            if (int(hashlib.md5(t.encode()).hexdigest()[j], 16) >> i) & 1
        )
        bits.append("1" if 2 * sb > n else "0")
    return "".join(bits)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_CORPUS)
@pytest.mark.slow  # r19 slow tier: pure-python re-derivation; dedup_substring_cut oracle parity stays default
def test_substring_cut_matches_pure_python_reference(spark, corpus):
    from species_range_data_pipeline_spark.plans.text import substring_cut

    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(corpus)],
        "doc_id long, text string",
    )
    got = [
        (r.doc_id, r.n_tokens, r.n_kept, r.cleaned_md5)
        for r in substring_cut(docs).collect()
    ]
    assert got == _ref_substring_cut(corpus)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_CORPUS)
@pytest.mark.slow  # r19 slow tier: pure-python re-derivation; dedup_simhash oracle parity stays default
def test_simhash_matches_pure_python_reference(spark, corpus):
    from species_range_data_pipeline_spark.plans.text import simhash_signatures

    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(corpus)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.simhash for r in simhash_signatures(docs).collect()}
    assert got == {i: _ref_simhash(toks) for i, toks in enumerate(corpus)}


def test_substring_cut_duplicate_docs_cut_everything(spark):
    """Two byte-identical 6-token docs: every position is covered, both
    clean to the empty string; a third unrelated short doc is untouched."""
    from species_range_data_pipeline_spark.plans.text import substring_cut

    docs = spark.createDataFrame(
        [
            (0, "a b c d e f"),
            (1, "a b c d e f"),
            (2, "x y"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in substring_cut(docs).collect()}
    empty_md5 = hashlib.md5(b"").hexdigest()
    assert rows[0].n_kept == 0 and rows[0].cleaned_md5 == empty_md5
    assert rows[1].n_kept == 0 and rows[1].cleaned_md5 == empty_md5
    assert rows[2].n_kept == 2


def test_substring_cut_within_doc_repeat_not_flagged(spark):
    """A 6-gram repeated twice INSIDE one doc but in no other doc is not
    'shared' — sharing requires two distinct doc_ids."""
    from species_range_data_pipeline_spark.plans.text import substring_cut

    text = "a b c d e f a b c d e f"  # same gram twice, one doc
    docs = spark.createDataFrame(
        [(0, text), (1, "q r s")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in substring_cut(docs).collect()}
    assert rows[0].n_kept == rows[0].n_tokens == 12


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=39),  # doc_id: dense, so
            # the %10>=8 batch split and cross-doc bucket sharing both
            # actually occur
            st.integers(min_value=0, max_value=2),  # band
            st.integers(min_value=0, max_value=4),  # bucket: tiny pool
            # so shared buckets are the norm, not the exception
        ),
        min_size=1,
        max_size=60,
    )
)
@pytest.mark.slow  # r19 slow tier: pair-join reference; incremental-manifest oracle lanes stay default
def test_bucket_min_incremental_matches_pair_join_reference(spark, rows):
    """The aggregation-only incremental dedup tail's load-bearing claim
    (``_bucket_min_incremental``: "the only candidate that can matter is
    the bucket MINIMUM") pinned by property against the brute-force
    definition — dup_of(b) = min{a < b sharing any (band, bucket)} —
    on adversarial banded relations: heavy bucket collisions, duplicate
    (doc, band, bucket) rows, docs present in several buckets, empty
    batch splits."""
    from species_range_data_pipeline_spark.plans.text import (
        _bucket_min_incremental,
    )

    banded = spark.createDataFrame(
        rows, "doc_id long, band int, bucket int"
    )
    got = {
        r["doc_id"]: (r["dup_of"], r["is_dup"])
        for r in _bucket_min_incremental(banded).collect()
    }

    by_bucket: dict[tuple, set] = {}
    for d, band, bucket in rows:
        by_bucket.setdefault((band, bucket), set()).add(d)
    docs = {d for d, _, _ in rows}
    expected = {}
    for b in sorted(docs):
        if b % 10 < 8:
            continue
        partners = {
            a
            for members in by_bucket.values()
            if b in members
            for a in members
            if a < b
        }
        dup_of = min(partners) if partners else None
        expected[b] = (dup_of, dup_of is not None)
    assert got == expected


def test_incremental_dedup_manifest_registered_wrapper(spark):
    """The REGISTERED (spark, sf_dir) form (r14): first call pays the
    signature-ingest half into a session-scoped scratch manifest, later
    calls reuse it (the production shape — ingest amortized).  Pins
    (a) row identity with the oracle-backed recomputed lane, (b) the
    cache: second construction resolves the SAME manifest path and
    writes no new manifest version."""
    from species_range_data_pipeline_spark.plans.text import (
        _SIG_MANIFEST_CACHE,
        dedup_incremental_minhash,
        dedup_incremental_minhash_manifest_query,
    )
    from species_range_data_pipeline_spark.sources.manifest_table import (
        table_versions,
    )

    from .conftest import SF_SMOKE

    _SIG_MANIFEST_CACHE.clear()  # isolate from other tests in-session
    ref = [
        tuple(r) for r in dedup_incremental_minhash(spark, SF_SMOKE).collect()
    ]
    got1 = [
        tuple(r)
        for r in dedup_incremental_minhash_manifest_query(
            spark, SF_SMOKE
        ).collect()
    ]
    assert got1 == ref and len(got1) > 0
    import os

    # cache key includes the Spark application id (ADVICE r14: a new
    # session against the same path must re-ingest, not reuse stale
    # signatures)
    key = (spark.sparkContext.applicationId, os.path.abspath(SF_SMOKE))
    path1 = _SIG_MANIFEST_CACHE[key]
    v1 = table_versions(path1)
    got2 = [
        tuple(r)
        for r in dedup_incremental_minhash_manifest_query(
            spark, SF_SMOKE
        ).collect()
    ]
    assert got2 == ref
    assert _SIG_MANIFEST_CACHE[key] == path1
    assert table_versions(path1) == v1  # no re-ingest


def test_incremental_dedup_manifest_fed_scans_no_corpus_text(spark, tmp_path):
    """Production incremental dedup (VERDICT r12 next #2): corpus-side
    banded MinHash signatures persisted to a manifest table at ingest;
    the nightly batch lane reads THEM, never the corpus text.  Pins (a)
    identical rows to the oracle-backed recomputed lane, and (b) the
    plan: exactly ONE text-bearing FileScan — the batch side, carrying
    the batch predicate — so corpus-side documents.text bytes scanned
    is zero by construction."""
    from pyspark.sql import functions as F

    from species_range_data_pipeline_spark.catalog import load_table
    from species_range_data_pipeline_spark.plans.text import (
        dedup_incremental_minhash,
        dedup_incremental_minhash_manifest,
        incremental_banded_lineage,
        persist_corpus_signatures,
    )

    from .conftest import SF_SMOKE

    path = str(tmp_path / "sigs")
    corpus = load_table(spark, SF_SMOKE, "documents").where(
        F.col("doc_id") % 10 < 8
    )
    assert persist_corpus_signatures(corpus, path) == 0  # first version

    ref = [tuple(r) for r in dedup_incremental_minhash(spark, SF_SMOKE).collect()]
    got = [
        tuple(r)
        for r in dedup_incremental_minhash_manifest(
            spark, SF_SMOKE, path
        ).collect()
    ]
    assert got == ref and len(got) > 0

    plan = (
        incremental_banded_lineage(spark, SF_SMOKE, path)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    text_scans = [
        ln for ln in plan.splitlines() if "FileScan" in ln and "text#" in ln
    ]
    assert len(text_scans) == 1, plan  # batch side only
    assert "% 10) >= 8" in text_scans[0]  # and it IS the batch side
    sig_scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan" in ln and "band#" in ln and "bucket#" in ln
    ]
    assert len(sig_scans) == 1 and "text#" not in sig_scans[0]


def test_persist_corpus_signatures_txn_replay_noops(spark, tmp_path):
    """Streaming-ingest idempotency: a replayed commit (same txn) must
    no-op, so signature ingest composes with exactly-once sinks."""
    from pyspark.sql import functions as F

    from species_range_data_pipeline_spark.catalog import load_table
    from species_range_data_pipeline_spark.plans.text import (
        persist_corpus_signatures,
    )
    from species_range_data_pipeline_spark.sources.manifest_table import (
        read_manifest_table,
    )

    from .conftest import SF_SMOKE

    path = str(tmp_path / "sigs")
    corpus = load_table(spark, SF_SMOKE, "documents").where(
        F.col("doc_id") % 10 < 8
    )
    v1 = persist_corpus_signatures(corpus, path, mode="append", txn=1)
    n1 = read_manifest_table(spark, path).count()
    v2 = persist_corpus_signatures(corpus, path, mode="append", txn=1)
    assert v2 == v1  # replay no-ops at the same version
    assert read_manifest_table(spark, path).count() == n1


def test_nfc_kernel_composes_and_passes_nulls(spark):
    """Unit pin for functions/text.nfc_normalize_udf: decomposed e+acute
    and ANGSTROM SIGN compose to single codepoints, ASCII is untouched,
    null stays null (the oracle's nfc_normalize(NULL) contract)."""
    from pyspark.sql import functions as F

    from species_range_data_pipeline_spark.functions.text import (
        nfc_normalize_udf,
    )

    df = spark.createDataFrame(
        [("cafe\u0301",), ("\u212B",), ("plain ascii",), (None,)],
        ["s"],
    )
    got = [
        r["n"]
        for r in df.select(nfc_normalize_udf(F.col("s")).alias("n"))
        .collect()
    ]
    assert got == ["caf\u00e9", "\u00c5", "plain ascii", None]


def test_sig_scratch_cleanup_removes_dirs(tmp_path):
    """ADVICE r14: the signature-manifest scratch dirs must be removed
    at interpreter exit; the atexit hook drains the registry and
    tolerates already-missing paths."""
    import os

    from species_range_data_pipeline_spark.plans.text import (
        _SIG_SCRATCH_DIRS,
        _sig_scratch_cleanup,
    )

    d1 = tmp_path / "sigs_a"
    d1.mkdir()
    (d1 / "part").write_text("x")
    _SIG_SCRATCH_DIRS.append(str(d1))
    _SIG_SCRATCH_DIRS.append(str(tmp_path / "already_gone"))
    _sig_scratch_cleanup()
    assert not _SIG_SCRATCH_DIRS
    assert not os.path.exists(d1)
