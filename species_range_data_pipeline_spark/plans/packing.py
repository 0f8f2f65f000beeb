"""Training-batch assembly operators: sequence packing, mixture sampling,
and epoch upsampling over the ``documents`` corpus.

These are the ops that sit between a cleaned/deduplicated corpus and a
training run: concatenate documents into fixed-token-budget sequences
(packing), rebalance the per-source mix toward a target distribution
(temperature sampling), and replicate under-represented sources by whole
epochs (upsampling).  The reference pipeline stops at artifact tables; a
100 TB training pipeline needs exactly this last mile.

Scale notes:
- ``doc_pack_sequences`` is ONE window shuffle partitioned by source (the
  pack is per-source, so partitions are independent) followed by a
  group-by on the same key prefix — Catalyst reuses the partitioning, so
  the whole plan is a single exchange.  At 100 TB the window's sort is the
  cost; the partition key (source) can be refined to (source, shard) with
  shard = a coarse doc_id range so no single window partition exceeds
  executor memory, at the cost of one partial sequence per shard boundary.
- ``dataset_mixture`` aggregates per-source counts (tiny — one row per
  source), broadcasts the rate table back onto the corpus, and filters by
  a deterministic arithmetic bucket.  Two scans of documents, one tiny
  broadcast, no wide shuffle of the corpus itself.
- ``dataset_interleave_epochs`` replicates rows with a generator
  (``explode(sequence(...))``) — a narrow, pipelined operation: no shuffle
  is paid for the replication, only for the final (tiny) per-source
  rollup.
- ``dataset_shuffle_shards`` is the deterministic global training
  shuffle: ONE exchange on the shard key (the move a shard writer pays
  anyway), positions assigned by a per-shard sort on the Knuth key.

Determinism discipline (same as ``quality.sample_stratified``): sampling
decisions use exact integer arithmetic on ``doc_id`` (a Knuth
multiplicative bucket), never RNG and never engine-specific hash
functions, so the same document makes the same cut in any engine at any
parallelism and the DuckDB oracle can mirror the rule verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.materialize import materialize_once
from .text import _tokens

#: tokens per packed training sequence (a context-window budget)
PACK_BUDGET = 512

#: Knuth multiplicative constant: spreads sequential ids over buckets
#: with exact integer arithmetic that any engine reproduces bit-for-bit
#: (always used under a mod-2^32 mask so the rule never overflows int64).
_KNUTH = 2654435761


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "source",
        "doc_id",
        F.size(_tokens()).cast("long").alias("n_tokens"),
    )


#: the same whitespace tokenizer as ``text_token_count``, as DuckDB SQL
_TOK_SQL = (
    "CAST(len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) "
    "AS BIGINT)"
)


def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing (GPT-style): documents are laid
    end-to-end per source in doc_id order and cut into ``PACK_BUDGET``-token
    sequences; a document belongs to the sequence its first token falls in.

    Output: one row per (source, seq_id) with the doc count, token sum and
    first doc — the manifest a batch loader needs to materialize packed
    samples.  Deterministic: no RNG, pack order is the stable (source,
    doc_id) order.
    """
    toks = _doc_tokens(spark, sf_dir)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = toks.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return (
        cum.withColumn(
            "seq_id", F.floor(F.col("cum_before") / F.lit(float(PACK_BUDGET)))
        )
        .groupBy("source", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("source", "seq_id")
    )


DOC_PACK_SEQUENCES_ORACLE = f"""
WITH toks AS (
    SELECT source, doc_id, {_TOK_SQL} AS n_tokens
    FROM documents
), cum AS (
    SELECT source, doc_id, n_tokens,
           COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
    FROM toks
)
SELECT source,
       CAST(floor(cum_before / {float(PACK_BUDGET)}) AS BIGINT) AS seq_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
       min(doc_id) AS first_doc
FROM cum
GROUP BY source, seq_id
ORDER BY source, seq_id
"""


#: docs per shard for the sharded packing variant (tiny on the fixture
#: so multiple shards actually exist; at 100 TB pick so one shard's rows
#: fit one task's sort buffer)
PACK_SHARD_SPAN = 64


def doc_pack_sequences_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``doc_pack_sequences`` with BOUNDED window partitions — the 100 TB
    refinement, producing IDENTICAL output (same oracle).

    Concat-then-chunk packing is an offset computation, and offsets are
    associative: a document's global token offset = (sum of all earlier
    shards' tokens) + (its offset within its shard).  So the giant
    per-source window decomposes exactly into

      1. a per-(source, shard) window (shard = doc_id div span, bounded
         rows per partition — no single window partition ever exceeds a
         task's memory),
      2. a source-cardinality shard-totals table, cumulated with a tiny
         window and broadcast back.

    No boundary loss, no approximation — unlike FFD (order-dependent,
    hence ``doc_pack_ffd`` stays group-local), chunking distributes
    exactly.
    """
    toks = _doc_tokens(spark, sf_dir).withColumn(
        "shard", (F.col("doc_id") / PACK_SHARD_SPAN).cast("long")
    )
    w_in = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = toks.withColumn(
        "cum_in_shard", F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
    )
    shard_totals = toks.groupBy("source", "shard").agg(
        F.sum("n_tokens").alias("shard_tokens")
    )
    w_sh = (
        Window.partitionBy("source")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = shard_totals.select(
        "source",
        "shard",
        F.coalesce(F.sum("shard_tokens").over(w_sh), F.lit(0)).alias(
            "shard_offset"
        ),
    )
    packed = local.join(F.broadcast(offsets), ["source", "shard"]).withColumn(
        "seq_id",
        F.floor(
            (F.col("shard_offset") + F.col("cum_in_shard"))
            / F.lit(float(PACK_BUDGET))
        ),
    )
    return (
        packed.groupBy("source", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("source", "seq_id")
    )


def dataset_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-rebalanced source mixture (alpha = 0.5 downsampling).

    Per-source keep rate ``sqrt(min_count / n_source)`` pulls the source
    distribution halfway (in log space) toward uniform — the standard
    multilingual/multi-source rebalancing rule — capped at 1 for the
    smallest source.  The keep decision is a deterministic per-mille
    bucket of a Knuth-spread doc_id, so membership is stable across
    engines and cluster sizes.
    """
    docs = load_table(spark, sf_dir, "documents")
    # r18 (guide §2.4): counts fed both min_n and rates as separate
    # lineages, so the corpus was scanned three times (twice through
    # this aggregate, once for the keep pass).  The source-cardinality
    # aggregate is materialized once (lazy localCheckpoint); two scans
    # — rate-build and keep — is the floor for a rate-then-apply shape
    # (the rates depend on ALL rows, so they cannot fuse into the keep
    # pass).
    counts = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_orig"))
        .transform(materialize_once)
    )
    min_n = counts.agg(F.min("n_orig").alias("min_n"))
    rates = counts.crossJoin(F.broadcast(min_n)).select(
        "source",
        "n_orig",
        F.floor(F.lit(1000.0) * F.sqrt(F.col("min_n") / F.col("n_orig")))
        .cast("int")
        .alias("keep_per_mille"),
    )
    # bucket = ((doc_id * K) mod 2^32) mod 1000, computed in decimal(38):
    # a plain int64 product overflows at doc_id ~3.5e9 — Spark 4 (ANSI by
    # default) RAISES on it and DuckDB errors on BIGINT overflow — so the
    # rule must avoid int64 entirely to hold at 100 TB id ranges.  Decimal
    # multiply/mod is exact in both engines (the oracle uses HUGEINT).
    bucket = (
        (F.col("doc_id").cast("decimal(38,0)") * _KNUTH) % F.lit(4294967296)
    ) % 1000
    kept = docs.join(F.broadcast(rates), "source").where(
        bucket < F.col("keep_per_mille")
    )
    return (
        kept.groupBy("source", "n_orig", "keep_per_mille")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum(F.size(_tokens()).cast("long")).alias("kept_tokens"),
        )
        .orderBy("source")
    )


DATASET_MIXTURE_ORACLE = f"""
WITH counts AS (
    SELECT source, count(*) AS n_orig FROM documents GROUP BY source
), rates AS (
    SELECT source, n_orig,
           CAST(floor(1000.0 * sqrt(
               (SELECT min(n_orig) FROM counts) * 1.0 / n_orig)) AS INT)
               AS keep_per_mille
    FROM counts
)
SELECT d.source, r.n_orig, r.keep_per_mille,
       count(*) AS n_kept,
       CAST(sum({_TOK_SQL}) AS BIGINT) AS kept_tokens
FROM documents d JOIN rates r ON d.source = r.source
WHERE ((CAST(d.doc_id AS HUGEINT) * {_KNUTH}) % 4294967296) % 1000
      < r.keep_per_mille
GROUP BY d.source, r.n_orig, r.keep_per_mille
ORDER BY d.source
"""


def dataset_interleave_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-epoch upsampling: every source is replicated enough full
    epochs to approach the largest source's token mass (capped at 4
    epochs, the usual repetition-harm ceiling).  Replication is a
    generator (``explode(sequence(...))``) — narrow and pipelined; only
    the final per-source rollup shuffles, and it is source-cardinality
    sized.
    """
    toks = _doc_tokens(spark, sf_dir)
    # r18 (guide §2.4): per_src fed both target and plan as separate
    # lineages — three tokenize passes over the corpus.  Checkpointing
    # the source-cardinality aggregate leaves two (plan-build and
    # replicate), the floor for a plan-then-apply shape.
    per_src = (
        toks.groupBy("source")
        .agg(F.sum("n_tokens").cast("long").alias("src_tokens"))
        .transform(materialize_once)
    )
    target = per_src.agg(F.max("src_tokens").alias("target_tokens"))
    plan = per_src.crossJoin(F.broadcast(target)).select(
        "source",
        "src_tokens",
        F.least(
            F.lit(4),
            F.ceil(F.col("target_tokens") / F.col("src_tokens")),
        )
        .cast("int")
        .alias("epochs"),
    )
    exploded = toks.join(F.broadcast(plan), "source").select(
        "source",
        "n_tokens",
        "epochs",
        F.explode(F.sequence(F.lit(1), F.col("epochs"))).alias("epoch"),
    )
    return (
        exploded.groupBy("source", "epochs")
        .agg(
            F.count(F.lit(1)).alias("total_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("source")
    )


DATASET_INTERLEAVE_EPOCHS_ORACLE = f"""
WITH toks AS (
    SELECT source, doc_id, {_TOK_SQL} AS n_tokens FROM documents
), per_src AS (
    SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
    FROM toks GROUP BY source
), plan AS (
    SELECT source, src_tokens,
           CAST(least(4, ceil(
               (SELECT max(src_tokens) FROM per_src) * 1.0 / src_tokens))
               AS INT) AS epochs
    FROM per_src
)
SELECT t.source, p.epochs,
       count(*) AS total_docs,
       CAST(sum(t.n_tokens) AS BIGINT) AS total_tokens
FROM toks t
JOIN plan p ON t.source = p.source
CROSS JOIN unnest(generate_series(1, p.epochs)) AS e(epoch)
GROUP BY t.source, p.epochs
ORDER BY t.source
"""


#: shard count for the deterministic global shuffle (a stand-in for the
#: real fleet's output-file count; any value works, the rule is sf-free)
_SHUFFLE_SHARDS = 8


def dataset_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle + shard assignment: every
    LLM data pipeline's LAST step before the trainer reads the corpus
    (docs must arrive in a seed-reproducible pseudo-random order, split
    into N balanced shard files).  The reference stops at artifact
    tables (``species_range_etl.py:271-276`` loads in input order); a
    100 TB run needs exactly this.

    The shuffle key is the Knuth multiplicative hash of ``doc_id`` —
    exact integer arithmetic, so the SAME document lands in the SAME
    shard at the SAME position in any engine at any parallelism (seeded
    ``orderBy(rand())`` would be engine- and partitioning-dependent and
    unverifiable).  shard = key mod N; position = rank of key within the
    shard.

    Scale shape: ONE wide exchange — the window's
    ``hashpartitioning(shard)`` — which IS the physical move a shard
    writer pays anyway (``repartition(shard).sortWithinPartitions(key)``
    followed by a partitioned write); the multiplicative hash keeps the
    shards count-balanced (fixture: 62-63 docs per shard of 8), so no
    shard straggles.  Nothing else shuffles: the key is computed in the
    scan stage and the final ``orderBy`` is presentation-only.
    """
    docs = load_table(spark, sf_dir, "documents")
    # decimal(38) Knuth spread, same overflow discipline as
    # dataset_mixture: int64 * _KNUTH raises under ANSI at doc_id ~3.5e9,
    # which a 100 TB id range exceeds; decimal multiply/mod is exact in
    # both engines, then the mod-2^32 result fits long.
    keyed = docs.select(
        "doc_id",
        (
            (F.col("doc_id").cast("decimal(38,0)") * _KNUTH)
            % F.lit(4294967296)
        )
        .cast("long")
        .alias("skey"),
    )
    w = Window.partitionBy(F.col("skey") % _SHUFFLE_SHARDS).orderBy(
        "skey", "doc_id"
    )
    return (
        keyed.select(
            (F.col("skey") % _SHUFFLE_SHARDS).cast("int").alias("shard"),
            F.row_number().over(w).cast("long").alias("pos"),
            "doc_id",
        )
        .orderBy("shard", "pos")
    )


DATASET_SHUFFLE_SHARDS_ORACLE = f"""
WITH keyed AS (
    SELECT doc_id,
           ((CAST(doc_id AS HUGEINT) * {_KNUTH}) % 4294967296) AS skey
    FROM documents
)
SELECT CAST(skey % {_SHUFFLE_SHARDS} AS INT) AS shard,
       row_number() OVER (PARTITION BY skey % {_SHUFFLE_SHARDS}
                          ORDER BY skey, doc_id) AS pos,
       doc_id
FROM keyed
ORDER BY shard, pos
"""


def ffd_bins(tokens: list[int], budget: int) -> list[int]:
    """First-fit-decreasing bin loads for one group (pure function, also
    the test reference).  Items above the budget get their own bin."""
    loads: list[int] = []
    for t in sorted(tokens, reverse=True):
        for i, load in enumerate(loads):
            if load + t <= budget:
                loads[i] = load + t
                break
        else:
            loads.append(t)
    return loads


def doc_pack_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True bin packing per source: first-fit-decreasing into
    ``PACK_BUDGET``-token bins — the no-document-splitting alternative to
    ``doc_pack_sequences``'s concat-then-chunk (which splits at chunk
    boundaries).  FFD is inherently sequential within a group, so it runs
    as ``applyInPandas`` per source — the partitioning unit is the SAME
    key the window variant shuffles on, and group state is one int per
    open bin.  Output compares both strategies: FFD bin count vs the
    chunk count, with the information-theoretic lower bound.

    Iterative packing is not SQL-expressible but deterministic per
    corpus, so a scale-keyed VALUES pin (plans/pinned.py) lets the
    driver hash-check it value-level; additionally golden-tested
    against the pure-Python ``ffd_bins`` reference in ``test_packing.py``.
    """
    import pandas as pd

    toks = _doc_tokens(spark, sf_dir)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        total = int(pdf["n_tokens"].sum())
        loads = ffd_bins([int(t) for t in pdf["n_tokens"]], PACK_BUDGET)
        n_ffd = len(loads)
        lower = -(-total // PACK_BUDGET)
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "n_docs": [len(pdf)],
                "total_tokens": [total],
                "bins_ffd": [n_ffd],
                "bins_lower_bound": [lower],
                "util_pct": [round(100.0 * total / (n_ffd * PACK_BUDGET), 2)],
            }
        )

    return (
        toks.groupBy("source")
        .applyInPandas(
            pack,
            "source string, n_docs long, total_tokens long, bins_ffd long, "
            "bins_lower_bound long, util_pct double",
        )
        .orderBy("source")
    )


def corpus_pipeline_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-corpus pipeline end-to-end in ONE declarative plan:
    quality filter -> normalized exact dedup -> sequence packing, with
    per-source attrition at each stage.

    This is the capstone composition query: each stage is the same logic
    as its standalone operator (``doc_quality_funnel``'s pass condition,
    ``dedup_keep_best``'s fingerprint, ``doc_pack_sequences``'s
    chunking), fused so Catalyst plans the whole pipeline at once — the
    filter prunes before the dedup shuffle, and the dedup output feeds
    the packing window without rematerialization.  At 100 TB the wide
    exchanges are: one on the fingerprint (dedup, a mergeable min-struct
    agg — skew-immune to hot boilerplate fingerprints), one on source
    (packing window); everything else is scan-stage math.
    """
    from .quality import normalized_fingerprint, quality_pass_condition

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(_tokens()).cast("long")
    passed = docs.where(quality_pass_condition()).select(
        "source",
        "doc_id",
        n_tokens.alias("n_tokens"),
        normalized_fingerprint().alias("fp"),
    )
    # First occurrence per fingerprint as a mergeable min(struct) (r12
    # skew-proofing, the dedup_paragraphs discipline): doc_id leads the
    # struct so the agg realizes the old window's orderBy(doc_id), and
    # its uniqueness makes the carried (source, n_tokens) argmin-safe.
    # A hot boilerplate fingerprint partial-aggregates map-side instead
    # of landing on one row_number task.
    kept = (
        passed.groupBy("fp")
        .agg(
            F.min(
                F.struct(
                    F.col("doc_id").alias("doc_id"),
                    F.col("source").alias("source"),
                    F.col("n_tokens").alias("n_tokens"),
                )
            ).alias("w")
        )
        .select("w.doc_id", "w.source", "w.n_tokens")
    )
    wp = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = kept.withColumn(
        "seq_id",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(wp), F.lit(0))
            / F.lit(float(PACK_BUDGET))
        ),
    )
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        packed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.max("seq_id") + 1).alias("n_sequences"),
        )
        .join(totals, "source")
        .select("source", "n_docs", "n_kept", "total_tokens", "n_sequences")
        .orderBy("source")
    )


CORPUS_PIPELINE_ORACLE = f"""
WITH scored AS (
    SELECT source, doc_id, text, n_chars,
           length(regexp_replace(text, '\\s', '', 'g')) AS nonspace,
           length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS symbols,
           length(regexp_replace(text, '[^0-9]', '', 'g')) AS digits,
           CAST(len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '))
               AS BIGINT) AS n_tokens
    FROM documents
), passed AS (
    SELECT source, doc_id, n_tokens,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
    FROM scored
    WHERE n_chars BETWEEN 100 AND 20000
      AND symbols * 10 <= nonspace
      AND digits * 5 <= nonspace
      AND nonspace * 1.0 / n_tokens BETWEEN 2.0 AND 14.0
), kept AS (
    SELECT source, doc_id, n_tokens
    FROM (SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
          FROM passed)
    WHERE rn = 1
), packed AS (
    SELECT source, n_tokens,
           CAST(floor(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / {float(PACK_BUDGET)}) AS BIGINT) AS seq_id
    FROM kept
), totals AS (
    SELECT source, count(*) AS n_docs FROM documents GROUP BY source
)
SELECT p.source, t.n_docs,
       count(*) AS n_kept,
       CAST(sum(p.n_tokens) AS BIGINT) AS total_tokens,
       max(p.seq_id) + 1 AS n_sequences
FROM packed p JOIN totals t ON p.source = t.source
GROUP BY p.source, t.n_docs
ORDER BY p.source
"""


QUERIES = {
    "doc_pack_sequences": doc_pack_sequences,
    "dataset_mixture": dataset_mixture,
    "dataset_interleave_epochs": dataset_interleave_epochs,
    "doc_pack_ffd": doc_pack_ffd,
    "doc_pack_sequences_sharded": doc_pack_sequences_sharded,
    "corpus_pipeline_summary": corpus_pipeline_summary,
    "dataset_shuffle_shards": dataset_shuffle_shards,
}

from .pinned import DOC_PACK_FFD_ORACLE  # noqa: E402

ORACLES = {
    "doc_pack_sequences": DOC_PACK_SEQUENCES_ORACLE,
    "doc_pack_ffd": DOC_PACK_FFD_ORACLE,
    "dataset_mixture": DATASET_MIXTURE_ORACLE,
    "dataset_interleave_epochs": DATASET_INTERLEAVE_EPOCHS_ORACLE,
    # the sharded refinement is value-identical to the single-window
    # packing by construction — it shares the oracle verbatim
    "doc_pack_sequences_sharded": DOC_PACK_SEQUENCES_ORACLE,
    "corpus_pipeline_summary": CORPUS_PIPELINE_ORACLE,
    "dataset_shuffle_shards": DATASET_SHUFFLE_SHARDS_ORACLE,
}
