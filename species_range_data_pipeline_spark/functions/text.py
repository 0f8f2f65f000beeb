"""Text tokenization column expressions (the BPE-ish regex tokenizer
promised by plans/text.py's whitespace `_tokens`).

A real BPE tokenizer is a learned merge table; what a data pipeline needs
BEFORE training is the pre-tokenization split that BPE vocabularies are
built over (GPT-2 style: contractions | letter runs | digit runs |
punctuation runs, each with an optional leading space).  That split is a
single regexp_extract_all — pure JVM, codegen-friendly, and a faithful
token-budget estimator (letter/digit runs upper-bound merged BPE tokens).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# GPT-2-style pre-tokenizer, simplified to the character classes the engines
# agree on: contraction suffixes, letter runs, digit runs, non-space symbol
# runs — each optionally preceded by one space.
BPE_SPLIT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"

# Canonical PII patterns, shared by the per-source audit
# (plans/quality.text_pii_scrub) and the per-doc rewrite
# (plans/text.text_pii_redact).  Java-regex ∩ RE2 dialect only (no
# lookaround, no backrefs) so the SAME text runs in Spark and in the
# DuckDB oracles verbatim.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+1-555-[0-9]{4}"


def bpe_tokens(col: Column | str = "text") -> Column:
    """array<string> of BPE-style pre-tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_SPLIT_PATTERN), 0)


def bpe_token_count(col: Column | str = "text") -> Column:
    """Token-budget estimate: the count of BPE-style pre-tokens."""
    return F.size(bpe_tokens(col)).cast("long")


def nfc_normalize_udf(col):
    """Column form of Unicode NFC normalization (Arrow-vectorized).

    Spark SQL has no normalization builtin, so this is the canonical
    scan-stage Python kernel: one Arrow batch in, one out, no shuffle,
    no state.  Python's ``unicodedata`` and DuckDB's ``nfc_normalize``
    (utf8proc) both implement UAX #15 NFC, so the oracle twin matches
    byte-for-byte.

    UNICODE-VERSION CAVEAT (ADVICE r13): byte parity assumes both
    engines carry compatible Unicode character databases — a code point
    added or reclassified between the CPython and utf8proc UCD versions
    could normalize differently.  UAX #15 guarantees NFC results are
    STABLE for assigned code points (normalization stability policy),
    so the exposure is only unassigned-in-one-engine code points; the
    oracle-checked lane (``text_normalize_unicode``) therefore restricts
    its augmented suffix to long-assigned, normalization-stable code
    points (NFC-changing: Å→Å, decomposed e+◌́→é), and any fixture
    extension must keep that restriction.
    """
    from pyspark.sql.functions import pandas_udf

    def _norm(s):
        import unicodedata

        return s.map(
            lambda t: unicodedata.normalize("NFC", t)
            if isinstance(t, str)
            else None
        )

    return pandas_udf(_norm, "string")(col)
