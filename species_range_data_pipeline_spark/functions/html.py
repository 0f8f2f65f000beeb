"""HTML -> visible text extraction, dependency-free.

The reference parses HTML driver-side with BeautifulSoup
(``species_range_etl.py:142-154``); the engine needs the same capability
as a DISTRIBUTED column function — it is the second stage of every
web-corpus pipeline (WARC response body -> training text).  This is a
deliberately small, deterministic extractor in the stdlib-only style of
the codec lanes: good enough for quality scoring / dedup / langid
upstream features, not a browser.

Rules (the useful 95% of boilerplate stripping):
- ``<script>``/``<style>``/``<template>`` elements vanish with their
  contents; comments and CDATA vanish.
- Block-level tags (p, div, br, li, tr, headings, ...) become newlines so
  words from adjacent blocks don't fuse; other tags just drop.
- Entities decode via stdlib ``html.unescape``.
- Whitespace collapses per line; blank lines collapse to one.

The Spark-facing form is a vectorized pandas UDF (Arrow batches, no
per-row Python overhead beyond the regexes themselves).
"""

from __future__ import annotations

import html as _html
import re

_DROP_CONTENT = re.compile(
    r"<(script|style|template)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_CDATA = re.compile(r"<!\[CDATA\[.*?\]\]>", re.DOTALL)
_BLOCK_TAG = re.compile(
    r"</?(p|div|br|li|ul|ol|tr|td|th|table|h[1-6]|section|article|header|"
    r"footer|blockquote|pre|hr|nav|aside|form|figure|figcaption|dd|dt|dl)"
    r"\b[^>]*>",
    re.IGNORECASE,
)
_ANY_TAG = re.compile(r"<[^>]+>")
_SPACES = re.compile(r"[ \t\f\v]+")
_BLANK_LINES = re.compile(r"\n\s*\n+")


def html_to_text(doc: str | None) -> str | None:
    """Visible text of an HTML document (see module rules)."""
    if doc is None:
        return None
    s = _DROP_CONTENT.sub(" ", doc)
    s = _COMMENT.sub(" ", s)
    s = _CDATA.sub(" ", s)
    s = _BLOCK_TAG.sub("\n", s)
    s = _ANY_TAG.sub(" ", s)
    s = _html.unescape(s)
    s = _SPACES.sub(" ", s)
    lines = [ln.strip() for ln in s.split("\n")]
    s = "\n".join(lines)
    s = _BLANK_LINES.sub("\n", s)
    return s.strip()


def html_to_text_udf(col):
    """Column form: Arrow-vectorized pandas UDF over a string column."""
    from pyspark.sql.functions import pandas_udf

    # no type hints: `from __future__ import annotations` stringifies them,
    # which the pandas_udf hint inference rejects — declare the type instead
    _extract = pandas_udf(lambda s: s.map(html_to_text), "string")
    return _extract(col)
