"""HTML scenario scrape (S3, ``species_range_etl.py:142-154``).

The reference soup-parses each species page: scenario names from ``<h4>``
inside ``class="thumbnail-file-group"`` blocks, the zip link from the
second ``<li>`` of the ``thumbnail-file-group-02`` sublist, and skips
scenarios whose block contains "Image not available" (F1).  (Blocks with
``col-md-3`` are also accepted for older fixtures.)

Here the parse is a pure function (stdlib regex — BeautifulSoup is not in
the container and is not needed for this fixed structure), lifted over a
species DataFrame with ``mapInPandas``; the page fetch is injectable so the
dataflow is testable offline and rate-limitable in deployment.  Output is
relational: one row per (species, scenario, zip_url, available) — the
availability FILTER happens declaratively downstream, before any download
(predicate-before-fetch, SURVEY.md §4).
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

SCENARIO_SCHEMA = T.StructType(
    [
        T.StructField("species", T.StringType()),
        T.StructField("scenario", T.StringType()),
        T.StructField("zip_url", T.StringType()),
        T.StructField("available", T.BooleanType()),
        T.StructField("error", T.StringType()),
    ]
)

# Scenario blocks: the live page uses class="thumbnail-file-group"
# (species_range_etl.py:145 find_all); legacy fixtures use col-md-3.
# The (?!-0\d) lookahead keeps the inner numbered sub-divs (the -01
# image wrapper, the -02 file sublist) from matching as blocks of
# their own.  A block spans from its opening tag to the NEXT block's
# opening tag (or end of document) — NOT to the first </div>, which
# would truncate a block at its first nested child and silently drop
# the -02 sublist whenever a -01 image div precedes it (ADVICE r7).
_BLOCK_OPEN_RE = re.compile(
    r'<div[^>]*class="[^"]*(?:col-md-3|thumbnail-file-group(?!-0\d))[^"]*"'
    r"[^>]*>",
    re.S | re.I,
)


# The FINAL block must not run to end-of-document: trailing page chrome
# (a footer with its own links, or an "Image not available" string
# elsewhere on the page) would otherwise be parsed as part of the last
# scenario and could flip its availability or inject a wrong zip link
# (ADVICE r8).  Bound it at the first structural close after the open.
_TAIL_BOUND_RE = re.compile(r"<footer\b|</body\s*>|</html\s*>|</main\s*>", re.I)


def _iter_blocks(html: str) -> Iterator[str]:
    opens = list(_BLOCK_OPEN_RE.finditer(html))
    for i, m in enumerate(opens):
        if i + 1 < len(opens):
            end = opens[i + 1].start()
        else:
            tail = _TAIL_BOUND_RE.search(html, m.end())
            end = tail.start() if tail else len(html)
        yield html[m.end(): end]
_H4_RE = re.compile(r"<h4[^>]*>(.*?)</h4>", re.S | re.I)
_LI_A_RE = re.compile(r"<li[^>]*>\s*<a[^>]*href=\"([^\"]+)\"", re.S | re.I)
# the reference scopes the <li> scan to the file sublist
# (species_range_etl.py:151 ``find(class_="thumbnail-file-group-02")``)
_SUBLIST_RE = re.compile(
    r'class="[^"]*thumbnail-file-group-02[^"]*"[^>]*>(.*)', re.S | re.I
)


def parse_species_page(html: str) -> list[tuple[str, str | None, bool]]:
    """One page -> [(scenario, zip_url, available)].

    Mirrors the reference's selection: per block, the <h4> text is the
    scenario, the SECOND <li><a href> is the zip link
    (``species_range_etl.py:151-154`` hardcodes index 1), and a block
    containing "Image not available" is unavailable (F1, ``:148-150``).
    """
    out = []
    for block in _iter_blocks(html):
        h4 = _H4_RE.search(block)
        if not h4:
            continue
        scenario = re.sub(r"\s+", " ", h4.group(1)).strip()
        if "Image not available" in block:
            out.append((scenario, None, False))
            continue
        m02 = _SUBLIST_RE.search(block)
        links = _LI_A_RE.findall(m02.group(1) if m02 else block)
        zip_url = links[1] if len(links) > 1 else (links[0] if links else None)
        out.append((scenario, zip_url, zip_url is not None))
    return out


def scrape_scenarios(
    species_df: DataFrame,
    page_fetcher: Callable[[str], str],
    url_template: str = "https://example.invalid/atlas/{species}",
    species_col: str = "hyphenated_name",
) -> DataFrame:
    """Species DataFrame -> scenario rows via mapInPandas (fetch+parse per
    species, batched; errors are rows)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sp in pdf[species_col]:
                try:
                    html = page_fetcher(url_template.format(species=sp))
                    for scenario, zip_url, available in parse_species_page(html):
                        rows.append(
                            {"species": sp, "scenario": scenario,
                             "zip_url": zip_url, "available": available,
                             "error": None}
                        )
                except Exception as exc:
                    rows.append(
                        {"species": sp, "scenario": None, "zip_url": None,
                         "available": None,
                         "error": f"{type(exc).__name__}: {exc}"}
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in SCENARIO_SCHEMA.fields])

    return species_df.select(species_col).mapInPandas(fn, SCENARIO_SCHEMA)
