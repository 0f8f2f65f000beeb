"""URL column functions for web-corpus pipelines, JVM-expression only.

Every crawl-derived corpus needs per-URL operations — host extraction
for per-site caps and dedup, canonical forms so `http://A.com/x#f` and
`http://a.com/x` count as one page, and a registrable-domain grouping
for source-level mixing.  All of it composes from Spark's built-in
``try_parse_url`` (null on unparseable input, never an exception) + regex/string expressions (whole-stage codegen; no
Python in the scan stage), which is exactly where these run at 100 TB —
inside the WARC scan, before any shuffle keys are built.

``url_registered_domain`` is a HEURISTIC (last two labels, or three
under common two-level public suffixes like ``co.uk``), not a Public
Suffix List lookup: the PSL is a bundled data file that changes monthly;
a corpus pipeline wanting exactness should broadcast-join the real list.
The heuristic is deterministic and documented so its failure modes
(``*.github.io`` grouping to ``github.io``) are auditable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: common two-level public suffixes for the registered-domain heuristic
_TWO_LEVEL_SUFFIXES = [
    "co.uk", "ac.uk", "gov.uk", "org.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "co.za", "com.tr", "com.ar", "github.io",
]


def url_host(url: Column) -> Column:
    """Lowercased host of a URL (null when unparseable)."""
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def url_registered_domain(url: Column) -> Column:
    """Heuristic registered domain: last 2 host labels, or last 3 when
    the trailing 2 form a known two-level suffix (see module note)."""
    host = url_host(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    is_two_level = last2.isin(*_TWO_LEVEL_SUFFIXES)
    return (
        F.when(host.isNull(), None)  # size(null)=null falls through otherwise
        .when(n <= 2, host)
        .when(is_two_level & (n >= 3), last3)
        .otherwise(last2)
    )


def url_normalize(url: Column) -> Column:
    """Canonical page form: lowercase scheme+host, default ports dropped,
    fragment dropped, empty path becomes '/', query preserved verbatim
    (query ORDER is meaningful to some sites — not re-sorted here)."""
    proto = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    host = url_host(url)
    # parse_url HOST excludes the port; pull it explicitly
    authority = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    default = (
        ((proto == "http") & (port == "80"))
        | ((proto == "https") & (port == "443"))
        | (port == "")
    )
    path = F.try_parse_url(url, F.lit("PATH"))
    query = F.try_parse_url(url, F.lit("QUERY"))
    return F.when(proto.isNull() | host.isNull(), None).otherwise(
        F.concat(
            proto,
            F.lit("://"),
            host,
            F.when(default, F.lit("")).otherwise(F.concat(F.lit(":"), port)),
            F.when(
                path.isNull() | (path == ""), F.lit("/")
            ).otherwise(path),
            F.when(
                query.isNull() | (query == ""), F.lit("")
            ).otherwise(F.concat(F.lit("?"), query)),
        )
    )
