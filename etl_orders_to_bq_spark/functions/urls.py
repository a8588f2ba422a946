"""URL canonicalization — the dedup key web-corpus curation actually
uses.

Raw crawl URLs are noisy duplicates of each other: mixed-case hosts,
default ports, tracking parameters (utm_*, fbclid, gclid), fragments,
unsorted query strings. CommonCrawl-derived pipelines (C4/RefinedWeb
shapes) canonicalize BEFORE URL-level dedup or per-host quotas, or the
same page is kept dozens of times. Pure Column math (regex extract +
array combinators), no UDF — the whole canonicalizer stays in codegen
and a SQL oracle replays it term for term.

No counterpart in the reference engine (SURVEY.md §2.2 scalar-function
absence family; the reference has no URL handling at all).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking parameters dropped by canonicalization (the public
# adtech-referrer set every pipeline starts from)
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=|$)"

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)(?:\?([^#]*))?.*$"


def canonicalize_url(col: Column | str) -> Column:
    """Canonical form of an http(s) URL:

    - scheme and host lowercased (case-insensitive per RFC 3986);
    - default port stripped (``:80`` for http, ``:443`` for https);
    - fragment dropped (never sent to the server);
    - tracking query params dropped (``TRACKING_PARAM_RE``);
    - surviving query params SORTED (order is semantically free, so
      one order is the canonical one);
    - empty path normalized to ``/``.

    Non-URL strings (no ``scheme://host``) pass through unchanged —
    canonicalization must never destroy a key it does not understand.
    """
    u = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    host = F.lower(F.regexp_extract(u, _URL_RE, 2))
    path = F.regexp_extract(u, _URL_RE, 3)
    query = F.regexp_extract(u, _URL_RE, 4)

    strip80 = (scheme == F.lit("http")) & host.rlike(r":80$")
    strip443 = (scheme == F.lit("https")) & host.rlike(r":443$")
    host = F.when(strip80, F.regexp_replace(host, r":80$", "")).when(
        strip443, F.regexp_replace(host, r":443$", "")
    ).otherwise(host)

    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qpart = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(path == "", F.lit("/")).otherwise(path),
        qpart,
    )
    return F.when(scheme == "", u).otherwise(canon)


def url_canonical_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level dedup on the canonical key: one row per canonical URL
    with ``(canonical_url, n_urls, n_raw_forms, first_id)`` — how many
    rows collapsed, how many DISTINCT raw spellings they had, and the
    kept (min-id) representative.

    ONE map-side-combinable shuffle on the canonical key; the shuffle
    carries (canonical, id, raw-url) triples. At 100 TB run it before
    fetch/dedup stages — every collapsed URL is a page never fetched
    twice.
    """
    canon = df.select(
        F.col(id_col), F.col(url_col).alias("__raw"),
        canonicalize_url(F.col(url_col)).alias("canonical_url"),
    )
    return canon.groupBy("canonical_url").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("__raw").alias("n_raw_forms"),
        F.min(id_col).alias("first_id"),
    )
