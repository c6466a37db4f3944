"""Canonical URL normalization — the first dedup key of a web-crawl
corpus (the same page arrives as ``http://WWW.Example.com:80/a/?b=2&a=1``
and ``http://example.com/a?a=1&b=2``; URL-level dedup runs BEFORE any
content hashing because it needs no document bytes at all).

Everything here is pure Column expressions (regexp extracts + array
ops, whole-stage codegen, no UDF) with a deterministic rule set a SQL
oracle mirrors operation-for-operation:

- scheme and host lowercase; ``www.`` prefix dropped
- default ports stripped (``:80`` for http, ``:443`` for https)
- fragment dropped
- tracking parameters dropped (``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``, ``ref``), remaining query params SORTED byte-wise
- trailing path slash dropped (the root path stays ``/``; an empty
  path becomes ``/``)

The rule set is the common subset of the public crawl-dedup
canonicalizers; it is intentionally lossless-ish (no percent-decoding,
no IDN folding — those change bytes in ways different fetchers
disagree on)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["canonical_url", "TRACKING_PARAM_RE"]

# RE2-compatible (DuckDB) ∩ Java-regex dialect, anchored per param
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)="


def canonical_url(col: str | Column) -> Column:
    """Canonical form of an absolute http(s) URL column; non-URL
    strings (no ``scheme://`` head) pass through unchanged so the
    function is safe over mixed columns."""
    u = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = F.when(
        (scheme == "http"), F.regexp_replace(host, r":80$", "")
    ).otherwise(
        F.when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(
        (F.length(path) > 1), F.regexp_replace(path, r"/$", "")
    ).otherwise(path)
    # the query must start BEFORE any fragment: scan only non-#
    # characters up to the '?', else '#f?b=1' leaks fragment content
    # into the dedup key
    rawq = F.regexp_extract(u, r"^[^#?]*\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(rawq, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    query = F.array_join(params, "&")
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return F.when(scheme != "", canon).otherwise(u)
