"""URL canonicalization for web-crawl corpora — pure Column expressions.

A Common-Crawl-style pipeline keys everything on the url (dedup, revisit
sessionization, domain-level stats), so the very first operator is
canonicalization: the same page arrives as ``HTTP://WWW.Foo.COM:80/a/``
and ``http://foo.com/a?utm_source=feed`` and must collapse to one key.
Reference analog: the per-clip key parse/construct in
``reference/datasets/videoset.py:40-55`` (path → canonical clip id);
here the "clip id" is the canonical url.

Everything below is built from JVM-side built-ins (regexp_extract /
split / filter / array_sort) — no Python on the hot path, fully
Catalyst-visible, map-only (zero shuffle), so it scales linearly with
input splits on any cluster size.

Canonical form applied (the common normative subset of RFC 3986 §6 plus
crawl-dedup conventions):
  * scheme and host lowercased, leading ``www.`` stripped
  * default ports dropped (``http:80``, ``https:443``)
  * trailing ``/`` stripped from the path (bare host → ``/``)
  * tracking params removed (``utm_*``, ``gclid``, ``fbclid``, ``ref``),
    remaining query params sorted bytewise for order-independence
  * fragment dropped
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# query params that never change page content — dropped in canon form
TRACKING_PREFIXES = ("utm_", "gclid=", "fbclid=", "ref=")

# regexes shared verbatim with the DuckDB oracle (plans/queries.py) —
# both engines use RE2-ish syntax for these simple classes
RE_SCHEME = "^([A-Za-z][A-Za-z0-9+.-]*)://"
RE_HOSTPORT = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
RE_REST = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)"  # path+query, no frag
RE_HOST = "^([^:]+)"
RE_PORT = ":([0-9]+)$"
RE_PATH = "^([^?]*)"
RE_QUERY = "\\?(.*)$"
RE_DOMAIN = "([^.]+\\.[^.]+)$"


def synth_url(doc_id: Column, source: Column) -> Column:
    """Deterministic messy URL for a document — exercises every
    canonicalization rule (case, default ports, trailing slash,
    tracking params, param order, fragments) keyed on ``doc_id`` so the
    DuckDB oracle can rebuild the identical string."""
    i = doc_id.cast("long")
    scheme = F.when(i % 3 == 0, F.lit("HTTP")).otherwise(F.lit("https"))
    host = F.when(
        i % 2 == 0, F.concat(F.lit("WWW."), F.upper(source), F.lit(".Example.COM"))
    ).otherwise(F.concat(source, F.lit(".example.com")))
    port = F.when(
        i % 5 == 0, F.when(i % 3 == 0, F.lit(":80")).otherwise(F.lit(":443"))
    ).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/Archive/"),
        i.cast("string"),
        F.when(i % 4 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    qid = (i % 97).cast("string")
    query = (
        F.when(i % 7 == 0, F.lit(""))
        .when(i % 2 == 0, F.concat(F.lit("?utm_source=feed&id="), qid, F.lit("&ref=rss")))
        .otherwise(F.concat(F.lit("?id="), qid, F.lit("&utm_campaign=crawl")))
    )
    frag = F.when(i % 3 == 1, F.lit("#sec")).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port, path, query, frag)


def _keep_param(p: Column) -> Column:
    cond = p != ""
    for prefix in TRACKING_PREFIXES:
        cond = cond & ~p.startswith(prefix)
    return cond


def _canon_query(url: Column) -> Column:
    """Filtered + sorted query string ('' when nothing survives). The
    filter predicate is built from TRACKING_PREFIXES so extending the
    list changes the engine and (via the regenerated oracle constant)
    both sides together."""
    raw = F.regexp_extract(F.regexp_extract(url, RE_REST, 1), RE_QUERY, 1)
    keep = F.filter(F.split(raw, "&"), _keep_param)
    return F.concat_ws("&", F.array_sort(keep))


def canon_host(url: Column) -> Column:
    """Lowercased host with any leading ``www.`` stripped."""
    host = F.lower(F.regexp_extract(F.regexp_extract(url, RE_HOSTPORT, 1), RE_HOST, 1))
    return F.regexp_replace(host, "^www\\.", "")


def registered_domain(host: Column) -> Column:
    """Last two dot-labels of an already-canonical host (the eTLD+1
    approximation a crawl pipeline groups by when no PSL is loaded)."""
    return F.regexp_extract(host, RE_DOMAIN, 1)


def canonicalize_url(url: Column) -> Column:
    """Canonical URL per the module rules — single map-side expression."""
    scheme = F.lower(F.regexp_extract(url, RE_SCHEME, 1))
    hostport = F.regexp_extract(url, RE_HOSTPORT, 1)
    host = canon_host(url)
    port = F.regexp_extract(hostport, RE_PORT, 1)
    port_c = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    rest = F.regexp_extract(url, RE_REST, 1)
    path = F.regexp_extract(rest, RE_PATH, 1)
    path_c = F.when(
        F.regexp_replace(path, "/+$", "") == "", F.lit("/")
    ).otherwise(F.regexp_replace(path, "/+$", ""))
    q = _canon_query(url)
    q_c = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    return F.concat(scheme, F.lit("://"), host, port_c, path_c, q_c)
