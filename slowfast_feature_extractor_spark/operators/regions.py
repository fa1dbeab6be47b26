"""Content-region selection and host-dimension enrichment for pages.

- :func:`apply_content_regions` is the bbox-crop analog
  (reference/just_test_v1.py:139-175 crop_frame; side-file load + schema
  validation reference/just_test_v1.py:52-77): a per-row byte-range from
  a deliberately-incomplete side table selects the content region of the
  raw html; rows without a region keep the full document (left outer —
  the reference tolerates missing bboxes, reference/just_test_v1.py:192).
- :func:`join_host_meta` is the camera_assignments.csv analog
  (reference/just_test_v1.py:1514-1517, J1): parse the host out of the
  url (P6) and broadcast-hash-join the small dimension; the optional
  tier filter mirrors the ipsilateral-camera predicate P4
  (reference/just_test_v1.py:1543-1549).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_content_regions(
    pages: DataFrame,
    regions: DataFrame,
    out_col: str = "html_region",
) -> DataFrame:
    """Left-join regions on (url, warc_ts); slice html to
    [content_start, content_end) where a region exists, else pass the
    full html through."""
    joined = pages.join(regions, ["url", "warc_ts"], "left")
    sliced = F.when(
        # BOTH bounds must be present: a half-null range (content_end
        # missing) would make substring's length null and silently
        # nullify the document instead of passing it through
        F.col("content_start").isNotNull() & F.col("content_end").isNotNull(),
        # substring is 1-based; works on binary (returns binary)
        F.substring(
            F.col("html"),
            F.col("content_start") + 1,
            F.col("content_end") - F.col("content_start"),
        ),
    ).otherwise(F.col("html"))
    return joined.withColumn(out_col, sliced).drop("content_start", "content_end")


def host_of(url_col) -> F.Column:
    """P6 key-parse: the host component of an http(s) url — scheme
    case-insensitive, path optional, port stripped (the naive
    ``^https?://([^/]+)/`` form returned '' for 'https://example.com'
    with no trailing slash and kept ':8443'). Host case is preserved
    (full normalization lives in urltools.canonicalize_url)."""
    return F.regexp_extract(
        url_col, r"(?i)^https?://([^/:?#]+)(?::\d+)?(?:[/?#]|$)", 1
    )


def join_host_meta(
    pages: DataFrame,
    host_meta: DataFrame,
    keep_tier: int | None = None,
) -> DataFrame:
    """Broadcast hash join against the host dimension; optionally keep
    only hosts of one crawl tier (P4-style predicate-after-dim-lookup).

    The join is LEFT: a page whose host is missing from the dimension
    (a new host between dimension refreshes) keeps its row with null
    meta columns instead of silently vanishing — the same
    tolerate-missing contract as :func:`apply_content_regions`. The
    ``keep_tier`` filter naturally drops unmatched rows (null tier),
    reproducing the old inner-join semantics where the predicate is
    applied."""
    enriched = pages.withColumn("host", host_of(F.col("url"))).join(
        F.broadcast(host_meta), "host", "left"
    )
    if keep_tier is not None:
        enriched = enriched.filter(F.col("crawl_tier") == keep_tier)
    return enriched
