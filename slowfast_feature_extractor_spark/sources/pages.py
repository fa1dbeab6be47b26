"""Deterministic synthetic `pages` fixture (FIXTURES.md §1-3).

One row per crawl snapshot ``(url, warc_ts, html, text, lang)`` — the
analog of one decoded frame of one video in the reference
(reference/datasets/videoset.py:66-103). Same seed+knobs ⇒ byte-identical
tables (all randomness is md5-keyed, never ``random``/``hash()``).

Skew is built in: a small set of "hot" urls get 50–100× the revisits of
the rest, so salting/bucketing code paths have something real to chew on.
HTML edge cases: entities, comments, script/style blocks, a malformed
tail, an empty body, and raw non-UTF8 bytes.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import types as T

GAPS_HOURS = (1, 6, 24, 7 * 24, 45 * 24)
LANGS = ("en", "de", "fr", "unknown")
_WORDS = (
    "web crawl page snapshot feature window session entity timestamp "
    "extract token vector slow fast fused history revisit content"
).split()


def _h(*parts) -> int:
    """Stable 64-bit hash of the parts (md5-based, platform-independent)."""
    m = hashlib.md5("|".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(m[:8], "big")


def pages_spark_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )


def _make_html(url: str, ts: datetime, seed: int) -> bytes:
    k = _h(url, ts.isoformat(), seed)
    n_para = 1 + k % 4
    words = [_WORDS[_h(k, i, w) % len(_WORDS)] for i in range(n_para) for w in range(6)]
    paras = "".join(
        f"<p>{' '.join(words[i * 6:(i + 1) * 6])}</p>" for i in range(n_para)
    )
    title = f"page {k % 1000} &amp; co"
    body = (
        f"<html><head><title>{title}</title>"
        f"<style>p {{color: red}}</style>"
        f"<script>var x = {k % 97};</script></head>"
        f"<body><!-- crawl {k % 7} -->{paras}"
        f"<span>entity &lt;test&gt; &quot;quoted&quot; &nbsp;ok</span>"
        f"</body></html>"
    )
    raw = body.encode("utf-8")
    mode = k % 10
    if mode == 0:  # malformed tail
        raw += b"<div unclosed"
    elif mode == 1:  # raw non-UTF8 bytes inside a paragraph
        raw = raw.replace(b"</body>", b"<p>\xff\xfe bad bytes</p></body>")
    elif mode == 2:  # empty body
        raw = b"<html><head><title>empty</title></head><body></body></html>"
    return raw


def gen_pages(
    n_hosts: int = 20,
    paths_per_host: int = 10,
    base_revisits: int = 10,
    hot_fraction: float = 0.02,
    hot_multiplier: int = 50,
    seed: int = 42,
    start: datetime = datetime(2024, 1, 1),
) -> pd.DataFrame:
    """Deterministic pages table as a pandas DataFrame (html: bytes,
    text: None)."""
    rows = []
    n_urls = n_hosts * paths_per_host
    n_hot = max(1, int(n_urls * hot_fraction))
    for hsh in range(n_hosts):
        for p in range(paths_per_host):
            url = f"https://host{hsh}.example/p{p}"
            uk = _h(url, seed)
            is_hot = (uk % n_urls) < n_hot
            n_rev = base_revisits * (hot_multiplier if is_hot else 1)
            n_rev = max(1, n_rev + (uk % 5) - 2)
            ts = start + timedelta(minutes=uk % (7 * 24 * 60))
            lang = LANGS[uk % len(LANGS)]
            for r in range(n_rev):
                gap_h = GAPS_HOURS[_h(uk, r) % len(GAPS_HOURS)]
                if is_hot:  # hot urls revisit much faster
                    gap_h = max(1, gap_h // 24)
                ts = ts + timedelta(hours=gap_h, minutes=_h(uk, r, "m") % 60)
                rows.append(
                    {
                        "url": url,
                        "warc_ts": ts,
                        "html": _make_html(url, ts, seed),
                        "text": None,
                        "lang": lang,
                    }
                )
    df = pd.DataFrame(rows)
    return df.sort_values(["url", "warc_ts"], kind="mergesort").reset_index(drop=True)


def gen_host_meta(n_hosts: int = 20, seed: int = 42) -> pd.DataFrame:
    """Small dimension table (analog of camera_assignments.csv,
    reference/camera_assignments.csv:1) for broadcast-join tests."""
    rows = [
        {
            "host": f"host{h}.example",
            "primary_mirror": f"mirror{_h(h, seed) % 5}.example",
            "crawl_tier": 1 + _h(h, seed, "tier") % 3,
        }
        for h in range(n_hosts)
    ]
    return pd.DataFrame(rows)


def gen_page_regions(pages: pd.DataFrame, seed: int = 42) -> pd.DataFrame:
    """Per-row side table (~80% coverage) selecting a content byte-range —
    the bbox-crop analog (reference/just_test_v1.py:52-77,139-175)."""
    rows = []
    for _, r in pages.iterrows():
        k = _h(r["url"], r["warc_ts"].isoformat(), seed, "region")
        if k % 10 < 8:
            n = len(r["html"])
            start = k % max(1, n // 2)
            rows.append(
                {
                    "url": r["url"],
                    "warc_ts": r["warc_ts"],
                    "content_start": int(start),
                    "content_end": int(min(n, start + 64 + k % 256)),
                }
            )
    return pd.DataFrame(rows)
