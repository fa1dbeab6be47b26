"""WARC-shard ingestion: build Common-Crawl-style WARC record blobs
per shard (ordered aggregation, all JVM-side) and parse them back with
an Arrow-batched ``mapInPandas`` record walker.

This is the ingest analog of the reference's container decode step
(reference/datasets/videoset.py:66-103 walks a video container and
yields frames; here a WARC file is walked and yields response
records). The parse is CONTENT-LENGTH driven — each record's payload
is sliced by the byte count declared in its header, never by
scanning for a sentinel — so a payload that happens to contain
header-like bytes ("WARC/1.0", blank lines) cannot desynchronize the
walk. That is the property that matters at 100 TB: WARC parsing is
embarrassingly parallel per file, and robustness comes from the
length-framed format, not from payload heuristics.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CRLF = "\r\n"


def warc_record(url: Column, payload: Column) -> Column:
    """Render one WARC/1.0 response record as a string column.
    Content-Length counts PAYLOAD BYTES (octet_length, not chars) per
    the WARC spec, so multi-byte UTF-8 text round-trips exactly."""
    return F.concat(
        F.lit("WARC/1.0" + CRLF),
        F.lit("WARC-Type: response" + CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(CRLF),
        F.lit("Content-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit(CRLF + CRLF),
        payload,
        F.lit(CRLF + CRLF),
    )


def build_shards(
    df: DataFrame, shard: Column, order: Column, record: Column
) -> DataFrame:
    """Aggregate records into one blob per shard in deterministic
    ``order`` (the A9 ordered-concat shape: array_sort over structs,
    then project the record field) and cast to binary. One partial-agg
    shuffle keyed on the shard id; blob size is bounded by shard
    sizing policy, not corpus size. ``shard`` must be an INTEGRAL
    column — :func:`parse_shards` emits it as bigint."""
    packed = df.select(shard.alias("shard"), F.struct(order.alias("o"), record.alias("r")).alias("s"))
    return packed.groupBy("shard").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("s")), lambda s: s["r"]), ""
        )
        .cast("binary")
        .alias("blob")
    )


def parse_shards(shards: DataFrame) -> DataFrame:
    """Walk each shard blob record-by-record: parse the header block
    (terminated by CRLFCRLF), slice the payload by Content-Length
    BYTES, skip the record separator, repeat. Arrow-batched
    ``mapInPandas`` — one Python invocation per shard batch, zero
    per-row Python. Emits (shard, url, n_bytes, payload_md5)."""

    def _batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        sep = (CRLF + CRLF).encode()
        for pdf in it:
            out = {"shard": [], "url": [], "n_bytes": [], "payload_md5": []}
            for shard, blob in zip(pdf["shard"], pdf["blob"]):
                data = bytes(blob)
                pos = 0
                while pos < len(data):
                    # startswith(prefix, pos) — NOT data[pos:].startswith —
                    # a tail slice per record would copy O(records x blob)
                    if not data.startswith(b"WARC/1.0", pos):
                        raise ValueError(
                            f"shard {shard}: bad record magic at byte {pos}"
                        )
                    hdr_end = data.index(sep, pos)
                    headers = {}
                    for line in data[pos:hdr_end].decode("utf-8").split(CRLF)[1:]:
                        k, _, v = line.partition(": ")
                        headers[k] = v
                    n = int(headers["Content-Length"])
                    body_start = hdr_end + len(sep)
                    payload = data[body_start : body_start + n]
                    if len(payload) != n:
                        raise ValueError(f"shard {shard}: truncated payload")
                    out["shard"].append(int(shard))
                    out["url"].append(headers["WARC-Target-URI"])
                    out["n_bytes"].append(n)
                    out["payload_md5"].append(hashlib.md5(payload).hexdigest())
                    pos = body_start + n + len(sep)
            yield pd.DataFrame(out)

    return shards.mapInPandas(
        _batches, schema="shard long, url string, n_bytes long, payload_md5 string"
    )
