"""Multimodal (binary-column) plumbing.

The reference's media path is: opaque bytes → decode → resize →
normalize → feature (reference/datasets/videoset.py:66-139). Here media
are opaque ``binary`` columns with typed metadata; the decode/feature
step runs as Arrow-batched ``mapInPandas`` so bytes cross the JVM↔Python
boundary once per batch, never per row.

The image/audio codecs are not installed in this container, so the real
decoders are STUBS that raise ``NotImplementedError``; the Spark-side
plumbing (schema, batching, UDF signature, partitioning) is real and
tested via :func:`media_meta`'s deterministic fake featurizer.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "doc_id long, n_bytes long, digest string, f1 double, f2 double, f3 double, f4 double"
)


def decode_image(data: bytes):  # pragma: no cover - stub
    """Real image decode (PIL/cv2) — unavailable in this container.
    The production build plugs a codec in here; everything downstream
    (batching, schema, partitioning) is already exercised by
    media_meta/fake_feature."""
    raise NotImplementedError("image codec not available in this environment")


def decode_audio(data: bytes):  # pragma: no cover - stub
    raise NotImplementedError("audio codec not available in this environment")


def fake_feature(n_bytes: int, k: int = 4) -> list[float]:
    """Deterministic stand-in for the decode→pool feature (documented
    fake): f_i = (n_bytes * i) mod 97."""
    return [float((n_bytes * i) % 97) for i in range(1, k + 1)]


def media_meta(df: DataFrame, media_col: str = "media", id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched metadata + (fake) feature extraction over a binary
    media column: byte length, md5 digest, 4-dim feature."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            media = pdf[media_col]
            n = media.map(lambda b: len(b) if b is not None else 0)
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n.astype("int64"),
                    "digest": media.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                }
            )
            feats = n.map(fake_feature)
            for i in range(4):
                out[f"f{i + 1}"] = feats.map(lambda v, i=i: v[i])
            yield out

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        _batches, schema=META_SCHEMA
    )
