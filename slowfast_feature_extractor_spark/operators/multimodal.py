"""Multimodal (binary-column) plumbing.

The reference's media path is: opaque bytes → decode → resize →
normalize → feature (reference/datasets/videoset.py:66-139). Here media
are opaque ``binary`` columns with typed metadata; the decode/feature
step runs as Arrow-batched ``mapInPandas`` so bytes cross the JVM↔Python
boundary once per batch, never per row.

The audio path is REAL end-to-end: :func:`decode_audio` parses WAV
containers with the stdlib ``wave`` module (header + PCM frames, byte
round-trip tested) and :func:`audio_meta` runs it Arrow-batched with an
analytic DuckDB oracle (``multimodal_audio``). The image codecs are not
installed in this container, so those decoders remain STUBS that raise
``NotImplementedError``; their Spark-side plumbing (schema, batching,
UDF signature, partitioning) is real and tested via
:func:`media_meta`'s deterministic fake featurizer.
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


def decode_audio(data: bytes) -> dict:
    """REAL audio decode for WAV containers via the stdlib ``wave``
    module (no third-party codec needed): parses the RIFF header and
    returns the PCM frames plus format metadata. This is the analog of
    the reference's decode step (reference/datasets/videoset.py:66-139)
    for the one media format the standard library can parse end-to-end;
    other containers still need a production codec (see
    :func:`decode_image`)."""
    import io
    import wave as wavelib

    with wavelib.open(io.BytesIO(data), "rb") as w:
        nf = w.getnframes()
        return {
            "sample_rate": w.getframerate(),
            "channels": w.getnchannels(),
            "sample_width": w.getsampwidth(),
            "n_frames": nf,
            "pcm": w.readframes(nf),
        }


def synth_wav(sample_rate: int, channels: int, frames) -> bytes:
    """Serialize int16 PCM frames (iterable of per-channel tuples or a
    flat interleaved iterable) into a real WAV blob via stdlib ``wave``
    — the deterministic generator behind the audio test fixtures and
    the ``multimodal_audio`` registry row."""
    import io
    import struct
    import wave as wavelib

    flat = []
    for fr in frames:
        if isinstance(fr, (tuple, list)):
            flat.extend(fr)
        else:
            flat.append(fr)
    buf = io.BytesIO()
    with wavelib.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(flat)}h", *flat))
    return buf.getvalue()


def audio_meta(
    df: DataFrame, media_col: str = "audio", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched REAL decode of a WAV binary column →
    (doc_id, sample_rate, channels, sample_width, n_frames, duration_ms,
    sum_abs, peak): header metadata plus integer amplitude aggregates
    over the decoded PCM (integers so cross-engine hashes are exact).
    Null/empty blobs yield a null-metadata row rather than failing the
    batch (the engine's P9 frame-validity policy)."""
    import numpy as np

    cols = [
        "sample_rate", "channels", "sample_width", "n_frames",
        "duration_ms", "sum_abs", "peak",
    ]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {c: [] for c in ["doc_id", *cols]}
            for i, b in zip(pdf[id_col], pdf[media_col]):
                rows["doc_id"].append(i)
                try:
                    d = decode_audio(bytes(b))
                except Exception:
                    for c in cols:
                        rows[c].append(None)
                    continue
                pcm = np.frombuffer(d["pcm"], dtype="<i2").astype("int64")
                rows["sample_rate"].append(d["sample_rate"])
                rows["channels"].append(d["channels"])
                rows["sample_width"].append(d["sample_width"])
                rows["n_frames"].append(d["n_frames"])
                rows["duration_ms"].append(
                    d["n_frames"] * 1000 // d["sample_rate"]
                )
                rows["sum_abs"].append(int(np.abs(pcm).sum()))
                rows["peak"].append(int(np.abs(pcm).max()) if len(pcm) else 0)
            yield pd.DataFrame(rows)

    schema = (
        "doc_id long, sample_rate int, channels int, sample_width int, "
        "n_frames long, duration_ms long, sum_abs long, peak int"
    )
    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        _batches, schema=schema
    )


def fake_feature(n_bytes: int, k: int = 4) -> list[float]:
    """Deterministic stand-in for the decode→pool feature (documented
    fake): f_i = (n_bytes * i) mod 97."""
    return [float((n_bytes * i) % 97) for i in range(1, k + 1)]


def frame_sample(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    frame_bytes: int = 64,
    num_frames: int = 8,
    alpha: int = 4,
) -> DataFrame:
    """Dual-rate frame sampling over opaque media bytes — the Spark-side
    plumbing of the reference's stride sampling (reference/test_net.py:
    62-74) with the codec stubbed: each ``frame_bytes`` slice of the blob
    stands in for a decoded frame; fast = ``num_frames`` evenly-strided
    frames, slow = ``num_frames/alpha`` (pad-repeat-last when short).
    Output one row per (id, pathway, frame_idx) with the frame's md5 —
    exactly the explode shape a real decoder would feed downstream."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def sample(b: bytes, k: int) -> list[bytes]:
            frames = [b[i:i + frame_bytes] for i in range(0, len(b), frame_bytes)] or [b""]
            stride = max(1, len(frames) // k)
            picked = frames[::stride][:k]
            while len(picked) < k:  # pad-repeat-last (test_net.py:126-136)
                picked.append(picked[-1])
            return picked

        for pdf in it:
            rows = {"doc_id": [], "pathway": [], "frame_idx": [], "frame_md5": []}
            for i, b in zip(pdf[id_col], pdf[media_col]):
                b = bytes(b) if b is not None else b""
                for pathway, k in (("fast", num_frames), ("slow", num_frames // alpha)):
                    for j, fr in enumerate(sample(b, k)):
                        rows["doc_id"].append(i)
                        rows["pathway"].append(pathway)
                        rows["frame_idx"].append(j)
                        # digest over the UPPERCASE HEX of the bytes, so SQL
                        # oracles stay byte-accurate on non-ASCII content
                        # (md5 in DuckDB/most engines takes strings only)
                        rows["frame_md5"].append(
                            hashlib.md5(fr.hex().upper().encode()).hexdigest()
                        )
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        _batches, schema="doc_id long, pathway string, frame_idx int, frame_md5 string"
    )


def resize_stub(data: bytes, out_w: int, out_h: int):  # pragma: no cover - stub
    """Real resize needs a codec (cv2.resize in the reference,
    reference/datasets/videoset.py:91-95) — unavailable here."""
    raise NotImplementedError("image codec not available in this environment")


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
                    # md5 of the uppercase hex (portable to string-only
                    # md5 implementations, byte-accurate on any content)
                    "digest": media.map(
                        lambda b: hashlib.md5(b.hex().upper().encode()).hexdigest()
                        if b is not None
                        else None
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
