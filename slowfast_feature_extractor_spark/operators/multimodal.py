"""Multimodal (binary-column) plumbing.

The reference's media path is: opaque bytes → decode → resize →
normalize → feature (reference/datasets/videoset.py:66-139). Here media
are opaque ``binary`` columns with typed metadata; the decode/feature
step runs as Arrow-batched ``mapInPandas`` so bytes cross the JVM↔Python
boundary once per batch, never per row.

Two media paths are REAL end-to-end with stdlib-only codecs:

- audio: :func:`decode_audio` parses WAV containers with ``wave``
  (header + PCM frames, byte round-trip tested); :func:`audio_meta`
  runs it Arrow-batched with an analytic DuckDB oracle
  (``multimodal_audio``);
- image: :func:`decode_image` parses uncompressed 24-bit BMP with
  ``struct`` (BGR order, bottom-up rows, 4-byte padding — pixel
  round-trip tested), :func:`resize_nearest` is a real resize kernel,
  and :func:`image_meta` chains decode → resize → channel sums with an
  analytic oracle (``multimodal_image``).

Compressed formats (PNG/JPEG/video) still need a production codec
(PIL/cv2 — absent in this container): those raise
``NotImplementedError`` while their Spark-side plumbing (schema,
batching, UDF signature, partitioning) is exercised by
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


def decode_image(data: bytes):
    """REAL image decode for uncompressed 24-bit BMP via stdlib
    ``struct`` (BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up padded
    BGR rows) → dict(width, height, bpp, pixels HxWx3 uint8 RGB array).
    The reference decodes frames with cv2
    (reference/datasets/videoset.py:66-95); BMP is the one raster
    container the standard library can parse end-to-end, so this path
    is real and oracle-checked (``multimodal_image``). Compressed
    formats (PNG/JPEG) still need a production codec and raise
    NotImplementedError."""
    import struct

    import numpy as np

    if len(data) < 54 or data[:2] != b"BM":
        raise NotImplementedError(
            "only uncompressed 24-bit BMP is stdlib-decodable; plug a "
            "codec (PIL/cv2) in for compressed formats"
        )
    offset = struct.unpack_from("<I", data, 10)[0]
    width, height = struct.unpack_from("<ii", data, 18)
    _planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    row_stride = (width * 3 + 3) & ~3
    bottom_up = height > 0
    h = abs(height)
    px = np.zeros((h, width, 3), dtype=np.uint8)
    for r in range(h):
        src_row = (h - 1 - r) if bottom_up else r
        start = offset + src_row * row_stride
        row = np.frombuffer(data, dtype=np.uint8, count=width * 3, offset=start)
        px[r] = row.reshape(width, 3)[:, ::-1]  # BGR -> RGB
    return {"width": width, "height": h, "bpp": bpp, "pixels": px}


def synth_bmp(width: int, height: int, pixel_fn) -> bytes:
    """Serialize ``pixel_fn(x, y) -> (r, g, b)`` into a real bottom-up
    24-bit BMP blob (struct-packed headers, 4-byte-padded BGR rows) —
    the deterministic generator behind the image fixtures and the
    ``multimodal_image`` registry row."""
    import struct

    row_stride = (width * 3 + 3) & ~3
    img_size = row_stride * height
    out = bytearray()
    out += struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    out += struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    for y in reversed(range(height)):  # bottom-up
        row = bytearray()
        for x in range(width):
            r, g, b = pixel_fn(x, y)
            row += bytes((b, g, r))
        row += b"\x00" * (row_stride - len(row))
        out += row
    return bytes(out)


def resize_nearest(pixels, out_w: int, out_h: int):
    """REAL nearest-neighbor resize over a decoded HxWx3 array (pure
    numpy index math — the reference's cv2.resize analog,
    reference/datasets/videoset.py:91-95, with the deterministic
    floor-index kernel so SQL oracles can reproduce it exactly):
    out[i, j] = src[floor(i*h/out_h), floor(j*w/out_w)]."""
    import numpy as np

    h, w = pixels.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return pixels[rows[:, None], cols[None, :]]


def image_meta(
    df: DataFrame,
    media_col: str = "image",
    id_col: str = "doc_id",
    resize_to: tuple[int, int] | None = None,
) -> DataFrame:
    """Arrow-batched REAL decode of a BMP binary column →
    (doc_id, width, height, bpp, sum_r, sum_g, sum_b[, rs_sum_r,
    rs_sum_g, rs_sum_b]): header metadata plus integer channel sums
    (exact cross-engine hashes), optionally after a real
    nearest-neighbor resize. Undecodable blobs yield null rows (P9)."""
    import numpy as np

    cols = ["width", "height", "bpp", "sum_r", "sum_g", "sum_b"]
    if resize_to is not None:
        cols += ["rs_sum_r", "rs_sum_g", "rs_sum_b"]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {c: [] for c in ["doc_id", *cols]}
            for i, b in zip(pdf[id_col], pdf[media_col]):
                rows["doc_id"].append(i)
                try:
                    d = decode_image(bytes(b))
                except Exception:
                    for c in cols:
                        rows[c].append(None)
                    continue
                px = d["pixels"].astype(np.int64)
                rows["width"].append(d["width"])
                rows["height"].append(d["height"])
                rows["bpp"].append(d["bpp"])
                for k, c in enumerate(("sum_r", "sum_g", "sum_b")):
                    rows[c].append(int(px[:, :, k].sum()))
                if resize_to is not None:
                    rs = resize_nearest(d["pixels"], *resize_to).astype(np.int64)
                    for k, c in enumerate(("rs_sum_r", "rs_sum_g", "rs_sum_b")):
                        rows[c].append(int(rs[:, :, k].sum()))
            yield pd.DataFrame(rows)

    schema = "doc_id long, width int, height int, bpp int, " + ", ".join(
        f"{c} long" for c in cols[3:]
    )
    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        _batches, schema=schema
    )


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
    """Resize over COMPRESSED bytes needs a codec to decode first
    (cv2.resize in the reference, reference/datasets/videoset.py:91-95).
    For stdlib-decodable BMP the real path is
    ``resize_nearest(decode_image(data)["pixels"], w, h)``."""
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
