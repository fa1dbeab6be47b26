"""Multimodal binary plumbing: metadata extraction and dual-rate frame
sampling over opaque bytes (codec stubbed, plumbing real)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from slowfast_feature_extractor_spark.operators.multimodal import (
    decode_image,
    frame_sample,
    media_meta,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"A" * 640),          # 10 frames of 64B
        (2, b"B" * 100),          # 2 frames (one short)
        (3, b""),                  # empty blob
    ]
    return spark.createDataFrame(rows, schema="doc_id long, media binary")


def test_media_meta(spark, media):
    out = {r["doc_id"]: r for r in media_meta(media).collect()}
    assert out[1]["n_bytes"] == 640
    assert out[1]["digest"] == hashlib.md5((b"A" * 640).hex().upper().encode()).hexdigest()
    assert out[3]["n_bytes"] == 0
    assert out[1]["f1"] == float((640 * 1) % 97)


def test_frame_sample_dual_rate(spark, media):
    out = frame_sample(media, frame_bytes=64, num_frames=8, alpha=4).toPandas()
    g1 = out[(out.doc_id == 1)]
    fast = g1[g1.pathway == "fast"].sort_values("frame_idx")
    slow = g1[g1.pathway == "slow"].sort_values("frame_idx")
    assert len(fast) == 8 and len(slow) == 2  # NUM_FRAMES vs NUM_FRAMES/ALPHA
    assert fast.frame_md5.iloc[0] == hashlib.md5((b"A" * 64).hex().upper().encode()).hexdigest()
    # short media pads by repeating the last frame
    g2 = out[(out.doc_id == 2) & (out.pathway == "fast")].sort_values("frame_idx")
    assert len(g2) == 8
    assert g2.frame_md5.iloc[-1] == g2.frame_md5.iloc[1]  # repeated pad
    # empty blob still yields full schema rows
    g3 = out[out.doc_id == 3]
    assert len(g3) == 8 + 2


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_frames_oracle_byte_accurate_on_non_ascii(spark, tmp_path):
    """The frames/meta oracles slice the HEX encoding (2 chars/byte), so
    they must agree with the engine's byte slicing even when the text is
    multi-byte UTF-8 — the exact case a char-sliced oracle gets wrong."""
    import pandas as pd

    from slowfast_feature_extractor_spark.plans.compare import compare
    from slowfast_feature_extractor_spark.plans.queries import REGISTRY

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["héllo wörld ü" * 13, "日本語のテキスト" * 9, "plain ascii " * 11],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    for name in ("multimodal_frames", "multimodal_meta"):
        fn, sql = REGISTRY[name]
        ok, msg = compare(spark, str(tmp_path), fn, sql)
        assert ok, f"{name}: {msg}"


def test_decode_audio_roundtrip_bytes_exact():
    """decode_audio parses a real RIFF/WAV container: header fields and
    PCM frames come back byte-identical to what synth_wav wrote."""
    import struct

    from slowfast_feature_extractor_spark.operators.multimodal import (
        decode_audio,
        synth_wav,
    )

    frames = [(i * 5 - 300, -i * 3 + 100) for i in range(40)]  # stereo
    blob = synth_wav(11025, 2, frames)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    d = decode_audio(blob)
    assert (d["sample_rate"], d["channels"], d["sample_width"], d["n_frames"]) == (
        11025, 2, 2, 40,
    )
    want = struct.pack("<80h", *[s for fr in frames for s in fr])
    assert d["pcm"] == want


def test_audio_meta_null_and_malformed(spark):
    """Malformed blobs yield null-metadata rows, not task failures
    (P9 frame-validity policy on the audio path)."""
    from slowfast_feature_extractor_spark.operators.multimodal import (
        audio_meta,
        synth_wav,
    )

    good = synth_wav(8000, 1, [(100,), (-200,), (300,)])
    df = spark.createDataFrame(
        [(1, good), (2, b"not a wav"), (3, b"")],
        schema="doc_id long, audio binary",
    )
    rows = {r["doc_id"]: r for r in audio_meta(df).collect()}
    assert rows[1]["n_frames"] == 3
    assert rows[1]["sum_abs"] == 600 and rows[1]["peak"] == 300
    assert rows[1]["duration_ms"] == 0  # 3 frames @ 8kHz -> 0 ms floor
    assert rows[2]["sample_rate"] is None
    assert rows[3]["sample_rate"] is None


def test_decode_bmp_roundtrip_pixels_exact():
    """decode_image parses real BMP containers pixel-exactly, including
    BGR order, bottom-up rows, and 4-byte row padding (odd widths)."""
    import numpy as np

    from slowfast_feature_extractor_spark.operators.multimodal import (
        decode_image,
        synth_bmp,
    )

    for w, h in ((5, 3), (4, 4), (7, 2)):  # odd widths exercise padding
        want = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                want[y, x] = ((x * 40 + y) % 256, (x + y * 50) % 256, (x * y + 7) % 256)
        blob = synth_bmp(w, h, lambda x, y: tuple(int(v) for v in want[y, x]))
        d = decode_image(blob)
        assert (d["width"], d["height"], d["bpp"]) == (w, h, 24)
        np.testing.assert_array_equal(d["pixels"], want)


def test_resize_nearest_kernel():
    import numpy as np

    from slowfast_feature_extractor_spark.operators.multimodal import resize_nearest

    src = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = resize_nearest(src, 3, 2)  # (out_w=3, out_h=2)
    assert out.shape == (2, 3, 3)
    for i in range(2):
        for j in range(3):
            np.testing.assert_array_equal(out[i, j], src[(i * 4) // 2, (j * 6) // 3])


def test_decode_image_rejects_compressed():
    import pytest

    from slowfast_feature_extractor_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")
