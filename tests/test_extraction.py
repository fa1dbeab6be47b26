"""Byte-identical text parity: the Arrow UDF vs the pure-Python oracle
(SURVEY.md §5 test #1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from slowfast_feature_extractor_spark.functions.extraction import (
    extract_text,
    extract_text_udf,
)


def test_oracle_semantics():
    assert extract_text(b"<p>hello <b>world</b></p>") == "hello world"
    assert extract_text(b"<script>var x=1;</script>text") == "text"
    assert extract_text(b"<style>p{}</style>ok") == "ok"
    assert extract_text(b"<!-- hidden -->shown") == "shown"
    assert extract_text(b"a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;") == 'a & b <c> "d" \'e\''
    assert extract_text(b"&amp;lt;") == "&lt;"  # no double-unescape
    assert extract_text(b"  lots\n\tof\r\n ws  ") == "lots of ws"
    assert extract_text(b"") == ""
    assert extract_text(None) is None
    # non-UTF8 bytes -> U+FFFD, never an exception
    assert "�" in extract_text(b"<p>\xff\xfe bad</p>")
    # malformed tail: unterminated tag swallowed to end (documented)
    assert extract_text(b"ok<div unclosed") == "ok"


def test_udf_byte_identical_to_oracle(spark, pages_pd, pages_df):
    got = (
        pages_df.select("url", "warc_ts", extract_text_udf(F.col("html")).alias("t"))
        .toPandas()
        .set_index(["url", "warc_ts"])["t"]
        .to_dict()
    )
    assert len(got) == len(pages_pd)
    for _, row in pages_pd.iterrows():
        want = extract_text(row["html"])
        key = (row["url"], row["warc_ts"].to_pydatetime())
        assert got[key] == want, f"mismatch at {key}"


def test_fixture_covers_edge_cases(pages_pd):
    htmls = pages_pd["html"].tolist()
    assert any(b"\xff\xfe" in h for h in htmls), "non-UTF8 case missing"
    assert any(h.endswith(b"<div unclosed") for h in htmls), "malformed tail missing"
    assert any(b"<body></body>" in h for h in htmls), "empty body missing"


def test_charset_detect_and_decode(spark):
    from slowfast_feature_extractor_spark.functions.extraction import (
        decode_charset,
        detect_charset,
    )

    cases = [
        # (payload, want_charset, want_decoded)
        (b"plain ascii", "utf-8", "plain ascii"),
        ("café".encode("utf-8"), "utf-8", "café"),
        (b"\xef\xbb\xbf" + "bom'd".encode("utf-8"), "utf-8-bom", "bom'd"),
        (b"\xff\xfe" + "hié".encode("utf-16-le"), "utf-16le", "hié"),
        (b"\xfe\xff" + "hié".encode("utf-16-be"), "utf-16be", "hié"),
        # raw Latin-1 high bytes: invalid UTF-8, total fallback
        (b"caf\xe9", "iso-8859-1", "café"),
        # FF FE prefix but ODD length: not a plausible UTF-16LE body
        (b"\xff\xfeabc", "iso-8859-1", "ÿþabc"),
        # empty body: vacuously valid UTF-8
        (b"", "utf-8", ""),
    ]
    df = spark.createDataFrame(
        [(i, p) for i, (p, _, _) in enumerate(cases)], "id long, payload binary"
    )
    got = {
        r["id"]: (r["cs"], r["txt"])
        for r in df.select(
            "id",
            detect_charset(F.col("payload")).alias("cs"),
            decode_charset(F.col("payload")).alias("txt"),
        ).collect()
    }
    for i, (_, want_cs, want_txt) in enumerate(cases):
        assert got[i] == (want_cs, want_txt), f"case {i}: {got[i]}"
