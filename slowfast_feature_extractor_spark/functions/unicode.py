"""Unicode normalization for web text.

Raw crawl text mixes precomposed and decomposed codepoint sequences
(editors, OSes, and CMSes disagree), singleton compatibility characters
(U+212B ANGSTROM SIGN vs U+00C5), and multi-combining-mark orderings.
Every downstream exact operator — hash dedup, shingle decontamination,
fingerprinting — treats byte-different-but-canonically-equal strings as
distinct unless the corpus is normalized first, so NFC normalization is
a standard early pass in web pipelines (it is the W3C recommendation
for web content).

Spark has no built-in normalizer, so this is an Arrow-batched pandas
UDF over stdlib ``unicodedata`` — map-only, no shuffle, scales linearly
to any corpus size. The DuckDB oracle replays ``nfc_normalize()``
(utf8proc); both implement Unicode NFC so outputs are byte-identical
(parity verified in tests/test_textstats.py for combining marks,
singletons, Hangul jamo, and multi-mark canonical reordering).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nfc_normalize(col: Column) -> Column:
    """Canonical-composition (NFC) normalization of a string column."""

    @F.pandas_udf("string")
    def _nfc(s):  # type: ignore[no-untyped-def]
        import unicodedata

        return s.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    return _nfc(col)
