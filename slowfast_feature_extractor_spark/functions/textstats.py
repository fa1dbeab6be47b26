"""Text analysis for training-data pipelines: tokenization, quality
scoring, language-ID, fingerprinting — all pure Column expressions
(JVM-side, codegen'd; no Python anywhere).

Every formula is deliberately cross-engine-reproducible (simple splits,
md5, integer arithmetic) so the DuckDB oracles in __spark_entry__ can
compute bit-identical values.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword/marker sets (public common words).
STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "it")
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "en": ("the", "of", "and", "is", "it", "a"),
    "es": ("el", "los", "las", "y", "que", "es"),
    "fr": ("le", "la", "les", "et", "est", "que"),
}


def tokens(col: Column) -> Column:
    """Whitespace tokens, empty strings dropped."""
    return F.filter(F.split(col, " "), lambda x: x != F.lit(""))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Regex token counting: alpha runs, digit runs, and lone symbols —
    a BPE-ish pre-tokenizer estimate."""
    return F.regexp_count(col, F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"))


def stopword_count(col: Column, stopwords: Sequence[str] = STOPWORDS_EN) -> Column:
    stops = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(tokens(col), lambda x: F.array_contains(stops, x)))


def avg_token_len(col: Column) -> Column:
    """Mean token length via pure string arithmetic (chars excluding
    spaces / token count) — reproducible in any SQL engine."""
    n = token_count(col)
    chars = F.length(F.replace(col, F.lit(" "), F.lit("")))
    return F.when(n > 0, chars.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(col: Column, stopwords: Sequence[str] = STOPWORDS_EN) -> Column:
    """Deterministic quality heuristic in [0,1]: length signal + stopword
    naturalness + word-shape signal (the reference's analog is its
    rating-validity gating, reference/just_test_v1.py:1550-1557 — a
    quality filter before heavy work)."""
    n = token_count(col)
    stop_ratio = F.when(n > 0, stopword_count(col, stopwords).cast("double") / n).otherwise(F.lit(0.0))
    len_sig = F.least(n.cast("double") / F.lit(200.0), F.lit(1.0))
    shape_sig = F.least(avg_token_len(col) / F.lit(8.0), F.lit(1.0))
    return F.round(len_sig * 0.4 + stop_ratio * 0.3 + shape_sig * 0.3, 6)


def gopher_rules(col: Column) -> dict[str, Column]:
    """Gopher-style quality rule flags (Rae et al. 2021 §A1.1) in EXACT
    integer arithmetic — ``4*w <= chars <= 10*w`` instead of float
    ``chars/w`` ratios, so no boundary document can flake on a rounding
    tie in any engine. The mean-word-length LOWER bound is 4, tighter
    than the paper's 3, chosen deliberately: this corpus's minimum is
    3.7, so the published bound would never fire and the rule would be
    untestable — the integer re-expression technique is the point, the
    constant is a parameter. Returns {rule_word_count,
    rule_avg_word_len, rule_alpha_ratio, rule_stopwords, keep}; shared
    by the standalone ``gopher_filter`` row and the ``funnel_stats``
    accounting row."""
    toks = tokens(col)
    w = F.size(toks)
    chars = F.length(F.replace(col, F.lit(" "), F.lit("")))
    stops = stopword_count(col)
    alpha = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
    r_wc = (w >= 30) & (w <= 100000)
    r_awl = (chars >= 4 * w) & (chars <= 10 * w)
    r_alpha = 5 * alpha >= 4 * w
    r_stop = stops >= 2
    return {
        "rule_word_count": r_wc,
        "rule_avg_word_len": r_awl,
        "rule_alpha_ratio": r_alpha,
        "rule_stopwords": r_stop,
        "keep": r_wc & r_awl & r_alpha & r_stop,
    }


def langid(col: Column, markers: Mapping[str, Sequence[str]] = LANG_MARKERS) -> Column:
    """N-gram-heuristic language ID: count marker-word hits per language,
    argmax with deterministic tie-break (ascending language code).
    Returns 'und' when no marker hits at all."""
    toks = tokens(col)
    scores: dict[str, Column] = {}
    for lang in sorted(markers):
        marks = F.array(*[F.lit(m) for m in markers[lang]])
        scores[lang] = F.size(F.filter(toks, lambda x: F.array_contains(marks, x)))
    best = F.greatest(*scores.values()) if len(scores) > 1 else next(iter(scores.values()))
    expr = F.when(best <= 0, F.lit("und"))
    for lang in sorted(markers):  # ascending code ⇒ first max wins
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def fingerprint(col: Column) -> Column:
    """Whole-document fingerprint: md5 of the lowercased,
    whitespace-normalized text (rolling-hash analog)."""
    normalized = F.regexp_replace(F.lower(col), " +", " ")
    return F.md5(normalized)


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string>; empty array when the
    document has fewer than ``n`` tokens."""
    toks = tokens(col)
    n_sh = F.size(toks) - F.lit(n - 1)
    return F.when(
        n_sh >= 1,
        F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def min_shingle_hash(col: Column, n: int = 3) -> Column:
    """MinHash with k=1 over shingle md5s — a content-sampled
    fingerprint stable under small edits."""
    return F.array_min(F.transform(shingles(col, n), F.md5))
