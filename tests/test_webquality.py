"""Semantic tests for the r5 web-quality operators: gopher_filter
(exact-integer rule boundaries), anchor_text (mass conservation vs the
link-graph rule), tfidf_terms (integer-idf ranking contract)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def _write_docs(tmp_path, rows):
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def test_gopher_filter_rule_boundaries(spark, tmp_path):
    from slowfast_feature_extractor_spark.plans.queries import q_gopher_filter

    # Boundary-exact docs: every comparison lands ON an integer edge so a
    # float re-expression would be ambiguous; the integer forms are not.
    rows = [
        # 0: passes everything (30 words, chars=146 ≥ 4*30, stops=2)
        {"doc_id": 0, "text": ("words " * 28 + "the and").strip(), "source": "s"},
        # 1: 29 words → word-count rule fails, everything else passes
        {"doc_id": 1, "text": ("words " * 27 + "the and").strip(), "source": "s"},
        # 2: awl below 4 (3-char words, chars=90 < 120) → avg-word-len fails
        {"doc_id": 2, "text": ("cat " * 28 + "the and").strip(), "source": "s"},
        # 3: only 1 stopword → stopword rule fails
        {"doc_id": 3, "text": ("words " * 29 + "the").strip(), "source": "s"},
        # 4: 30 tokens, 7 digit-tokens → alpha 23/30, 5*23=115 < 120 fails
        {
            "doc_id": 4,
            "text": ("words " * 21 + "1234 " * 7 + "the and").strip(),
            "source": "s",
        },
    ]
    got = {
        r["doc_id"]: r
        for r in q_gopher_filter(spark, _write_docs(tmp_path, rows)).collect()
    }
    assert got[0]["keep"] and all(
        got[0][c]
        for c in (
            "rule_word_count",
            "rule_avg_word_len",
            "rule_alpha_ratio",
            "rule_stopwords",
        )
    )
    assert not got[1]["rule_word_count"] and not got[1]["keep"]
    assert got[1]["rule_avg_word_len"] and got[1]["rule_stopwords"]
    assert not got[2]["rule_avg_word_len"] and not got[2]["keep"]
    assert not got[3]["rule_stopwords"] and not got[3]["keep"]
    assert not got[4]["rule_alpha_ratio"] and not got[4]["keep"]
    assert got[4]["rule_word_count"]


def test_gopher_keep_is_conjunction_on_corpus(spark):
    from slowfast_feature_extractor_spark.plans.queries import q_gopher_filter

    df = q_gopher_filter(spark, "/root/testdata/sf0.001")
    bad = df.filter(
        F.col("keep")
        != (
            F.col("rule_word_count")
            & F.col("rule_avg_word_len")
            & F.col("rule_alpha_ratio")
            & F.col("rule_stopwords")
        )
    ).count()
    assert bad == 0
    # the synthetic corpus genuinely mixes keeps and drops
    kept = df.filter("keep").count()
    assert 0 < kept < df.count()


def test_anchor_text_mass_matches_link_graph(spark):
    from slowfast_feature_extractor_spark.plans.queries import (
        q_anchor_text,
        q_link_graph,
    )

    sf = "/root/testdata/sf0.001"
    inlinks = q_anchor_text(spark, sf).agg(F.sum("n_inlinks")).collect()[0][0]
    edges = q_link_graph(spark, sf).agg(F.sum("n_links")).collect()[0][0]
    # same deterministic edge scheme → identical total link mass
    assert inlinks == edges


def test_anchor_terms_sorted_and_in_vocab(spark):
    from slowfast_feature_extractor_spark.plans.queries import q_anchor_text

    rows = q_anchor_text(spark, "/root/testdata/sf0.001").collect()
    vocab = {f"w{i}" for i in range(31)}
    for r in rows:
        terms = r["anchor_terms"].split("|")
        assert terms == sorted(terms)
        assert len(terms) == r["n_terms"]
        assert set(terms) <= vocab


def test_tfidf_terms_contract(spark):
    from slowfast_feature_extractor_spark.plans.queries import q_tfidf_terms
    from slowfast_feature_extractor_spark.functions.textstats import STOPWORDS_EN

    rows = q_tfidf_terms(spark, "/root/testdata/sf0.001").collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
        assert 1 <= r["rnk"] <= 3
        assert r["score"] == r["tf"] * (20_000_000 // r["df"])
        assert r["term"] not in STOPWORDS_EN
        assert r["term"].isalpha() and r["term"].islower()
    for src, rs in by_src.items():
        assert len(rs) <= 3
        ordered = sorted(rs, key=lambda r: (-r["score"], r["term"]))
        assert [r["rnk"] for r in ordered] == list(range(1, len(rs) + 1))
