"""URL canonicalization + corpus-split operators (web-pipeline r4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from slowfast_feature_extractor_spark.functions import urltools as UT


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [
        r["c"]
        for r in df.select(UT.canonicalize_url(F.col("url")).alias("c"))
        .collect()
    ]


def test_canonicalize_rules(spark):
    got = _canon(
        spark,
        [
            # case + www + default port + trailing slash + fragment
            "HTTP://WWW.Ex.COM:80/A/b/#frag",
            "https://ex.com:443/x",
            # non-default port survives
            "https://ex.com:8443/x",
            # tracking params dropped, rest sorted; empty query elided
            "https://ex.com/p?utm_source=a&id=9&b=2&ref=rss",
            "https://ex.com/p?utm_campaign=x",
            # bare host -> '/'
            "https://ex.com",
            "https://ex.com/?gclid=1&fbclid=2",
        ],
    )
    assert got == [
        "http://ex.com/A/b",
        "https://ex.com/x",
        "https://ex.com:8443/x",
        "https://ex.com/p?b=2&id=9",
        "https://ex.com/p",
        "https://ex.com/",
        "https://ex.com/",
    ]


def test_synth_url_roundtrips_to_one_key_per_doc(spark):
    # messy variants of the same doc collapse: the canonical url is a
    # pure function of (doc_id, source) with all noise removed
    df = spark.createDataFrame(
        [(i, "src0") for i in range(60)], ["doc_id", "source"]
    ).select(
        "doc_id",
        UT.synth_url(F.col("doc_id"), F.col("source")).alias("url"),
    )
    out = df.select(
        "doc_id", UT.canonicalize_url(F.col("url")).alias("c")
    ).collect()
    for r in out:
        c = r["c"]
        assert c.startswith("http://src0.example.com/Archive/") or c.startswith(
            "https://src0.example.com/Archive/"
        ), c
        assert "utm_" not in c and "#" not in c and "ref=" not in c
        assert ":80" not in c and ":443" not in c
        assert not c.endswith("/") or c.endswith(".com/")
        # id param (when present) survived the filter
        if r["doc_id"] % 7 != 0:
            assert f"?id={r['doc_id'] % 97}" in c, c


def test_hash_split_is_deterministic_and_leakage_safe(spark):
    from conftest import SF_TINY
    from slowfast_feature_extractor_spark.plans.queries import q_hash_split

    a = {tuple(r) for r in q_hash_split(spark, SF_TINY).collect()}
    b = {tuple(r) for r in q_hash_split(spark, SF_TINY).collect()}
    assert a == b  # same split every run — no rand()
    splits = {r[0] for r in a}
    assert splits <= {"train", "validation", "test"}
    n = {s: sum(r[2] for r in a if r[0] == s) for s in splits}
    total = sum(n.values())
    assert 0.85 < n.get("train", 0) / total < 0.95


def test_stratified_sample_topk(spark):
    from conftest import SF_TINY
    from slowfast_feature_extractor_spark.plans.queries import q_stratified_sample

    rows = q_stratified_sample(spark, SF_TINY).collect()
    per_src: dict[str, list[int]] = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r["rk"])
    for src, rks in per_src.items():
        assert sorted(rks) == list(range(1, len(rks) + 1)), src
        assert len(rks) <= 16


def test_corpus_shuffle_is_a_permutation(spark):
    from conftest import SF_TINY
    from slowfast_feature_extractor_spark.plans.queries import q_corpus_shuffle

    rows = q_corpus_shuffle(spark, SF_TINY).collect()
    assert len({r["doc_id"] for r in rows}) == len(rows)
    per_shard: dict[int, list[int]] = {}
    for r in rows:
        assert r["shard"] == r["shuf_key"] % 64
        per_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, ps in per_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard


def test_sequence_pack_invariants(spark):
    """Concat-and-chunk semantics: every doc's offset < budget, spans
    are consistent with its token count, and the two-level prefix sum
    conserves the corpus total."""
    from conftest import SF_TINY
    from slowfast_feature_extractor_spark.plans.queries import q_sequence_pack

    rows = q_sequence_pack(spark, SF_TINY).collect()
    budget = 512
    total = sum(r["n_tokens"] for r in rows)
    max_end = max(r["seq_end"] for r in rows)
    # chunk count implied by spans == chunk count implied by the total
    assert max_end == (total - 1) // budget
    for r in rows:
        assert 0 <= r["offset_in_seq"] < budget
        assert r["seq_start"] <= r["seq_end"]
        span_capacity = (r["seq_end"] - r["seq_start"] + 1) * budget
        assert r["offset_in_seq"] + r["n_tokens"] <= span_capacity


def test_decontaminate_flags_real_overlaps_only(spark, tmp_path):
    """A planted test-split doc contaminates exactly the train docs
    sharing a trigram with it, with the right collision counts."""
    import pandas as pd

    from slowfast_feature_extractor_spark.operators.dedup import md5i64  # noqa: F401
    from slowfast_feature_extractor_spark.plans.queries import q_decontaminate

    # find ids landing in train (<90) and test (>=95) buckets
    import hashlib

    def bucket(i):
        return int(hashlib.md5(f"split:{i}".encode()).hexdigest()[:15], 16) % 100

    train_ids = [i for i in range(400) if bucket(i) < 90][:3]
    test_ids = [i for i in range(400) if bucket(i) >= 95][:1]
    assert train_ids and test_ids
    leak = "alpha beta gamma delta"          # shared 4 tokens -> 2 trigrams
    clean = "one two three four five"
    docs = pd.DataFrame(
        {
            "doc_id": train_ids + test_ids,
            "text": [leak, clean, "x y z w", leak + " extra"],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    got = {r["doc_id"]: r["n_shared"] for r in q_decontaminate(spark, str(tmp_path)).collect()}
    # train doc 0 shares both trigrams of 'alpha beta gamma delta';
    # the test doc is 'leak + extra' which contains them plus more
    assert got.get(train_ids[0]) == 2
    assert train_ids[1] not in got and train_ids[2] not in got


def test_pii_redact_exact(spark, tmp_path):
    import hashlib

    import pandas as pd

    from slowfast_feature_extractor_spark.plans.queries import q_pii_redact

    docs = pd.DataFrame({"doc_id": [3], "text": ["mail me at bob.smith@corp.io now"]})
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    r = q_pii_redact(spark, str(tmp_path)).collect()[0]
    # injected: user3@crawl3.org, +1-555-0003, 10.3.9.21 — plus the
    # in-text email; phone and ip appear once each
    assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (2, 1, 1)
    want = (
        "mail me at <EMAIL> now contact <EMAIL> tel <PHONE> host <IP>"
    )
    assert r["redacted_md5"] == hashlib.md5(want.encode()).hexdigest()


def test_lm_unigram_score_orders_by_rarity(spark, tmp_path):
    import pandas as pd

    from slowfast_feature_extractor_spark.plans.queries import q_lm_unigram_score

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["the the the the", "the the rare1 rare2", "zzz qqq vvv www"],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    got = {r["doc_id"]: r["avg_logp"] for r in q_lm_unigram_score(spark, str(tmp_path)).collect()}
    # common-word doc scores highest, all-hapax doc lowest
    assert got[1] > got[2] > got[3]


def test_canonicalize_idempotent(spark):
    """canon(canon(u)) == canon(u) — canonical form is a fixed point."""
    from pyspark.sql import functions as F

    from slowfast_feature_extractor_spark.functions import urltools as UT

    df = spark.createDataFrame([(i, f"src{i % 5}") for i in range(80)],
                               ["doc_id", "source"])
    once = df.select(
        UT.canonicalize_url(UT.synth_url(F.col("doc_id"), F.col("source"))).alias("c1")
    )
    both = once.select("c1", UT.canonicalize_url(F.col("c1")).alias("c2"))
    assert both.filter(F.col("c1") != F.col("c2")).count() == 0


def test_dedup_incremental_plants_exact_and_near(spark, tmp_path):
    import pandas as pd

    from slowfast_feature_extractor_spark.plans.queries import q_dedup_incremental

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = pd.DataFrame(
        {
            # ids: %10>=8 -> new batch (8, 9, 18); others old corpus
            "doc_id": [0, 1, 2, 8, 9, 18],
            "text": [
                base,                       # old
                "one two three four five six seven",  # old
                "completely different words here now",  # old
                base,                       # new: exact dup of doc 0
                base + " extra tail words changing little",  # new: near dup
                "nothing in common with anything else at all",  # new: unique
            ],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    got = {r["doc_id"]: r["status"] for r in q_dedup_incremental(spark, str(tmp_path)).collect()}
    assert got[8] == "exact"
    assert got[9] == "near"  # banding admits the tail-edited doc as near
    assert got[18] == "unique"


def test_dedup_incremental_indexed_matches_and_reuses_index(spark, tmp_path):
    """The persisted-index variant returns the SAME statuses as the
    recompute-everything variant, builds its parquet index exactly once,
    and invalidates it when the corpus file changes."""
    import os
    import time

    import pandas as pd

    from slowfast_feature_extractor_spark.plans.queries import (
        build_incremental_index,
        incremental_index_dir,
        q_dedup_incremental,
        q_dedup_incremental_indexed,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 8, 9, 18],
            "text": [
                base,
                "one two three four five six seven",
                "completely different words here now",
                base,
                base + " extra tail words changing little",
                "nothing in common with anything else at all",
            ],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    want = {r["doc_id"]: r["status"]
            for r in q_dedup_incremental(spark, str(tmp_path)).collect()}
    got = {r["doc_id"]: r["status"]
           for r in q_dedup_incremental_indexed(spark, str(tmp_path)).collect()}
    assert got == want

    idx = incremental_index_dir(str(tmp_path))
    mtime = os.path.getmtime(idx)
    assert build_incremental_index(spark, str(tmp_path)) == idx
    assert os.path.getmtime(idx) == mtime  # second call reused, not rebuilt

    # corpus regenerated (mtime/size change) -> a DIFFERENT index path,
    # so stale signatures can never serve a new corpus
    time.sleep(1.1)
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    assert incremental_index_dir(str(tmp_path)) != idx


def test_canonicalize_randomized_urls(spark):
    """Property sweep over 400 randomized messy URLs (seeded): the
    canonical form is idempotent, tracking-free, fragment-free, and
    starts with lowercase scheme://lowercase host — beyond the shapes
    synth_url emits."""
    import random

    from pyspark.sql import functions as F

    from slowfast_feature_extractor_spark.functions import urltools as UT

    rng = random.Random(20260817)
    schemes = ["http", "HTTP", "https", "HtTpS"]
    hosts = ["Ex.COM", "www.ex.com", "WWW.a.B.example.ORG", "x-y.net", "ex.com"]
    ports = ["", ":80", ":443", ":8080", ":8443"]
    paths = ["", "/", "/A/b", "/A/b/", "/p//", "/%7Euser/x"]
    params = ["id=9", "b=2", "utm_source=a", "utm_campaign=x", "ref=rss",
              "gclid=1", "fbclid=2", "q=a+b", "z="]
    frags = ["", "#f", "#sec-2"]
    urls = []
    for _ in range(400):
        q = "&".join(rng.sample(params, rng.randint(0, 4)))
        urls.append(
            rng.choice(schemes) + "://" + rng.choice(hosts) + rng.choice(ports)
            + rng.choice(paths) + (("?" + q) if q else "") + rng.choice(frags)
        )
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = df.select(
        "url",
        UT.canonicalize_url(F.col("url")).alias("c1"),
    ).select(
        "url", "c1", UT.canonicalize_url(F.col("c1")).alias("c2")
    ).collect()
    for r in got:
        c = r["c1"]
        assert c == r["c2"], f"not idempotent: {r['url']} -> {c} -> {r['c2']}"
        assert c.startswith(("http://", "https://")), (r["url"], c)
        assert "#" not in c, (r["url"], c)
        for t in ("utm_", "ref=", "gclid=", "fbclid="):
            assert ("?" + t) not in c and ("&" + t) not in c, (r["url"], c)
        host = c.split("://", 1)[1].split("/", 1)[0].split(":", 1)[0]
        assert host == host.lower() and not host.startswith("www."), (r["url"], c)
        hostport = c.split("://", 1)[1].split("/", 1)[0]
        port = hostport.split(":", 1)[1] if ":" in hostport else ""
        if c.startswith("http://"):
            assert port != "80", (r["url"], c)
        if c.startswith("https://"):
            assert port != "443", (r["url"], c)


def test_sequence_pack_edge_corpus_parity(spark, tmp_path):
    """Oracle parity on a corpus the fixtures don't cover: empty docs
    (0 tokens), single-word docs, and a doc far larger than the
    512-token budget (spans many sequences)."""
    import pandas as pd

    from slowfast_feature_extractor_spark.plans.compare import compare
    from slowfast_feature_extractor_spark.plans.queries import REGISTRY

    docs = pd.DataFrame(
        {
            "doc_id": list(range(8)),
            "text": [
                "",                        # 0 tokens
                "one",                     # 1 token
                " ",                       # whitespace only -> 0 tokens
                "a b c",                  
                "w " * 2000,               # 2000 tokens: spans ~4 sequences
                "x y",
                "",                        # another empty
                "z " * 600,                # straddles a boundary
            ],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    fn, sql = REGISTRY["sequence_pack"]
    ok, msg = compare(spark, str(tmp_path), fn, sql)
    assert ok, msg
    rows = fn(spark, str(tmp_path)).collect()
    total = sum(r["n_tokens"] for r in rows)
    assert total == 0 + 1 + 0 + 3 + 2000 + 2 + 0 + 600
    big = next(r for r in rows if r["n_tokens"] == 2000)
    assert big["seq_end"] - big["seq_start"] >= 3  # spans many chunks


def test_dsir_score_prefers_target_like_docs(spark, tmp_path):
    import pandas as pd

    from slowfast_feature_extractor_spark.plans.queries import q_dsir_score

    # doc_id % 10 < 2 -> target corpus (quantum physics); the rest raw
    # (spam). Held-out docs 15 (target-like) and 16 (raw-like) must
    # rank by their resemblance to the target LM.
    tgt = "quantum field theory entangles spin states in hilbert space"
    raw = "buy cheap pills now click here free offer winner prize"
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 10, 11, 2, 3, 15, 16],
            "text": [tgt, tgt, tgt, tgt, raw, raw,
                     "quantum spin states in hilbert space",
                     "cheap pills free offer click"],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    got = {r["doc_id"]: r["dsir_logratio"] for r in q_dsir_score(spark, str(tmp_path)).collect()}
    assert got[15] > 0 > got[16]
    assert len(got) == 8


def test_dsir_score_handles_empty_and_single_token_docs(spark, tmp_path):
    import pandas as pd

    from slowfast_feature_extractor_spark.plans.queries import q_dsir_score

    docs = pd.DataFrame(
        {
            "doc_id": [0, 10, 11, 12],
            "text": ["alpha beta", "alpha", "", "   "],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    rows = {r["doc_id"]: r for r in q_dsir_score(spark, str(tmp_path)).collect()}
    # zero-token docs produce no features and drop out (both engines agree)
    assert set(rows) == {0, 10}
    assert rows[0]["n_feats"] == 3  # 2 unigrams + 1 bigram
    assert rows[10]["n_feats"] == 1


def test_link_graph_edge_mass_matches_outdegree_rule(spark):
    from pyspark.sql import functions as F

    from slowfast_feature_extractor_spark.plans.queries import q_link_graph, _docs

    sf = "/root/testdata/sf0.001"
    got = q_link_graph(spark, sf).agg(F.sum("n_links")).collect()[0][0]
    want = (
        _docs(spark, sf)
        .select((1 + F.col("doc_id") % 3).alias("d"))
        .agg(F.sum("d"))
        .collect()[0][0]
    )
    # every synthesized anchor is recovered by the regex, none invented
    assert got == want
