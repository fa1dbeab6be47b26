"""resolve_pointers (operators/graph.py) — list ranking by pointer
doubling, cross-checked against a pure-Python chain walk."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from slowfast_feature_extractor_spark.operators.graph import resolve_pointers


def _walk(nxt: dict[int, int], x: int) -> tuple[int, int]:
    d = 0
    while nxt[x] != x:
        x = nxt[x]
        d += 1
    return x, d


def _as_df(spark, nxt: dict[int, int]):
    return spark.createDataFrame(
        [(k, v) for k, v in sorted(nxt.items())], "id long, nxt long"
    )


def test_chains_resolve_exactly(spark):
    # three chains of very different lengths + isolated terminals
    nxt = {0: 0, 100: 100, 7: 0}
    for i in range(1, 7):
        nxt[i] = i - 1
    for i in range(101, 113):
        nxt[i] = i - 1
    out = {
        r["id"]: (r["final"], r["hops"])
        for r in resolve_pointers(_as_df(spark, nxt), rounds=4).collect()
    }
    assert set(out) == set(nxt)
    for x in nxt:
        assert out[x] == _walk(nxt, x), x


def test_random_forest_of_chains(spark):
    rng = random.Random(7)
    nxt: dict[int, int] = {}
    nodes = list(range(400))
    rng.shuffle(nodes)
    # successive prefixes become chains; every 17th node is a root
    prev = None
    for i, n in enumerate(nodes):
        if i % 17 == 0 or prev is None:
            nxt[n] = n
        else:
            nxt[n] = prev
        prev = n
    out = {
        r["id"]: (r["final"], r["hops"])
        for r in resolve_pointers(_as_df(spark, nxt), rounds=5).collect()
    }
    for x in nxt:
        assert out[x] == _walk(nxt, x), x


def test_rounds_bound_truncates_long_chain(spark):
    # one chain of length 40: rounds=3 reaches only the 2^3=8th hop
    nxt = {0: 0}
    for i in range(1, 41):
        nxt[i] = i - 1
    out = {
        r["id"]: (r["final"], r["hops"])
        for r in resolve_pointers(_as_df(spark, nxt), rounds=3).collect()
    }
    assert out[40] == (32, 8)  # frozen 8 hops in, NOT at the terminal
    assert out[8] == (0, 8)  # chains <= 2^rounds fully resolve
    # and rounds=6 (2^6=64 >= 40) resolves everything
    full = {
        r["id"]: (r["final"], r["hops"])
        for r in resolve_pointers(_as_df(spark, nxt), rounds=6).collect()
    }
    assert full[40] == (0, 40)


def test_linear_lineage_per_round(spark):
    # each round is checkpointed, so the FINAL plan is a scan of the
    # materialized last round — NOT the 2^rounds-join tree the lazy
    # self-join would build (15 joins at rounds=4)
    nxt = {i: max(i - 1, 0) for i in range(10)}
    df = resolve_pointers(_as_df(spark, nxt), rounds=4)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") == 0, plan
    assert "LogicalRDD" in plan


def test_cycle_freezes_at_rounds_bound(spark):
    """A redirect LOOP (a->b->c->a) must not hang or error: pointer
    doubling walks exactly 2^rounds steps and reports that position —
    deterministic, bounded, and flaggable downstream via hops ==
    2^rounds (a chain that long is otherwise impossible when the
    caller sizes rounds to the redirect cap)."""
    nxt = {0: 1, 1: 2, 2: 0, 9: 9}
    out = {
        r["id"]: (r["final"], r["hops"])
        for r in resolve_pointers(_as_df(spark, nxt), rounds=4).collect()
    }
    assert out[9] == (9, 0)
    for x in (0, 1, 2):
        final, hops = out[x]
        assert hops == 16  # froze at 2^rounds, did not loop forever
        assert final == (x + 16) % 3
