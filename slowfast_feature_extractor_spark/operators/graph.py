"""Pointer-jumping resolution over functional graphs (list ranking).

A crawl's redirect map (url -> target) is a functional graph: every
node has at most one successor. Resolving each url to its final
destination — the canonical id Common-Crawl-style pipelines dedup and
index on — is list ranking. The naive follow loop is O(L) sequential
joins for chain length L; pointer doubling (Wyllie's classic PRAM
list-ranking trick) halves every remaining chain per round, so
ceil(log2(L)) shuffle rounds total. Browsers and polite crawlers cap
redirect chains at ~20 hops, so 5 rounds cover the real web; each
round is one int64-keyed self-equi-join whose shuffle volume is
exactly |nodes| rows — no driver data movement, no collect; rounds
are materialized with localCheckpoint to keep lineage linear (see
resolve_pointers).

Reference analog: none (the reference is a single-machine video
pipeline); this is a training-data/crawl extension, same family as
url_frontier / crawl_schedule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_pointers(
    mapping: DataFrame,
    id_col: str = "id",
    nxt_col: str = "nxt",
    rounds: int = 5,
) -> DataFrame:
    """Resolve every node of a functional graph to its terminal.

    ``mapping`` holds one row per node: ``id_col`` the node id,
    ``nxt_col`` its successor — TERMINAL nodes must self-loop
    (``nxt == id``), which also makes the per-round inner join total.
    The map must be closed (every ``nxt`` value appears as an ``id``);
    a dangling successor silently drops its chain, so callers
    canonicalise first.

    Returns ``(id_col, final, hops)``: the node reached after at most
    ``2**rounds`` steps (the true terminal when every chain is that
    short) and the exact hop count to it. Terminals report
    ``(id, id, 0)``.

    Each round joins the pointer table WITH ITSELF, so the round's
    result MUST be materialized (``localCheckpoint``, the
    dedup_clusters_star discipline): left lazy, the two self-join
    sides are different-keyed exchanges Catalyst cannot reuse and the
    plan tree doubles per round — 2^rounds scans of the mapping
    instead of ``rounds``. The checkpoint keeps lineage linear: one
    |nodes|-row shuffle per round.
    """
    p = mapping.select(
        F.col(id_col).alias("src"),
        F.col(nxt_col).alias("cur"),
        F.when(F.col(nxt_col) == F.col(id_col), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("hops"),
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        # jump: every node now points at its 2x-th successor; a node
        # already at the terminal composes with the self-loop (d+0)
        q = p.select(
            F.col("src").alias("j_id"),
            F.col("cur").alias("j_cur"),
            F.col("hops").alias("j_hops"),
        )
        p = (
            p.join(q, p["cur"] == q["j_id"])
            .select(
                "src",
                F.col("j_cur").alias("cur"),
                (F.col("hops") + F.col("j_hops")).alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
    return p.select(
        F.col("src").alias(id_col), F.col("cur").alias("final"), "hops"
    )
