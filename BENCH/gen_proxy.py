#!/usr/bin/env python
"""Generate a ~sf1.0-scale PROXY fixture for timing A/Bs (guide §1).

The driver deletes its generated /root/testdata/sf1.0 after measuring, so
optimization sessions need a stand-in at the same scale. This replicates
the sf0.1 fixture 10x with key offsets (events/lineitem/orders/customer/
part/supplier: ids shifted per replica so join fan-outs stay realistic;
users x10 keeps sessions-per-user constant, matching the observed
sf0.01->sf0.1 scaling), regenerates documents from the observed 31-word
vocab with the observed length distribution (verbatim replication would
create 10-deep exact-dup clusters the real generator does not produce),
and jitters embedding replicas so similarity structure is preserved
without degenerate exact duplicates (8000 rows: the observed x4/decade
rule). Row-group sizing matters for scan parallelism fidelity: every
observed fixture file is ONE row group because pyarrow's default
(~1 Mi rows/group) exceeds the sf0.1 row counts, so the replicated
tables here use the same DEFAULT sizing — events (1M rows) stays one
group like the driver's sf1.0, while lineitem (6M rows) gets ~6 groups
exactly as the driver's generator would produce.

Timing-only: oracle correctness is still gated on the real sf0.001/0.01
fixtures. Deterministic (fixed seed).
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/bench_fixtures/sf1_proxy"
REPS = 10


def write(name, table):
    # pyarrow default row-group sizing (~1 Mi rows/group): matches what
    # the driver's generator produces at every observed scale factor.
    pq.write_table(table, os.path.join(DST, f"{name}.parquet"))
    print(name, table.num_rows, flush=True)


def replicate(name, offsets):
    """Concat REPS copies, adding replica*span to each listed int column."""
    t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
    cols = {c: t[c].to_numpy(zero_copy_only=False) for c in t.schema.names}
    spans = {c: int(cols[c].max()) + 1 for c in offsets}
    out = {}
    for c in t.schema.names:
        parts = []
        for r in range(REPS):
            v = cols[c]
            if c in offsets:
                v = v + r * spans[c]
            parts.append(v)
        out[c] = np.concatenate(parts)
    arrays, fields = [], []
    for f in t.schema:
        arr = pa.array(out[f.name], type=None)
        arrays.append(arr.cast(f.type) if arr.type != f.type else arr)
        fields.append(f.name)
    write(name, pa.table(dict(zip(fields, arrays))))


def main():
    os.makedirs(DST, exist_ok=True)
    rng = np.random.default_rng(7)

    # documents: regenerate 50k from observed vocab + length distribution
    d = pq.read_table(os.path.join(SRC, "documents.parquet")).to_pandas()
    vocab = sorted({w for s in d["text"] for w in s.split()})
    langs = d["lang"].value_counts(normalize=True)
    n = len(d) * REPS
    wc = rng.integers(10, 101, size=n)
    texts = [" ".join(rng.choice(vocab, size=k)) for k in wc]
    doc = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                rng.choice(langs.index.to_numpy(), size=n, p=langs.to_numpy()),
                pa.string(),
            ),
            "source": pa.array([f"src{i % 5}" for i in range(n)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    write("documents", doc)

    # embeddings: observed x4 per decade -> 8000 rows, jittered replicas
    e = pq.read_table(os.path.join(SRC, "embeddings.parquet")).to_pandas()
    dim = len(e["embedding"].iloc[0])
    base = np.vstack(e["embedding"].to_numpy()).astype(np.float32)
    reps = 4
    mats = [base + (rng.normal(0, 0.01, base.shape).astype(np.float32) if r else 0)
            for r in range(reps)]
    emb = np.vstack(mats)
    lab = np.tile(e["label"].to_numpy(), reps)
    write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(emb)), pa.int64()),
                "embedding": pa.array(list(emb), pa.list_(pa.float32())),
                "label": pa.array(lab, pa.int32()),
            }
        ),
    )

    # events: x10, fresh event_ids, users x10 (sessions/user constant)
    replicate("events", ["event_id", "user_id"])
    # TPC-H-ish relational tables: x10 with consistent key offsets
    replicate("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])
    replicate("orders", [c for c in ("o_orderkey", "o_custkey")])
    replicate("customer", ["c_custkey"])
    replicate("part", ["p_partkey"])
    replicate("supplier", ["s_suppkey"])
    for small in ("nation", "region"):
        write(small, pq.read_table(os.path.join(SRC, f"{small}.parquet")))
    print("done ->", DST)


if __name__ == "__main__":
    main()
