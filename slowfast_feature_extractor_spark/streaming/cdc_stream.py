"""Streaming CDC upsert: apply a change stream to a versioned state table.

The ingestion half of the table-maintenance story (operators/maintenance.py):
a Structured Streaming ``foreachBatch`` loop that folds each micro-batch of
change rows into the current table state with :func:`~slowfast_feature_extractor_spark.operators.maintenance.cdc_merge`
— MERGE INTO as one co-partitioned full-outer join per batch — and commits
the result as a new immutable state VERSION (``v{batch_id}`` parquet dir).

Versioned commits, not in-place overwrite, for two reasons that both
survive the move to a real Iceberg catalog:

- A parquet dir cannot be overwritten while it is being read by the same
  job; an immutable-new-snapshot write never conflicts.
- ``foreachBatch`` may REPLAY a batch after a crash; rewriting the same
  ``v{batch_id}`` dir from the same input is idempotent, exactly the
  snapshot-id-based idempotent-commit contract of an Iceberg writer.

State cost per batch: |changes| shuffled once on the key (latest-per-key
compaction) + one join against the current state. With both sides bucketed
by key on disk (the ``bucketed_join`` registry row's layout) the join is
zero-shuffle; at 10^12 base rows the rewrite is bounded by touched
partitions, not table size (the merge-on-read variant keeps only the
change deltas per version and compacts on a schedule — ``compaction_plan``).

Reference analog: the reference resumes by re-running whole videos whose
output dir is missing (tamimahm/slowfast_feature_extractor
just_test_v1.py:94-117); a streaming engine instead folds each new batch
into committed state.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from slowfast_feature_extractor_spark.operators.maintenance import cdc_merge

__all__ = [
    "apply_cdc_stream",
    "latest_state_version",
    "read_state",
    "expire_versions",
]

_V_RE = re.compile(r"^v(\d+)$")


def latest_state_version(
    state_dir: str, before: int | None = None
) -> int | None:
    """Highest committed version id under ``state_dir`` (optionally
    strictly below ``before``), or None."""
    if not os.path.isdir(state_dir):
        return None
    vs = [
        int(m.group(1))
        for m in (_V_RE.match(d) for d in os.listdir(state_dir))
        if m and (before is None or int(m.group(1)) < before)
    ]
    return max(vs) if vs else None


def read_state(
    spark: SparkSession, state_dir: str, before: int | None = None
) -> DataFrame | None:
    """The current table state (latest committed version)."""
    v = latest_state_version(state_dir, before)
    if v is None:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"v{v}"))


def expire_versions(state_dir: str, keep_last: int) -> list[int]:
    """Retention: drop all but the newest ``keep_last`` committed
    versions (Iceberg ``expire_snapshots``). ``keep_last >= 2`` is
    enforced: crash-replay of batch N folds into the version BELOW
    v{N} (see ``_fold``), so if the newest version's checkpoint had not
    committed when the job died, its PREDECESSOR is the one replay
    reads — expiring it would silently collapse state to the replayed
    batch's keys. Returns the expired ids.

    At real table scale expiry also means deleting data files no live
    snapshot references; here a version directory IS its file set, so
    removing the directory is exactly that orphan-file sweep.
    """
    if keep_last < 2:
        raise ValueError(
            "keep_last must be >= 2: the newest version may be an "
            "uncheckpointed commit whose crash-replay folds into its "
            "predecessor"
        )
    import shutil

    if not os.path.isdir(state_dir):
        return []
    vs = sorted(
        int(m.group(1))
        for m in (_V_RE.match(d) for d in os.listdir(state_dir))
        if m
    )
    expired = vs[:-keep_last]
    for v in expired:
        shutil.rmtree(os.path.join(state_dir, f"v{v}"))
    return expired


def apply_cdc_stream(
    changes_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    order_cols: list[str],
    value_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
):
    """Run the change stream to completion (availableNow), folding each
    micro-batch into the versioned state table. Returns after the last
    batch commits; read the result with :func:`read_state`.

    Each batch: state ← merge(state, batch) with deleted keys dropped
    (the writer side of ``cdc_merge``'s retained-tombstone contract).
    """
    spark = changes_stream.sparkSession

    def _fold(batch: DataFrame, batch_id: int) -> None:
        # read strictly-below-batch_id so a crash-replay of batch N folds
        # into the same predecessor state it saw the first time
        state = read_state(spark, state_dir, before=batch_id)
        if state is None:
            state = batch.select(*key_cols, *value_cols).limit(0)
        merged = cdc_merge(
            state, batch, key_cols, order_cols, op_col=op_col,
            delete_op=delete_op,
        )
        out = merged.filter("action <> 'delete'").select(*key_cols, *value_cols)
        out.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{batch_id}")
        )

    q = (
        changes_stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
