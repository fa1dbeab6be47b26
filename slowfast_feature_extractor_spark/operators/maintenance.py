"""Table-maintenance operators: CDC merge, SCD2 history, compaction planning.

The north star runs over Iceberg tables at 10^12 rows; these are the
relational kernels of keeping such a table healthy without an engine-side
MERGE: change-data-capture upserts/deletes applied as one co-partitioned
full-outer join, slowly-changing-dimension (type 2) interval construction
for point-in-time snapshots, and bin-packing small files into
target-sized compaction groups.

Scale shape (argued in SCALE.md):
- ``cdc_merge``: the change log is compacted to latest-per-key with ONE
  shuffle by key (map-side nothing to combine — row_number needs the full
  group), then full-outer-joined to the base on the same key. With an
  Iceberg bucket layout both sides arrive bucketed by key and the join is
  zero-shuffle (the ``bucketed_join`` registry row demonstrates the
  layout). Work ∝ |changes| + |touched base partitions|, never ∝ corpus².
- ``scd2_intervals``: one window per key (lead + row_number share a
  single sort). Snapshot-at-T is a filter — partition-prunable when the
  table is partitioned by valid_from date.
- ``compaction_plan``: one cumulative-sum window per table partition over
  file *metadata* (Iceberg manifest scale: ~10^6 rows per snapshot, not
  data scale), so the plan itself is a metadata query.

Reference analog: the reference's checkpoint/resume drops partial output
dirs and re-runs whole videos (tamimahm/slowfast_feature_extractor
just_test_v1.py:94-117); an Iceberg-native engine instead reconciles
state by key — these operators are that reconciliation, re-expressed as
declarative plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cdc_merge",
    "scd2_intervals",
    "scd2_snapshot",
    "compaction_plan",
    "zorder_key",
    "zorder_layout",
]


def _latest_per_key(
    df: DataFrame, key_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """Latest row per key by (order_cols) — deterministic: callers pass a
    unique tiebreaker as the last order column."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def cdc_merge(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a CDC change log to a base table: MERGE INTO as a plan.

    ``changes`` carries key columns, ordering columns (event time + a
    unique tiebreaker), an ``op_col`` ('D' = delete, anything else =
    upsert), and the new value columns. The log is compacted to the
    latest op per key, then reconciled with ``base`` by one full-outer
    join:

    - key only in changes, op=U  -> action 'insert', change values
    - key in both, op=U          -> action 'update', change values
    - key in both, op=D          -> action 'delete', NULL values
    - key only in changes, op=D  -> action 'delete' (no-op tombstone)
    - key only in base           -> action 'unchanged', base values

    Output: key columns + base's value columns + ``action``. Rows with
    action='delete' are RETAINED with NULL values so merge accounting is
    visible; a writer drops them (``.filter("action != 'delete'")``).

    Both sides shuffle once on the key; on a bucketed/Iceberg layout the
    exchange vanishes (see ``bucketed_join``).
    """
    value_cols = [c for c in base.columns if c not in key_cols]
    compact = _latest_per_key(changes, key_cols, order_cols)
    is_del = F.col(f"c.{op_col}") == delete_op

    # presence markers are null-safe even when a side's value columns are
    # themselves NULL
    bm = base.withColumn("__b", F.lit(1)).alias("b")
    c = compact.alias("c")
    j = bm.join(c, on=key_cols, how="full_outer")
    in_change = F.col(f"c.{op_col}").isNotNull()
    in_base = F.col("b.__b").isNotNull()

    action = (
        F.when(in_change & is_del, F.lit("delete"))
        .when(in_change & in_base, F.lit("update"))
        .when(in_change, F.lit("insert"))
        .otherwise(F.lit("unchanged"))
    )
    out_vals: list[Column] = []
    for v in value_cols:
        out_vals.append(
            F.when(in_change & is_del, F.lit(None))
            .when(in_change, F.col(f"c.{v}"))
            .otherwise(F.col(f"b.{v}"))
            .alias(v)
        )
    return j.select(*key_cols, *out_vals, action.alias("action"))


def scd2_intervals(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a change log.

    Each change row opens a version valid from its timestamp until the
    key's next change (NULL = still current). One window sort per key
    serves lead(), row_number() and the per-key version count.

    Output: key + value columns + valid_from, valid_to, version,
    n_versions.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak_col)
    wall = Window.partitionBy(*key_cols)
    return changes.select(
        *key_cols,
        *value_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.row_number().over(w).alias("version"),
        F.count(F.lit(1)).over(wall).alias("n_versions"),
    )


def scd2_snapshot(intervals: DataFrame, at_ts) -> DataFrame:
    """Point-in-time snapshot of an SCD2 history: rows effective at
    ``at_ts`` (valid_from <= T < valid_to, open intervals current).
    A filter — partition-prunable on a valid_from-partitioned layout."""
    t = F.lit(at_ts).cast("timestamp")
    return intervals.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )


def compaction_plan(
    files: DataFrame,
    part_cols: list[str],
    file_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Bin-pack files into target-sized compaction groups per partition.

    Deterministic sequential packing: files ordered by ``file_col``
    within each table partition; a file joins bin floor(bytes_before /
    target). Bins therefore fill to >= target before a new one opens
    (the Iceberg binpack strategy with a stable order). One cumulative
    window over manifest metadata — a metadata-scale query.

    Output per (partition, bin): n_files, bytes, first/last file id.
    """
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = files.withColumn(
        "bin_id",
        (F.coalesce(F.sum(size_col).over(w), F.lit(0)) / F.lit(target_bytes))
        .cast("bigint"),
    )
    return binned.groupBy(*part_cols, "bin_id").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(size_col).cast("bigint").alias("bytes"),
        F.min(file_col).alias("first_file"),
        F.max(file_col).alias("last_file"),
    )


def zorder_key(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton (Z-order) interleave of two ``bits``-bit non-negative int
    dimensions: z = …y₁x₁y₀x₀ with x in the odd bit positions. Pure
    JVM bit arithmetic — codegen-friendly, no UDF.

    Rows sorted by z are clustered in BOTH dimensions at once, which is
    what lets a min/max-pruning reader (Iceberg/parquet row groups) skip
    files for predicates on either column. The engine-side analog of
    Iceberg's ``rewrite_data_files(strategy => 'sort', sort_order =>
    'zorder(a, b)')``.
    """
    z = F.lit(0)
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i))
    return z


def zorder_key_sql(x: str, y: str, bits: int = 8) -> str:
    """The identical Morton interleave as ANSI SQL text (oracle replay)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i})")
    return " | ".join(terms)


def zorder_layout(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 8,
    rows_per_file_shift: int = 6,
) -> DataFrame:
    """Plan a Z-order file layout and report its pruning tightness.

    Assigns each row to file ``z >> rows_per_file_shift`` (contiguous
    z-ranges, i.e. what a sort-by-z write produces), then emits the
    per-file min/max of both dimensions — exactly the column stats a
    manifest stores and a scan prunes on. Tight spans (max-min small in
    both x and y) are the whole point of Z-order vs a single-column
    sort, where the second dimension's span per file is the full domain.

    One shuffle (the groupBy); at 10^12 rows this is the layout-planning
    pass of a table rewrite, map-side combined to file-count rows.
    """
    z = zorder_key(x, y, bits)
    return (
        df.select(x.alias("__x"), y.alias("__y"), z.alias("__z"))
        .groupBy(F.shiftright(F.col("__z"), rows_per_file_shift).alias("file_id"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__x").alias("min_x"),
            F.max("__x").alias("max_x"),
            F.min("__y").alias("min_y"),
            F.max("__y").alias("max_y"),
        )
    )
