"""Loaders for the driver-provided parquet tables (TESTDATA.md).

Plain ``spark.read.parquet`` — Catalyst handles column pruning and
predicate pushdown into the parquet scan. On a production deployment
these become Iceberg catalog reads (``spark.read.table``) with identical
downstream plans; the engine never assumes anything about the source
beyond the schema.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def parallelize_scan(df: DataFrame, factor: int = 1) -> DataFrame:
    """Guard against pathological single-split scans.

    At production scale inputs are thousands of parquet files and the
    scan parallelizes for free; the sandbox tables are single-file,
    single-row-group parquet, which Spark cannot split — every map-only
    stage after such a scan would run in ONE task no matter how many
    cores exist. When (and only when) the scan has fewer partitions than
    the cluster's parallelism, round-robin repartition it. Stages that
    shuffle anyway (groupBy/window/join) should NOT use this — their
    exchange already redistributes.

    The partition probe via ``df.rdd`` forces an eager plan→RDD
    conversion, so it is gated behind a cheap file-count check: a scan
    with enough input files splits natively and returns untouched —
    production multi-file tables never pay the RDD conversion."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    threshold = max(2, target // 2)
    try:
        if len(df.inputFiles()) >= threshold:
            return df
    except Exception:
        pass  # non-file source: fall through to the partition probe
    if df.rdd.getNumPartitions() < threshold:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {
        name: spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        for name in TABLE_NAMES
    }


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
