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


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {
        name: spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        for name in TABLE_NAMES
    }


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
