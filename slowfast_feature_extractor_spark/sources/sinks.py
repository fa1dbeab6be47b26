"""Feature-table sinks with the physical layout SURVEY.md §4 prescribes
for the 10^12-row target: partitioned by day(warc_ts) + bucketed by url
hash, so (a) time-range queries prune partitions at the scan and (b)
entity-keyed reads touch one bucket. On Iceberg this is
``PARTITIONED BY (days(warc_ts), bucket(N, url))`` with snapshot-atomic
commits; on plain parquet (sandbox) it is directory partitioning —
identical downstream plans either way."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_features(
    df: DataFrame,
    path: str,
    ts_col: str = "warc_ts",
    entity_col: str = "url",
    buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write partitioned by (day, url-hash bucket)."""
    (
        df.withColumn("day", F.to_date(F.col(ts_col)))
        .withColumn(
            "bucket", F.pmod(F.xxhash64(F.col(entity_col)), F.lit(buckets)).cast("int")
        )
        .write.mode(mode)
        .partitionBy("day", "bucket")
        .parquet(path)
    )


def read_features(
    spark: SparkSession,
    path: str,
    start_day: str | None = None,
    end_day: str | None = None,
) -> DataFrame:
    """Read back; day predicates prune partition directories (check
    `.explain` → PartitionFilters)."""
    df = spark.read.parquet(path)
    if start_day:
        df = df.filter(F.col("day") >= start_day)
    if end_day:
        df = df.filter(F.col("day") < end_day)
    return df
