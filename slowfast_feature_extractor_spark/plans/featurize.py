"""End-to-end feature plans.

``featurize_pages`` is the flagship pipeline over the ``pages`` table
(FIXTURES.md §1): scan → HTML→text extraction (Arrow UDF) → dual-rate
trailing windows → fixed-length resample → as-of fusion → features —
the Spark-first restatement of the reference's scan → decode → dual-rate
sample → forward → save loop (reference/test_net.py:314-421).

``pit_dual_rate_events`` is the same shape over the driver's ``events``
table (used by ``__spark_entry__.entry`` and the DuckDB correctness
gate).

Scale strategy (SURVEY.md §4): ONE ``repartitionByRange(entity, ts)`` +
in-partition sort feeds every window family (the analog of the reference
extracting low/mid/deep features from a single forward pass) — Spark
reuses the sort across window specs with identical partitioning/ordering,
so the whole temporal stage is a single Exchange. Embarrassingly-parallel
stages (extraction, per-row projections) run before that shuffle and can
be salted into buckets (``salted_buckets``) when hot entities skew the
scan; the as-of stage itself must stay entity-partitioned (salting would
break the time ordering within an entity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from slowfast_feature_extractor_spark.functions.extraction import extract_text_udf
from slowfast_feature_extractor_spark.functions.vector import resample_udf
from slowfast_feature_extractor_spark.operators.asof_join import asof_join
from slowfast_feature_extractor_spark.operators.sessionize import sessionize
from slowfast_feature_extractor_spark.operators.windows import (
    dual_rate_features,
    windowed_vector,
)


def salted_buckets(
    df: DataFrame, key: str = "url", buckets: int = 32, salt: int = 0, col: str = "bucket"
) -> DataFrame:
    """Deterministic salted bucket id for embarrassingly-parallel stages
    over skewed keys (hot urls). NOT for window/as-of stages — those need
    the whole entity in one partition."""
    return df.withColumn(
        col, F.pmod(F.xxhash64(F.col(key), F.lit(salt)), F.lit(buckets)).cast("int")
    )


def featurize_pages(
    pages: DataFrame,
    fast_rows: int = 32,
    slow_rows: int = 64,
    fast_len: int = 32,
    slow_len: int = 8,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → features(url, warc_ts,
    slow_vec, fast_vec, fused_vec, n_hist_rows, max_input_ts).

    - text: extracted from html via the Arrow UDF when null (byte-
      identical to the oracle extractor);
    - measure: extracted-text length (deterministic integer);
    - fast_vec: trailing ``fast_rows`` strictly-earlier measures,
      resampled to ``fast_len`` (the reference's dense pathway,
      reference/test_net.py:62-67);
    - slow_vec: computed only at coarse anchors (first snapshot of each
      (url, day)) over ``slow_rows`` history resampled to ``slow_len``
      (sparse pathway, reference/test_net.py:69-74), then attached to
      every row by the as-of join (pathway fusion,
      reference/test_net.py:144);
    - fused_vec: slow‖fast (order per reference/models/head_helper.py:19),
      zero-filled when no anchor history exists
      (reference/datasets/videoset.py:194-196);
    - zero leakage: both windows end at 1 PRECEDING and anchors satisfy
      anchor_ts <= warc_ts, so every contributing row is strictly
      earlier; ``max_input_ts`` carries the audit bound.
    """
    df = pages.withColumn(
        "text",
        F.coalesce(F.col("text"), extract_text_udf(F.col("html"))),
    ).select("url", "warc_ts", "text")
    if shuffle_partitions:
        df = df.repartitionByRange(shuffle_partitions, "url", "warc_ts")
    df = df.withColumn("measure", F.length("text").cast("double"))

    fast = windowed_vector(
        df, "url", "warc_ts", "measure", rows=fast_rows, strict=True, out_col="fast_raw"
    )
    fast = fast.withColumn("fast_vec", resample_udf(fast_len)(F.col("fast_raw")))

    day_w = Window.partitionBy("url", F.to_date("warc_ts")).orderBy("warc_ts")
    anchors = (
        df.withColumn("__rn", F.row_number().over(day_w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    anchors = windowed_vector(
        # slow history must come from ALL rows, so recompute the window on
        # df and semi-join down to anchor rows.
        df, "url", "warc_ts", "measure", rows=slow_rows, strict=True, out_col="slow_raw"
    ).join(anchors.select("url", "warc_ts"), ["url", "warc_ts"], "left_semi")
    anchors = anchors.withColumn("slow_vec", resample_udf(slow_len)(F.col("slow_raw"))).select(
        "url", "warc_ts", "slow_vec"
    )

    hist_w = (
        Window.partitionBy("url").orderBy("warc_ts").rowsBetween(Window.unboundedPreceding, -1)
    )
    base = (
        fast.withColumn("n_hist_rows", F.count(F.lit(1)).over(hist_w))
        .withColumn("max_input_ts", F.max("warc_ts").over(hist_w))
        .select("url", "warc_ts", "fast_vec", "n_hist_rows", "max_input_ts")
    )

    fused = asof_join(
        base,
        anchors,
        on="warc_ts",
        by=("url",),
        right_cols=["slow_vec"],
        allow_exact_matches=True,
        matched_ts_col="anchor_ts",
    )
    zeros = F.array_repeat(F.lit(0.0), slow_len)
    return fused.select(
        "url",
        "warc_ts",
        F.coalesce("slow_vec", zeros).alias("slow_vec"),
        "fast_vec",
        F.concat(F.coalesce("slow_vec", zeros), "fast_vec").alias("fused_vec"),
        "n_hist_rows",
        "max_input_ts",
    )


def pit_dual_rate_events(
    spark: SparkSession,
    sf_dir: str,
    fast_rows: int = 8,
    slow_rows: int = 64,
    session_gap_s: float = 1800.0,
) -> DataFrame:
    """Flagship query on the driver's ``events`` table: for every
    'click', the point-in-time feature row — fast stats over its own
    strictly-earlier history, slow stats as-of the latest 'view'
    snapshot, plus the session index. Exact-arithmetic (cents) so the
    DuckDB oracle hashes identically."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "value_cents", F.round(F.col("value") * 100).cast("long")
    )
    ev = sessionize(ev, entity="user_id", ts="ts", gap_seconds=session_gap_s)

    fast = dual_rate_features(
        ev,
        entity="user_id",
        ts="ts",
        measure="value_cents",
        fast_rows=fast_rows,
        slow_rows=slow_rows,
        strict=True,
    )

    views = ev.filter(F.col("event_type") == "view")
    vw = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(-slow_rows, -1)  # up to slow_rows strictly-earlier views
    )
    view_feats = views.select(
        "user_id",
        "ts",
        F.avg("value_cents").over(vw).alias("slow_view_avg"),
        F.count("value_cents").over(vw).alias("slow_view_cnt"),
    )

    clicks = fast.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        "event_id",
        "session_idx",
        F.round("fast_avg", 6).alias("fast_avg"),
        F.col("fast_cnt"),
        F.round("slow_avg", 6).alias("slow_avg"),
        F.col("slow_cnt"),
    )
    out = asof_join(
        clicks,
        view_feats,
        on="ts",
        by=("user_id",),
        right_cols=["slow_view_avg", "slow_view_cnt"],
        allow_exact_matches=True,
        matched_ts_col="view_ts",
    )
    return out.select(
        "user_id",
        "ts",
        "event_id",
        "session_idx",
        "fast_avg",
        "fast_cnt",
        "slow_avg",
        "slow_cnt",
        "view_ts",
        F.round("slow_view_avg", 6).alias("slow_view_avg"),
        "slow_view_cnt",
    )
