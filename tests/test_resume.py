"""Exact-resume semantics (SURVEY.md §5 test #5): kill after k buckets,
resume, outputs equal an uninterrupted run; completed work never
re-runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from slowfast_feature_extractor_spark.operators.resume import (
    ledger_read,
    read_output,
    run_with_checkpoint,
)
from slowfast_feature_extractor_spark.plans.featurize import salted_buckets


def _inputs(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    return salted_buckets(ev, key="user_id", buckets=8)


def _compute(part):
    return part.groupBy("bucket", "user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
    )


def _rows(spark, out_dir):
    return sorted(
        (r["bucket"], r["user_id"], r["n"], round(r["s"], 6))
        for r in read_output(spark, out_dir).collect()
    )


def test_kill_and_resume_byte_equal(spark, tmp_path):
    df = _inputs(spark)
    full_out, full_led = str(tmp_path / "full"), str(tmp_path / "full_led")
    n_buckets = df.select("bucket").distinct().count()
    r = run_with_checkpoint(df, full_out, full_led, compute_fn=_compute)
    assert len(r["processed"]) == n_buckets and not r["skipped"]

    # interrupted run: only 3 buckets, then "killed"
    part_out, part_led = str(tmp_path / "part"), str(tmp_path / "part_led")
    r1 = run_with_checkpoint(df, part_out, part_led, compute_fn=_compute, max_buckets=3)
    assert len(r1["processed"]) == 3
    # resume: finishes the rest, re-processes nothing committed
    r2 = run_with_checkpoint(df, part_out, part_led, compute_fn=_compute)
    assert sorted(r1["processed"] + r2["processed"]) == r["processed"]
    assert r2["skipped"] == r1["processed"]
    assert _rows(spark, part_out) == _rows(spark, full_out)


def test_declared_buckets_skip_distinct_scan(spark, tmp_path):
    """VERDICT r5 #8: with the bucketing scheme declared (bucket =
    hash(entity) % B), the bucket list is range(B) — enumerated with
    ZERO Spark jobs instead of a full-data distinct shuffle — and the
    run is byte-equal to the discovered-bucket path, including exact
    kill/resume."""
    from slowfast_feature_extractor_spark.operators.resume import _bucket_ids

    df = _inputs(spark)

    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    assert _bucket_ids(df, "bucket", 8) == list(range(8))
    assert tracker.getJobIdsForGroup(None) == before  # no distinct job

    # discovered vs declared: identical outputs and ledgers
    disc_out, disc_led = str(tmp_path / "disc"), str(tmp_path / "disc_led")
    run_with_checkpoint(df, disc_out, disc_led, compute_fn=_compute)
    decl_out, decl_led = str(tmp_path / "decl"), str(tmp_path / "decl_led")
    r1 = run_with_checkpoint(
        df, decl_out, decl_led, compute_fn=_compute, max_buckets=3, n_buckets=8
    )
    r2 = run_with_checkpoint(
        df, decl_out, decl_led, compute_fn=_compute, n_buckets=8
    )
    assert len(r1["processed"]) == 3 and r2["skipped"] == r1["processed"]
    assert _rows(spark, decl_out) == _rows(spark, disc_out)
    led_a = {b: rec["n_rows"] for b, rec in ledger_read(disc_led).items()}
    led_b = {b: rec["n_rows"] for b, rec in ledger_read(decl_led).items()}
    # discovery only sees buckets with rows; the declared path also
    # commits zero-row records for declared-but-empty buckets (so the
    # batch converges without rescanning them on resume)
    assert {b: n for b, n in led_b.items() if n} == led_a
    assert all(n == 0 for b, n in led_b.items() if b not in led_a)
    assert set(led_b) == set(range(8))


def test_completed_run_is_noop(spark, tmp_path):
    df = _inputs(spark)
    out, led = str(tmp_path / "o"), str(tmp_path / "l")
    run_with_checkpoint(df, out, led, compute_fn=_compute)
    r = run_with_checkpoint(df, out, led, compute_fn=_compute)
    assert not r["processed"]
    assert len(r["skipped"]) == df.select("bucket").distinct().count()


def test_ledger_metrics(spark, tmp_path):
    df = _inputs(spark)
    out, led = str(tmp_path / "o"), str(tmp_path / "l")
    run_with_checkpoint(df, out, led, compute_fn=_compute, batch_id="b7")
    recs = ledger_read(led)
    assert set(recs) == {r[0] for r in df.select("bucket").distinct().collect()}
    total = sum(rec["n_rows"] for rec in recs.values())
    assert total == read_output(spark, out).count()
    assert all(rec["batch_id"] == "b7" and rec["wall_ms"] >= 0 for rec in recs.values())


def test_iceberg_path_is_flag_gated(spark, tmp_path):
    """The Iceberg sink/resume variant is real code behind the catalog
    flag (VERDICT r2 item 7): the detector reports absence in this
    sandbox, the writer chain (hidden days/bucket partitioning)
    constructs, and the snapshot-ledger runner refuses loudly instead
    of silently writing parquet."""
    import pytest
    from pyspark.sql import functions as F

    from slowfast_feature_extractor_spark.operators.resume import (
        run_with_checkpoint_iceberg,
    )
    from slowfast_feature_extractor_spark.sources.sinks import (
        feature_table_writer,
        iceberg_available,
    )

    assert iceberg_available(spark) is False  # no Iceberg jar in sandbox

    df = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00", 0)],
        "url string, warc_ts string, bucket int",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    # the V2 writer chain with hidden partition transforms builds fine
    # without a catalog — only the commit verb needs Iceberg
    w = feature_table_writer(df, "icecat.db.features")
    assert w is not None

    with pytest.raises(RuntimeError, match="not Iceberg-backed"):
        run_with_checkpoint_iceberg(df, "icecat.db.features", str(tmp_path / "ledger"))


def test_string_numeric_bucket_ids_count_correctly(spark, tmp_path):
    """Partition-column type inference turns a string bucket id '7'
    into int 7 on read-back; the ledger must still record real row
    counts (it silently recorded 0 before the inference-disabled
    read)."""
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .limit(200)
        .withColumn("bucket", (F.col("user_id") % 3).cast("string"))
    )
    res = run_with_checkpoint(
        ev, str(tmp_path / "out"), str(tmp_path / "ledger"), bucket_col="bucket"
    )
    assert res["rows"] == 200
    led = ledger_read(str(tmp_path / "ledger"))
    assert set(led) == {"0", "1", "2"}
    total = sum(
        r["n_rows"]
        for r in spark.read.json(str(tmp_path / "ledger")).collect()
    )
    assert total == 200


def test_zero_row_compute_fn_converges(spark, tmp_path):
    """A compute_fn that filters out every row writes no files; the
    ledger must still commit (n_rows=0) so the batch converges instead
    of recomputing the same buckets forever."""
    ev = _inputs(spark)
    res = run_with_checkpoint(
        ev,
        str(tmp_path / "out"),
        str(tmp_path / "ledger"),
        compute_fn=lambda part: part.filter(F.lit(False)),
    )
    n_buckets = ev.select("bucket").distinct().count()
    assert res["rows"] == 0 and len(res["processed"]) == n_buckets
    # second run: everything skipped, nothing recomputed
    res2 = run_with_checkpoint(
        ev,
        str(tmp_path / "out"),
        str(tmp_path / "ledger"),
        compute_fn=lambda part: part.filter(F.lit(False)),
    )
    assert res2["processed"] == [] and len(res2["skipped"]) == n_buckets


def test_null_bucket_ids_rejected(spark, tmp_path):
    """NULL bucket ids fail loudly on BOTH paths instead of crashing
    (discovery: sorted() over None) or silently dropping rows
    (declared: isin never matches NULL)."""
    import pytest

    df = spark.createDataFrame(
        [(0, 1.0), (None, 2.0), (1, 3.0)], "bucket int, v double"
    )
    with pytest.raises(ValueError, match="NULL"):
        run_with_checkpoint(
            df, str(tmp_path / "out_a"), str(tmp_path / "led_a")
        )
    with pytest.raises(ValueError, match="NULL"):
        run_with_checkpoint(
            df, str(tmp_path / "out_b"), str(tmp_path / "led_b"), n_buckets=2
        )
