"""Spark-native synthetic generators for throughput benchmarking.

The pandas fixture generator (sources/pages.py) is the *correctness*
fixture: byte-exact HTML edge cases, but driver-side and slow beyond
~100k rows. These generators build arbitrarily large deterministic
inputs IN Spark (pure column expressions over ``spark.range`` — no
Python, no driver data), so the scaling benches measure the engine, not
the generator. Determinism: everything derives from xxhash64 of the row
id — same args ⇒ same table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_WORDS = (
    "web crawl page snapshot feature window session entity timestamp "
    "extract token vector slow fast fused history revisit content"
).split()


def _word(expr) -> F.Column:
    """Deterministic word pick by integer expression. A numeric suffix
    widens the effective vocabulary to ~18k so shingle/LSH workloads see
    web-like diversity (a tiny vocab makes every LSH bucket collide and
    candidate generation quadratic)."""
    words = F.array(*[F.lit(w) for w in _WORDS])
    base = F.element_at(words, (F.pmod(expr, F.lit(len(_WORDS))) + 1).cast("int"))
    return F.concat(base, F.pmod(F.xxhash64(expr), F.lit(997)).cast("string"))


def synth_pages(
    spark: SparkSession,
    n_urls: int = 50_000,
    revisits: int = 20,
    partitions: int | None = None,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang): ``n_urls × revisits`` rows,
    strictly increasing warc_ts per url, templated HTML (title, script,
    entities) ~0.4-1 KB per row."""
    n = n_urls * revisits
    # ≥64 so a cached parquet copy still has enough splits for any
    # local core count (single-row-group files cannot split further)
    partitions = partitions or max(64, spark.sparkContext.defaultParallelism * 2)
    df = spark.range(0, n, 1, partitions)
    url_idx = F.col("id") % n_urls
    visit = (F.col("id") / n_urls).cast("long")
    h = F.xxhash64("id")
    # increment bound (86400) < spacing (100000s) => monotone per url
    ts = F.timestamp_seconds(
        F.lit(1704067200)  # 2024-01-01
        + visit * 100000
        + F.pmod(h, F.lit(86400))
    )
    para = F.concat_ws(
        " ",
        _word(h), _word(h + 1), _word(h + 2), _word(h + 3),
        _word(url_idx), _word(visit),
        _word(h + 4), _word(h + 5), _word(h + 6), _word(h + 7),
    )
    html = F.encode(
        F.concat(
            F.lit("<html><head><title>p"),
            F.pmod(h, F.lit(997)).cast("string"),
            F.lit("</title><style>p{x:1}</style><script>var x=1;</script></head>"
                  "<body><!-- c --><p>"),
            para,
            F.lit(" &amp; "),
            F.repeat(F.concat(para, F.lit(" ")), (F.pmod(h, F.lit(4)) + 1).cast("int")),
            F.lit("&lt;end&gt;</p></body></html>"),
        ),
        "utf-8",
    )
    return df.select(
        F.concat(F.lit("https://host"), F.pmod(url_idx, F.lit(1024)).cast("string"),
                 F.lit(".example/p"), url_idx.cast("string")).alias("url"),
        ts.alias("warc_ts"),
        html.alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("unknown")),
            (F.pmod(url_idx, F.lit(4)) + 1).cast("int"),
        ).alias("lang"),
    )


def synth_events(
    spark: SparkSession,
    n_users: int = 20_000,
    events_per_user: int = 100,
    partitions: int | None = None,
) -> DataFrame:
    """events(event_id, ts, user_id, event_type, value, value_cents)."""
    n = n_users * events_per_user
    # ≥64 so a cached parquet copy still has enough splits for any
    # local core count (single-row-group files cannot split further)
    partitions = partitions or max(64, spark.sparkContext.defaultParallelism * 2)
    df = spark.range(0, n, 1, partitions)
    user = F.col("id") % n_users
    seq = (F.col("id") / n_users).cast("long")
    h = F.xxhash64("id")
    ts = F.timestamp_seconds(F.lit(1704067200) + seq * 4000 + F.pmod(h, F.lit(3600)))
    etype = F.element_at(
        F.array(*[F.lit(t) for t in ("view", "click", "scroll", "purchase", "error")]),
        (F.pmod(h, F.lit(5)) + 1).cast("int"),
    )
    cents = F.pmod(h, F.lit(10_000))
    return df.select(
        F.col("id").alias("event_id"),
        ts.alias("ts"),
        user.alias("user_id"),
        etype.alias("event_type"),
        (cents.cast("double") / 100).alias("value"),
        cents.alias("value_cents"),
    )


def synth_embeddings(
    spark: SparkSession, n: int = 8_000, dim: int = 64, partitions: int | None = None
) -> DataFrame:
    """embeddings(vec_id, embedding array<double>): deterministic
    pseudo-random unit-ish vectors."""
    # ≥64 so a cached parquet copy still has enough splits for any
    # local core count (single-row-group files cannot split further)
    partitions = partitions or max(64, spark.sparkContext.defaultParallelism * 2)
    df = spark.range(0, n, 1, partitions)
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: (F.pmod(F.xxhash64(F.col("id"), j), F.lit(2001)) - 1000).cast("double")
        / 1000.0,
    )
    return df.select(F.col("id").alias("vec_id"), vec.alias("embedding"))
